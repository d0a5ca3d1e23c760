"""spark-submit --py-files packaging test (north rule).

Runs the real spark-submit CLI from a directory OUTSIDE the repo with only
the built zip on --py-files: driver AND executor Python workers must resolve
htmlparser_spark from the zip."""
import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.make_pyfiles import build


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    zip_path = build(str(tmp_path / "htmlparser_spark.zip"))
    out = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    def submit(*extra):
        return subprocess.run(
            ["spark-submit", "--master", "local[2]",
             "--conf", "spark.ui.enabled=false",
             "--conf", "spark.sql.shuffle.partitions=4",
             "--py-files", zip_path,
             os.path.join(REPO, "scripts", "run_job.py"), *extra],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=600)

    # default path first: pruned kernel (no link columns) under --py-files
    out_plain = str(tmp_path / "out_plain")
    res0 = submit("--synth", "40", "--out", out_plain)
    assert res0.returncode == 0, res0.stderr[-3000:]
    assert os.path.exists(os.path.join(out_plain, "parsed"))
    assert not os.path.exists(os.path.join(out_plain, "links"))

    # --transcode exercises the fused charset stage under the zip: the
    # codegen sniff columns plus executor-side resolution of
    # htmlparser_spark.sources.charset from --py-files (synth pages are
    # utf-8, so the stage is a pure sniff-passthrough here)
    res = submit("--synth", "60", "--out", out,
                 "--wet-out", str(tmp_path / "wet"),
                 "--jsonl-out", str(tmp_path / "shards"), "--emit-links",
                 "--transcode")
    assert res.returncode == 0, res.stderr[-3000:]
    metrics = json.loads(
        [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1])
    assert metrics["pages"] >= 60
    assert metrics["ok_pages"] > 0
    assert os.path.exists(os.path.join(out, "parsed"))
    assert os.path.exists(os.path.join(out, "_lineage"))
    assert metrics["wet_segments"] >= 1
    assert metrics["wet_records"] > 0
    assert metrics["jsonl_shards"] >= 1
    assert metrics["jsonl_records"] == metrics["pages"]
    # --emit-links: the same submit also produced the web-graph sink
    assert os.path.exists(os.path.join(out, "links"))
