"""WARC source tests: byte-level round trip (plain + gzip), spec-driven
record walking (Content-Length advance, malformed-record resync), glob
reads, the no-shuffle plan shape, and pipeline-source equivalence with the
parquet path."""
import datetime
import os
import sys

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from htmlparser_spark.pipeline.job import run_pipeline
from htmlparser_spark.pipeline.schema import PAGES_SCHEMA
from htmlparser_spark.sources import read_warc, synth_warc, write_warc
from htmlparser_spark.sources.warc import iter_warc_records, _warc_record
from htmlparser_spark.synth import gen_rows


@pytest.fixture(scope="module")
def spark():
    s = (SparkSession.builder.master("local[4]")
         .appName("warc-tests")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    yield s
    s.stop()


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip_bytes(spark, tmp_path, compress):
    p = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
    n = synth_warc(p, 30, seed=7, compress=compress)
    exp = gen_rows(7, range(30))
    assert n == len(exp)
    got = read_warc(spark, p).collect()
    assert len(got) == n
    gm = {(r["url"], r["warc_ts"].replace(tzinfo=datetime.timezone.utc)):
          bytes(r["html"]) for r in got}
    for url, ts, html, _text, _lang in exp:
        assert gm[(url, ts)] == html  # byte-identical through the container


def test_warc_record_walk_is_spec_driven(tmp_path):
    # a body CONTAINING the version marker must not desynchronize the walk,
    # and a malformed Content-Length must resync on the next version line
    ts = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)
    tricky = (b"HTTP/1.1 200 OK\r\n\r\n"
              b"<html>WARC/1.0\r\nWARC-Type: response\r\n\r\nfake</html>")
    blob = (
        _warc_record("response",
                     {"WARC-Target-URI": "https://a/1",
                      "WARC-Date": "2025-01-01T00:00:00Z"}, tricky)
        + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: oops\r\n\r\n"
        + _warc_record("response",
                       {"WARC-Target-URI": "https://a/2",
                        "WARC-Date": "2025-01-01T00:00:01Z"},
                       b"HTTP/1.1 200 OK\r\n\r\n<html>ok</html>"))
    recs = list(iter_warc_records(blob))
    assert [r[0] for r in recs] == ["https://a/1", "https://a/2"]
    assert recs[0][2].startswith(b"<html>WARC/1.0")
    assert recs[0][1] == ts
    assert recs[1][2] == b"<html>ok</html>"


def test_warc_glob_and_plan_shape(spark, tmp_path):
    written = [synth_warc(str(tmp_path / f"seg-{k}.warc"), n, seed=100 + k)
               for k, n in enumerate([10, 15, 20])]
    df = read_warc(spark, str(tmp_path / "*.warc"))
    assert df.count() == sum(written)
    # one file = one task, record split inside it: NO shuffle in the source
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_warc_pipeline_source_equivalent_to_dataframe_source(spark, tmp_path):
    n = 40
    p = str(tmp_path / "seg.warc.gz")
    synth_warc(p, n, seed=7, compress=True)
    direct = spark.createDataFrame(gen_rows(7, range(n)), PAGES_SCHEMA)

    def parsed(src, out):
        run_pipeline(spark, src, str(tmp_path / out), resume=False)
        return sorted(
            (r["url"], r["warc_ts"], r["status"], r["main_text"])
            for r in spark.read.parquet(str(tmp_path / out / "parsed"))
            .select("url", "warc_ts", "status", "main_text").collect())

    assert parsed(read_warc(spark, p), "o_warc") == parsed(direct, "o_df")


def test_wet_sink_round_trip(spark, tmp_path):
    from htmlparser_spark.sources import read_wet, write_wet

    n = 30
    p = str(tmp_path / "seg.warc.gz")
    synth_warc(p, n, seed=7, compress=True)
    run_pipeline(spark, read_warc(spark, p), str(tmp_path / "out"),
                 resume=False)
    parsed = spark.read.parquet(str(tmp_path / "out" / "parsed"))
    segs = write_wet(parsed, str(tmp_path / "wet"))
    assert segs and sum(k for _p, k in segs) == parsed.count()
    assert all(path.endswith(".warc.wet.gz") for path, _k in segs)
    back = read_wet(spark, str(tmp_path / "wet" / "*.warc.wet.gz"))
    exp = sorted((r["url"], r["warc_ts"], r["main_text"] or "")
                 for r in parsed.select("url", "warc_ts",
                                        "main_text").collect())
    got = sorted((r["url"], r["warc_ts"], r["text"])
                 for r in back.collect())
    assert got == exp  # extracted text survives the WET container exactly
