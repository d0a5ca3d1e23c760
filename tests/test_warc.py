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


def test_warc_truncated_record_dropped_not_yielded_short():
    ts = "2025-01-01T00:00:00Z"
    good = _warc_record("response",
                        {"WARC-Target-URI": "https://a/1", "WARC-Date": ts},
                        b"HTTP/1.1 200 OK\r\n\r\n<html>ok</html>")
    cut = _warc_record("response",
                       {"WARC-Target-URI": "https://a/2", "WARC-Date": ts},
                       b"HTTP/1.1 200 OK\r\n\r\n<html>long body</html>")
    st = {}
    recs = list(iter_warc_records(good + cut[:-20], stats=st))
    # the cut-off record is dropped entirely, never yielded with short body
    assert [r[0] for r in recs] == ["https://a/1"]
    assert st["truncated"] == 1 and st["malformed"] == 0


def test_gunzip_salvage_truncated_and_corrupt(tmp_path):
    import gzip

    from htmlparser_spark.sources.warc import _gunzip_salvage

    a, b = gzip.compress(b"alpha", mtime=0), gzip.compress(b"beta", mtime=0)
    # clean multi-member stream → everything, no flag
    assert _gunzip_salvage(a + b) == (b"alphabeta", False)
    # second member cut mid-stream → first member salvaged, flagged
    out, bad = _gunzip_salvage(a + b[:len(b) // 2])
    assert out.startswith(b"alpha") and bad
    # garbage where a member should start → salvage prefix, flagged
    out, bad = _gunzip_salvage(a + b"\x00not gzip at all")
    assert out == b"alpha" and bad


def test_read_warc_survives_corrupt_segment(spark, tmp_path):
    # one good segment + one truncated segment: the job completes and
    # yields every record of the good one plus the salvageable prefix of
    # the bad one — a bad file costs its tail, not the whole job
    good = str(tmp_path / "good.warc.gz")
    n_good = synth_warc(good, 20, seed=3, compress=True)
    bad_src = str(tmp_path / "tmp.warc.gz")
    synth_warc(bad_src, 20, seed=4, compress=True)
    blob = open(bad_src, "rb").read()
    with open(str(tmp_path / "bad.warc.gz"), "wb") as f:
        f.write(blob[:len(blob) // 2])
    os.remove(bad_src)
    total = read_warc(spark, str(tmp_path / "*.warc.gz")).count()
    n_bad = read_warc(spark, str(tmp_path / "bad.warc.gz")).count()
    assert total == n_good + n_bad  # good segment fully intact
    assert 0 < n_bad < 20           # bad one salvaged a proper prefix


def test_warc_scan_stats(spark, tmp_path):
    from htmlparser_spark.sources.warc import warc_scan_stats

    clean = str(tmp_path / "clean.warc.gz")
    n = synth_warc(clean, 15, seed=5, compress=True)
    src = str(tmp_path / "t.warc.gz")
    synth_warc(src, 15, seed=6, compress=True)
    blob = open(src, "rb").read()
    with open(str(tmp_path / "cut.warc.gz"), "wb") as f:
        f.write(blob[:len(blob) * 2 // 3])
    os.remove(src)
    rows = {os.path.basename(r["path"]): r
            for r in warc_scan_stats(spark,
                                     str(tmp_path / "*.warc.gz")).collect()}
    assert rows["clean.warc.gz"]["records"] == n
    assert not rows["clean.warc.gz"]["gzip_corrupt"]
    assert rows["clean.warc.gz"]["truncated"] == 0
    cut = rows["cut.warc.gz"]
    assert cut["gzip_corrupt"]
    assert cut["records"] < n  # salvaged prefix only
    # stats agree with what read_warc would actually yield
    got = read_warc(spark, str(tmp_path / "cut.warc.gz")).count()
    assert cut["records"] == got


def test_wet_write_leaves_no_tmp_files(spark, tmp_path):
    from htmlparser_spark.sources import read_warc, write_wet

    p = str(tmp_path / "seg.warc.gz")
    synth_warc(p, 10, seed=7, compress=True)
    run_pipeline(spark, read_warc(spark, p), str(tmp_path / "out"),
                 resume=False)
    parsed = spark.read.parquet(str(tmp_path / "out" / "parsed"))
    write_wet(parsed, str(tmp_path / "wet"))
    names = os.listdir(str(tmp_path / "wet"))
    assert names and all(x.endswith(".warc.wet.gz") for x in names), names


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


def test_wet_rerun_with_fewer_partitions_gcs_stale_shards(spark, tmp_path):
    from htmlparser_spark.sources import read_wet, write_wet

    out = str(tmp_path / "wet")
    parsed = spark.range(40).selectExpr(
        "concat('https://h.example/', id) AS url",
        "timestamp'2025-01-01 00:00:00' AS warc_ts",
        "concat('text ', id) AS main_text")
    write_wet(parsed.repartition(4), out)
    assert len([f for f in os.listdir(out) if f.endswith(".warc.wet.gz")]) == 4
    segs = write_wet(parsed.repartition(1), out)
    files = [f for f in os.listdir(out) if f.endswith(".warc.wet.gz")]
    assert len(files) == len(segs) == 1
    assert read_wet(spark, os.path.join(out, "*.warc.wet.gz")).count() == 40


def test_wet_sink_tolerates_null_warc_ts(spark, tmp_path):
    """read_warc yields ts=None for malformed WARC-Date records (salvage
    path); the WET sink must not fail the whole task on them — it writes
    the epoch sentinel instead of dropping salvaged text."""
    from htmlparser_spark.sources import read_wet, write_wet

    out = str(tmp_path / "wet")
    parsed = spark.createDataFrame(
        [("https://a.example/ok", datetime.datetime(2025, 1, 2), "good"),
         ("https://a.example/bad-date", None, "salvaged")],
        "url string, warc_ts timestamp, main_text string")
    segs = write_wet(parsed.coalesce(1), out)
    assert sum(n for _p, n in segs) == 2
    back = {r["url"]: r["warc_ts"]
            for r in read_wet(spark, os.path.join(out, "*.warc.wet.gz")).collect()}
    assert back["https://a.example/bad-date"] == datetime.datetime(1970, 1, 1)
    assert back["https://a.example/ok"] == datetime.datetime(2025, 1, 2)
