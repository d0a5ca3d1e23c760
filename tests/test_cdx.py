"""CDX-J index source: SURT key edges, deterministic sorted shards, typed
round trip, and consistency between the Spark surt expression and the
Python writer's surt_key."""
import datetime
import gzip
import os
import sys

import pytest
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from htmlparser_spark.sources import read_cdx, surt_key, synth_cdx, write_cdx


@pytest.fixture(scope="module")
def spark():
    s = (SparkSession.builder.master("local[4]")
         .appName("cdx-tests")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    yield s
    s.stop()


def test_surt_key_edges():
    assert surt_key("https://WWW.Example.COM/Page?Q=1") == \
        "com,example,www)/page?q=1"
    assert surt_key("http://a.b.example.org/") == "org,example,b,a)/"
    assert surt_key("https://example.org") == "org,example)/"      # no path
    assert surt_key("http://h.example:8080/x") == "example,h:8080)/x"
    assert surt_key("https://h.example:443/x") == "example,h)/x"   # default
    assert surt_key("mailto:x@y") == ""                            # hostless
    assert surt_key("http://[bad") == ""                           # invalid


def test_cdx_shard_is_sorted_and_deterministic(tmp_path):
    a, b = str(tmp_path / "a.gz"), str(tmp_path / "b.gz")
    assert synth_cdx(a, 100, seed=7) == 100
    synth_cdx(b, 100, seed=7)
    with open(a, "rb") as fa, open(b, "rb") as fb:
        da, db = fa.read(), fb.read()
    assert da == db  # byte-identical across runs
    lines = gzip.decompress(da).decode().splitlines()
    keys = [ln.split(" ", 2)[:2] for ln in lines]
    assert keys == sorted(keys)  # CDX invariant: sorted by (surt, ts)


def test_cdx_roundtrip_types(spark, tmp_path):
    path = str(tmp_path / "cdx-00000.gz")
    ts = datetime.datetime(2025, 3, 1, 12, 30, 45)
    rows = [("https://www.X.example/A?B=1", ts, 200, "text/html",
             "DEADBEEF", 1234, 567890, "seg-00001.warc.gz")]
    write_cdx(path, rows)
    got = read_cdx(spark, path).collect()
    assert len(got) == 1
    r = got[0]
    assert r["surt_key"] == "example,x,www)/a?b=1"
    assert r["url"] == "https://www.X.example/A?B=1"  # url kept verbatim
    assert (r["status"], r["mime"], r["length"], r["offset"]) == \
        (200, "text/html", 1234, 567890)
    assert r["ts"].replace(tzinfo=None) == ts
    assert r["filename"] == "seg-00001.warc.gz"


def test_spark_surt_matches_python_surt(spark):
    """corpus_surt_keys' codegen expression and sources.cdx.surt_key must
    agree on the synthesized URL family."""
    import __spark_entry__ as entry
    df = entry.corpus_surt_keys(spark, "/root/testdata/sf0.001")
    for r in df.collect():
        assert r["surt"] == surt_key(r["url"]), r


def test_warc_members_manifest_offsets_are_exact(tmp_path):
    """Each manifest (offset, length) must independently gzip-decompress
    to exactly its own record — the property ranged fetch relies on."""
    import datetime as dt

    from htmlparser_spark.sources import write_warc_members
    from htmlparser_spark.sources.warc import iter_warc_records

    rows = [(f"https://ex.org/{i}", dt.datetime(2025, 1, 1, 0, 0, i),
             f"<html>page {i}</html>".encode()) for i in range(7)]
    path = str(tmp_path / "seg.warc.gz")
    manifest = write_warc_members(path, rows)
    assert len(manifest) == 7
    blob = open(path, "rb").read()
    for (url, _ts, off, length), (u0, _t0, h0) in zip(manifest, rows):
        rec = gzip.decompress(blob[off:off + length])
        got = list(iter_warc_records(rec))
        assert len(got) == 1 and got[0][0] == u0 == url
        assert got[0][2] == h0


def test_warc_members_whole_file_reader_compat(spark, tmp_path):
    """A member-gzip segment is still a valid multi-member gzip file: the
    full-segment reader decodes it unchanged."""
    import datetime as dt

    from htmlparser_spark.sources import read_warc, write_warc_members

    rows = [(f"https://ex.org/{i}", dt.datetime(2025, 1, 1), b"<html>x")
            for i in range(5)]
    path = str(tmp_path / "seg.warc.gz")
    write_warc_members(path, rows)
    assert read_warc(spark, path).count() == 5


def test_ranged_fetch_reads_only_the_plan(spark, tmp_path):
    """Planned records come back byte-exact; unplanned records never
    appear; a corrupted planned range costs exactly that record."""
    import datetime as dt

    from htmlparser_spark.sources import read_warc_ranged, write_warc_members

    rows = [(f"https://ex.org/{i}", dt.datetime(2025, 1, 1, 0, 0, i),
             f"<html>page {i}</html>".encode()) for i in range(10)]
    path = str(tmp_path / "seg-00000.warc.gz")
    manifest = write_warc_members(path, rows)
    # corrupt record 4's member in place
    off, length = manifest[4][2], manifest[4][3]
    blob = bytearray(open(path, "rb").read())
    blob[off + 3] ^= 0xFF
    open(path, "wb").write(bytes(blob))
    plan_rows = [("seg-00000.warc.gz", m[2], m[3])
                 for i, m in enumerate(manifest) if i in (1, 4, 8)]
    plan = spark.createDataFrame(
        plan_rows, "filename string, offset long, length long")
    got = {r["url"]: bytes(r["html"])
           for r in read_warc_ranged(spark, str(tmp_path), plan).collect()}
    assert set(got) == {"https://ex.org/1", "https://ex.org/8"}  # 4 dropped
    assert got["https://ex.org/1"] == b"<html>page 1</html>"


def test_ranged_fetch_composes_into_run_pipeline(spark, tmp_path):
    """read_warc_ranged returns the pages schema, so the executed fetch
    plan IS a run_pipeline source: index -> plan -> ranged fetch -> parse."""
    import datetime as dt

    from htmlparser_spark.pipeline.job import run_pipeline
    from htmlparser_spark.sources import read_warc_ranged, write_warc_members

    rows = [(f"https://ex.org/p{i}", dt.datetime(2025, 1, 1, 0, 0, i),
             f"<html><body><div class=\"content\">page {i} body text"
             f"</div></body></html>".encode()) for i in range(12)]
    path = str(tmp_path / "seg-00000.warc.gz")
    manifest = write_warc_members(path, rows)
    plan = spark.createDataFrame(
        [("seg-00000.warc.gz", m[2], m[3])
         for i, m in enumerate(manifest) if i % 2 == 0],
        "filename string, offset long, length long")
    src = read_warc_ranged(spark, str(tmp_path), plan)
    m = run_pipeline(spark, src, str(tmp_path / "out"), resume=False)
    assert m["pages"] == 6 and m["ok_pages"] == 6
    out = spark.read.parquet(str(tmp_path / "out" / "parsed"))
    assert out.count() == 6
    assert {r["url"] for r in out.select("url").collect()} == \
        {f"https://ex.org/p{i}" for i in range(0, 12, 2)}
