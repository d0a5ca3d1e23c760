"""Capstone end-to-end: the full Common-Crawl-shaped workflow a real user
of this engine runs, every stage composed from the shipped pieces —

    member-gzip WARC segments + CDX-J index        (sources/warc, sources/cdx)
    -> index-first fetch plan (status/mime gate)   (read_cdx + filter)
    -> ranged record fetch of only the keepers     (read_warc_ranged)
    -> charset transcode + parse/extract pipeline  (run_pipeline transcode=True)
    -> curation gate over the parsed sink          (status + token bounds)
    -> JSONL.gz training shards, read back         (write_jsonl / read_jsonl)

Asserts at each boundary: the plan prunes exactly the non-200/non-html
captures, the pipeline parses exactly the planned pages, legacy-charset
pages come out mojibake-free, and the shard round trip is lossless.
"""
import datetime as dt
import hashlib
import os
import sys

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               TimestampType)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from htmlparser_spark.pipeline.job import run_pipeline
from htmlparser_spark.sources import (
    read_cdx, read_jsonl, read_warc_ranged, write_cdx, write_jsonl,
    write_warc_members)
from htmlparser_spark.synth import (
    CHARSET_SAMPLES, gen_charset_page, gen_page)

SEED = 42
N_PLAIN = 30        # utf-8 pages from the main generator
N_CHARSET = 20      # mixed-encoding pages (classes 0..9, two of each)


@pytest.fixture(scope="module")
def spark():
    s = (SparkSession.builder.master("local[4]")
         .appName("crawl-to-shards-e2e")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    yield s
    s.stop()


def _corpus():
    """Deterministic page rows: plain utf-8 pages + the mixed-encoding
    family, interleaved so every segment holds both kinds."""
    rows = [(u, ts, html) for u, ts, html, _t, _l in
            (gen_page(SEED, i) for i in range(N_PLAIN))]
    rows += [(u, ts, html) for u, ts, html, _t, _l in
             (gen_charset_page(SEED, i) for i in range(N_CHARSET))]
    rows.sort(key=lambda r: r[0])
    return rows


def test_crawl_to_training_shards(spark, tmp_path):
    rows = _corpus()
    n_total = len(rows)

    # --- 1. the crawl: member-gzip segments + CDX built from the writers'
    # own manifests (true offsets). Every 5th capture is indexed as a
    # non-keeper (404 or application/pdf) — the index-first gate must
    # prune these without a single page byte being read.
    seg_dir = str(tmp_path / "crawl")
    os.makedirs(seg_dir)
    captures = []
    for seg in range(3):
        name = f"seg-{seg:05d}.warc.gz"
        part = rows[seg::3]
        manifest = write_warc_members(os.path.join(seg_dir, name), part)
        for i, (url, ts, off, length) in enumerate(manifest):
            bad = (i % 5 == 4)
            captures.append((
                url, ts,
                404 if bad and i % 2 == 0 else 200,
                "application/pdf" if bad and i % 2 == 1 else "text/html",
                hashlib.md5(part[i][2]).hexdigest()[:16].upper(),
                length, off, name))
    n_cdx = write_cdx(os.path.join(seg_dir, "cdx-00000.gz"), captures)
    assert n_cdx == n_total

    # --- 2. index-first fetch plan: the 100 TB prune happens HERE.
    idx = read_cdx(spark, os.path.join(seg_dir, "cdx-00000.gz"))
    keep = idx.filter((F.col("status") == 200)
                      & (F.col("mime") == "text/html"))
    plan = keep.select("filename", "offset", "length")
    planned_urls = {r["url"] for r in keep.select("url").collect()}
    n_keep = len(planned_urls)
    assert n_keep == n_total - sum(1 for c in captures
                                   if c[2] != 200 or c[3] != "text/html")
    assert n_keep < n_total  # the gate actually pruned something

    # --- 3. ranged fetch -> transcode -> parse/extract, one job.
    src = read_warc_ranged(spark, seg_dir, plan)
    out_dir = str(tmp_path / "out")
    m = run_pipeline(spark, src, out_dir, resume=False, transcode=True)
    assert m["pages"] == n_keep
    parsed = spark.read.parquet(os.path.join(out_dir, "parsed"))
    got_urls = {r["url"] for r in parsed.select("url").collect()}
    assert got_urls == planned_urls  # exactly the plan, nothing else

    # legacy-charset keepers are mojibake-free in extracted main_text
    sniff_cases = [(4, "windows-1252"), (6, "shift_jis"),
                   (7, "gb18030"), (8, "utf-16le")]
    checked = 0
    by_url = {r["url"]: r["main_text"]
              for r in parsed.select("url", "main_text").collect()}
    for i, key in sniff_cases:
        url = gen_charset_page(SEED, i)[0]
        if url not in planned_urls:
            continue  # pruned by the synthetic status/mime gate
        assert CHARSET_SAMPLES[key][:6] in by_url[url], (i, key)
        assert "�" not in by_url[url], (i, key)
        checked += 1
    assert checked >= 2  # the assertion actually exercised legacy pages

    # --- 4. curation gate + JSONL.gz training shards, read back losslessly.
    curated = (parsed.filter(F.col("status") == "ok")
               .withColumn("n_tokens",
                           F.size(F.split(F.trim("main_text"), r"\s+")))
               .filter(F.col("n_tokens") >= 3)
               .select("url", "warc_ts", "main_text", "n_tokens"))
    n_curated = curated.count()
    assert 0 < n_curated <= n_keep

    shard_dir = str(tmp_path / "shards")
    shards = write_jsonl(curated.repartition(2, "url"), shard_dir)
    assert sum(n for _p, n in shards) == n_curated

    schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("main_text", StringType()),
        StructField("n_tokens", LongType()),
    ])
    back = read_jsonl(spark, os.path.join(shard_dir, "*.jsonl.gz"), schema)
    a = {tuple(r) for r in curated.collect()}
    b = {tuple(r) for r in back.select(*[f.name for f in schema]).collect()}
    assert a == b  # byte-identical text + exact types through the shards
