"""Structured Streaming tests: incremental kernel runs with exactly-once
file sink, watermarked window aggregation, stateful per-host rollup."""
import os
import sys

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from htmlparser_spark.pipeline.schema import PAGES_SCHEMA
from htmlparser_spark.streaming.job import (
    error_window_stream, host_rollup_stream, parse_page_stream,
    read_page_stream, run_stream_once,
)
from htmlparser_spark.synth import synth_pages


@pytest.fixture(scope="module")
def spark():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s = (SparkSession.builder.master("local[2]")
         .appName("htmlparser-streaming-tests")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.executorEnv.PYTHONPATH", root)
         .config("spark.sql.streaming.schemaInference", "false")
         .getOrCreate())
    yield s
    s.stop()


def _write_batch(spark, src_dir, n, seed, name):
    df = synth_pages(spark, n, seed=seed, partitions=2)
    df.write.mode("overwrite").parquet(os.path.join(src_dir, name))
    return df.count()


def test_stream_exactly_once_and_incremental(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    n1 = _write_batch(spark, src, 40, seed=1, name="drop1")

    r1 = run_stream_once(spark, src, out)
    assert r1["rows_total"] == n1

    # re-run with no new files: nothing reprocessed
    r2 = run_stream_once(spark, src, out)
    assert r2["rows_total"] == n1

    # new drop: only the new files flow through the kernel
    n2 = _write_batch(spark, src, 30, seed=2, name="drop2")
    r3 = run_stream_once(spark, src, out)
    assert r3["rows_total"] == n1 + n2

    # outputs match the batch kernel row-wise for a sample url
    parsed = spark.read.parquet(os.path.join(out, "parsed"))
    assert parsed.filter(F.col("status") == "ok").count() > 0
    assert set(parsed.columns) >= {"url", "status", "main_text", "part_key"}


def test_stream_empty_source_returns_zero_rows(spark, tmp_path):
    """First run against a source dir with no files: the file sink never
    creates out/parsed — must report 0 rows, not raise PATH_NOT_FOUND."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    assert run_stream_once(spark, src, out) == {"rows_total": 0}


def test_host_extraction_handles_pathless_urls(spark):
    """The REAL host expression (streaming/job.py host_expr): pathless
    urls keep their host; uppercase schemes don't collapse into the ''
    group (RFC 3986 §3.1); host case is normalized (§3.2.2)."""
    from htmlparser_spark.streaming.job import host_expr

    df = spark.createDataFrame(
        [("https://a.example",), ("https://b.example/path",), ("nourl",),
         ("HTTPS://C.Example/x",), ("https://Mixed.Example",)],
        "url string")
    got = {r.url: r.h for r in df.select("url", host_expr().alias("h")).collect()}
    assert got == {"https://a.example": "a.example",
                   "https://b.example/path": "b.example", "nourl": "",
                   "HTTPS://C.Example/x": "c.example",
                   "https://Mixed.Example": "mixed.example"}


def test_stream_error_windows_respect_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # two drops -> two micro-batches (maxFilesPerTrigger=1 per parquet file
    # would be many files; rely on multiple availableNow batches instead)
    _write_batch(spark, src, 50, seed=3, name="d1")
    pages = read_page_stream(spark, src, max_files_per_trigger=1)
    parsed = parse_page_stream(pages)
    agg = error_window_stream(parsed, window="1 hour", watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("err_win")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = spark.sql("select * from err_win").collect()
    # synth puts ~5% of urls a +1 day duplicate, so the watermark advances a
    # day past the base window and the base-hour windows are finalized
    assert rows, "expected finalized windows"
    statuses = {r.status for r in rows}
    assert "ok" in statuses
    for r in rows:
        assert r.window_end > r.window_start


def test_stream_stateful_host_rollup_accumulates(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    n1 = _write_batch(spark, src, 30, seed=4, name="d1")

    def run_rollup(out_name):
        out_dir = str(tmp_path / out_name)
        pages = read_page_stream(spark, src)
        rollup = host_rollup_stream(parse_page_stream(pages))

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(out_dir)

        q = (rollup.writeStream.foreachBatch(sink)
             .outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {r.host: (r.pages, r.bytes, r.err_pages)
                for r in spark.read.parquet(out_dir).collect()}

    first = run_rollup("roll1")
    assert first and sum(p for p, _, _ in first.values()) == n1

    # second drop with overlapping hosts: state carries over, totals grow
    n2 = _write_batch(spark, src, 30, seed=5, name="d2")
    second = run_rollup("roll2")
    # only hosts present in batch 2 re-emit; their totals include batch 1
    assert second
    grew = [h for h in second if h in first and second[h][0] > first[h][0]]
    assert grew, "expected at least one host accumulating across batches"


def test_stream_dedup_drops_redelivered_snapshots(spark, tmp_path):
    """The same (url, html) snapshot delivered in TWO different files (and
    thus different micro-batches under maxFilesPerTrigger=1) must parse
    once; distinct snapshots all survive. Hermetic pages (no intra-batch
    duplicates, all event times inside the watermark horizon) so the
    assertion is exact."""
    import datetime

    from htmlparser_spark.streaming.job import dedup_page_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    base = datetime.datetime(2024, 1, 1)

    def mk(lo, hi):
        rows = [(f"https://h{i:03d}.example/p{i:03d}",
                 base + datetime.timedelta(minutes=i),
                 f"<html><body>doc {i}</body></html>".encode(),
                 f"doc {i}", "en") for i in range(lo, hi)]
        return spark.createDataFrame(rows, PAGES_SCHEMA)

    mk(0, 20).coalesce(1).write.parquet(os.path.join(src, "d1"))
    # redeliver the identical snapshot set, then 10 genuinely new pages
    mk(0, 20).coalesce(1).write.parquet(os.path.join(src, "d2"))
    mk(20, 30).coalesce(1).write.parquet(os.path.join(src, "d3"))

    pages = read_page_stream(spark, src, max_files_per_trigger=1)
    deduped = dedup_page_stream(pages)
    q = (deduped.select("url", "warc_ts")
         .writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    urls = [r.url for r in spark.sql("select url from dedup_out").collect()]
    assert len(urls) == len(set(urls)) == 30


def test_links_stream_incremental_and_matches_batch(spark, tmp_path):
    """Streaming web-graph stage: exactly-once drains, incremental on new
    drops, and row-identical to the batch links stage on the same pages."""
    from htmlparser_spark.pipeline.links_stage import links_batch
    from htmlparser_spark.pipeline.schema import LINKS_SCHEMA
    from htmlparser_spark.streaming.job import run_links_stream_once
    from htmlparser_spark.synth_links import synth_link_pages

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    d1 = synth_link_pages(spark, 30, seed=42, partitions=2)
    d1.write.mode("overwrite").parquet(os.path.join(src, "drop1"))

    r1 = run_links_stream_once(spark, src, out)
    assert r1["links_total"] > 0
    r2 = run_links_stream_once(spark, src, out)  # nothing new: no growth
    assert r2["links_total"] == r1["links_total"]

    d2 = synth_link_pages(spark, 20, seed=7, partitions=2)
    d2.write.mode("overwrite").parquet(os.path.join(src, "drop2"))
    r3 = run_links_stream_once(spark, src, out)
    assert r3["links_total"] > r2["links_total"]

    got = (spark.read.schema(LINKS_SCHEMA)
           .parquet(os.path.join(out, "links")))
    exp = (d1.unionByName(d2).mapInPandas(links_batch, schema=LINKS_SCHEMA))
    key = ["url", "seq", "href", "href_abs", "dst_host", "anchor", "nofollow"]
    assert (sorted(tuple(r) for r in got.select(*key).collect())
            == sorted(tuple(r) for r in exp.select(*key).collect()))


def test_stream_transcode_parses_legacy_charsets(spark, tmp_path):
    """parse_page_stream(transcode=True) on a streaming micro-batch: the
    fused charset pass is stateless per-row, so it runs unchanged on a
    stream — Shift_JIS pages come out mojibake-free, and the plain run
    over the same drop yields replacement chars for them."""
    from htmlparser_spark.synth import CHARSET_SAMPLES, synth_charset_pages

    src = str(tmp_path / "src")
    os.makedirs(src)
    synth_charset_pages(spark, 30, seed=42, partitions=2) \
        .write.mode("overwrite").parquet(os.path.join(src, "drop1"))

    def drain(transcode):
        parsed = parse_page_stream(read_page_stream(spark, src),
                                   transcode=transcode)
        q = (parsed.writeStream.format("memory")
             .queryName(f"t_{int(transcode)}")
             .option("checkpointLocation",
                     str(tmp_path / f"ckpt_{int(transcode)}"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {r.url: r.main_text
                for r in spark.sql(
                    f"select url, main_text from t_{int(transcode)}")
                .collect()}

    fixed, raw = drain(True), drain(False)
    assert len(fixed) == len(raw) == 30
    jp = CHARSET_SAMPLES["shift_jis"][:6]
    sj_urls = [u for u, t in fixed.items() if jp in t]
    assert sj_urls  # the Shift_JIS class parsed clean under transcode
    for u in sj_urls:
        assert jp not in raw[u]  # and mojibake'd without it


def test_stream_transcode_flag_must_stay_constant(spark, tmp_path):
    """Flipping transcode between drains of one out_dir raises instead of
    silently mixing decode regimes in the parsed sink (the streaming
    analogue of the batch lineage-manifest flag check)."""
    import pytest

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _write_batch(spark, src, 10, 42, "d1")
    run_stream_once(spark, src, out, transcode=False)
    with pytest.raises(ValueError, match="stream flag mismatch"):
        run_stream_once(spark, src, out, transcode=True)
    # same flag keeps draining fine
    _write_batch(spark, src, 5, 7, "d2")
    r = run_stream_once(spark, src, out, transcode=False)
    assert r["rows_total"] > 0


def test_stream_kill_resume_exactly_once(spark, tmp_path):
    """Kill a drain mid-stream (SIGKILL, no cleanup), restart from the
    checkpoint, and assert the parsed sink equals an uninterrupted run's —
    the streaming analogue of the batch kill-resume test. The file sink's
    commit log makes readers ignore any part files a killed attempt left
    uncommitted; the source checkpoint replays the unfinished micro-batch."""
    import signal
    import subprocess
    import sys
    import time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = str(tmp_path / "src")
    out_kill = str(tmp_path / "out_kill")
    out_ref = str(tmp_path / "out_ref")
    for i in range(8):
        _write_batch(spark, src, 400, i + 1, f"d{i}")

    # drain with 1-file micro-batches in a subprocess we can SIGKILL
    prog = (
        "import sys\n"
        f"sys.path.insert(0, {repo!r})\n"
        "from pyspark.sql import SparkSession\n"
        "from htmlparser_spark.streaming.job import (\n"
        "    read_page_stream, parse_page_stream, write_parsed_stream)\n"
        "spark = (SparkSession.builder.master('local[2]')\n"
        "         .config('spark.sql.shuffle.partitions', '4')\n"
        "         .config('spark.ui.enabled', 'false').getOrCreate())\n"
        f"pages = read_page_stream(spark, {src!r}, max_files_per_trigger=1)\n"
        f"q = write_parsed_stream(parse_page_stream(pages), {out_kill!r})\n"
        "q.awaitTermination()\n"
    )
    # start_new_session puts the python driver AND the Spark JVM it spawns in
    # one fresh process group: SIGKILLing only the python pid leaves the JVM
    # running the query for a few more seconds (pyspark's JVM is a child that
    # notices the gateway died asynchronously), and that orphan races the
    # resume below into CONCURRENT_STREAM_LOG_UPDATE. killpg is the honest
    # "machine died" simulation — everything stops at once.
    p = subprocess.Popen([sys.executable, "-c", prog],
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                         start_new_session=True)
    # kill as soon as the first micro-batch commits — with 16 source files
    # and 1-file triggers the drain is nowhere near done at that point
    commit_dir = os.path.join(out_kill, "parsed", "_spark_metadata")
    deadline = time.monotonic() + 180
    while time.monotonic() < deadline:
        if p.poll() is not None:
            break
        if os.path.isdir(commit_dir) and os.listdir(commit_dir):
            break
        time.sleep(0.2)
    if p.poll() is None:
        try:
            os.killpg(p.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass  # exited between poll() and killpg
        p.wait()
        assert os.path.isdir(commit_dir), "never saw a committed batch"

    # resume from the checkpoint in a fresh driver (this pytest session)
    r = run_stream_once(spark, src, out_kill)
    ref = run_stream_once(spark, src, out_ref)
    # synth_pages adds ~5% same-url +1day snapshots, so compare to the
    # uninterrupted run, not to the nominal page count
    assert r["rows_total"] == ref["rows_total"] >= 8 * 400

    cols = ["url", "warc_ts", "status", "content_hash", "main_text"]
    got = sorted(map(tuple, spark.read.parquet(
        os.path.join(out_kill, "parsed")).select(cols).collect()))
    want = sorted(map(tuple, spark.read.parquet(
        os.path.join(out_ref, "parsed")).select(cols).collect()))
    assert got == want


def test_rate_source_pages_parse_like_batch(spark, tmp_path):
    """The rate-source (Kafka stand-in) stream runs the SAME kernel and,
    because pages derive deterministically from `value`, each consumed id
    parses byte-identically to the batch generator's output."""
    import time

    from htmlparser_spark.streaming.job import read_rate_page_stream
    from htmlparser_spark.kernel.api import parse_html
    from htmlparser_spark.synth import gen_page

    out = os.path.join(str(tmp_path), "parsed")
    ckpt = os.path.join(str(tmp_path), "_ckpt")
    parsed = parse_page_stream(read_rate_page_stream(spark,
                                                     rows_per_second=400))
    q = (parsed.writeStream.format("parquet")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if any(b.get("numOutputRows", 0) > 0
                   for p in q.recentProgress
                   for b in [p.get("sink", {})]):
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.read.parquet(out).select(
        "url", "status", "main_text").collect()
    assert rows  # the unbounded source produced parsed pages
    # spot-check determinism: stream row == batch kernel on the same id
    by_url = {r["url"]: r for r in rows}
    for url, r in list(by_url.items())[:20]:
        i = int(url.rsplit("p", 1)[1])
        u2, _ts, html, _t, _l = gen_page(42, i)
        assert u2 == url
        want = parse_html(html, fast=True, extract=True, want_dom=False)
        assert r["status"] == want["status"]
        assert r["main_text"] == want["main_text"]


def test_bloom_stream_flags_history_duplicates(spark, tmp_path):
    """Continuous-ingest dedup: a drain whose drop repeats history content
    must flag every true duplicate (Bloom guarantees no false negatives),
    and the streaming tags must equal the same expression applied in
    BATCH to the same rows — stream-static joins change nothing."""
    from htmlparser_spark.streaming.job import (
        bloom_dedup_stream, bloom_history_bits, run_bloom_stream_once)

    src_h, out_h = str(tmp_path / "src_h"), str(tmp_path / "out_h")
    src_n, out_n = str(tmp_path / "src_n"), str(tmp_path / "out_n")
    _write_batch(spark, src_h, 120, 1, "hist")
    run_stream_once(spark, src_h, out_h)
    hist_dir = os.path.join(out_h, "parsed")

    _write_batch(spark, src_n, 120, 1, "dups")   # identical content to hist
    n_fresh = _write_batch(spark, src_n, 80, 3, "fresh")
    r = run_bloom_stream_once(spark, src_n, out_n, hist_dir)
    tagged = spark.read.parquet(os.path.join(out_n, "parsed"))
    assert r["rows_total"] == tagged.count()

    hist_hashes = {row.content_hash for row in
                   spark.read.parquet(hist_dir)
                   .select("content_hash").collect()}
    # guard against the r4 vacuity: the stream kernel once emitted
    # content_hash = 0 for every row (parse_page_stream never computed
    # it), which made 'every dup flagged / few FPs' trivially true
    assert len(hist_hashes) > 100
    rows = tagged.select("url", "warc_ts", "content_hash",
                         "maybe_dup").collect()
    n_true_dup = 0
    for row in rows:
        if row.content_hash in hist_hashes:
            assert row.maybe_dup == 1  # no false negatives, ever
            n_true_dup += 1
    assert n_true_dup >= 120  # the whole dup drop is history content
    # the filter must not degenerate to flag-everything: the fresh drop
    # has at most a small false-positive minority
    n_flagged = sum(row.maybe_dup for row in rows)
    assert n_flagged - n_true_dup <= n_fresh * 0.2

    # stream-vs-batch differential: same expression, same rows, same tags
    hist = spark.read.parquet(hist_dir)
    batch = bloom_dedup_stream(
        spark.read.parquet(os.path.join(out_n, "parsed")).drop("maybe_dup"),
        bloom_history_bits(hist))
    want = {(row.url, row.warc_ts): row.maybe_dup
            for row in batch.select("url", "warc_ts", "maybe_dup").collect()}
    got = {(row.url, row.warc_ts): row.maybe_dup for row in rows}
    assert got == want


def test_bloom_incremental_drain_never_rescans_history(spark, tmp_path):
    """VERDICT r4 item 5: the Bloom drain persists its bit set and folds
    only each drained batch back in. Drain 2 (a) runs with a NONEXISTENT
    history_dir — so any attempt to rebuild the filter from history would
    crash, (b) folds exactly its own new sink files into the next bit-set
    version (manifest diff), and (c) produces maybe_dup tags identical to
    the rebuild-from-scratch filter over (history ∪ drain-1 output)."""
    import json

    from htmlparser_spark.ops import BLOOM_M
    from htmlparser_spark.streaming.job import (
        bloom_dedup_stream, bloom_history_bits, run_bloom_stream_once)

    src_h, out_h = str(tmp_path / "src_h"), str(tmp_path / "out_h")
    src_n, out_n = str(tmp_path / "src_n"), str(tmp_path / "out_n")
    _write_batch(spark, src_h, 80, 1, "hist")
    run_stream_once(spark, src_h, out_h)
    hist_dir = os.path.join(out_h, "parsed")

    # drain 1: docs duplicating history + fresh content (seed=3)
    n_dup = _write_batch(spark, src_n, 40, 1, "dups")
    n_f1 = _write_batch(spark, src_n, 60, 3, "fresh1")
    r1 = run_bloom_stream_once(spark, src_n, out_n, hist_dir)
    assert r1["rows_total"] == n_dup + n_f1
    # non-vacuous: true dups flagged, fresh docs mostly not
    assert r1["maybe_dup_total"] >= n_dup
    assert r1["maybe_dup_total"] - n_dup <= n_f1 * 0.2

    state_path = os.path.join(out_n, "_bloom_state.json")
    with open(state_path) as f:
        st1 = json.load(f)
    assert st1["version"] == 1  # v0 = history seed, v1 = + drain-1 fold
    parsed_dir = os.path.join(out_n, "parsed")
    files1 = sorted(f for f in os.listdir(parsed_dir)
                    if f.endswith(".parquet"))
    assert st1["folded"] == files1  # exactly this drain's committed files

    # the persisted filter is the ≤ m-row structure, not a history copy
    bits = spark.read.parquet(os.path.join(out_n, "_bloom_bits", "v1"))
    assert bits.count() <= BLOOM_M
    # superseded version GC'd
    assert not os.path.exists(os.path.join(out_n, "_bloom_bits", "v0"))

    # drain 2: duplicates of drain-1's fresh docs + new fresh (seed=5);
    # history_dir is a path that DOES NOT EXIST — reading it would raise,
    # so a green run proves history is never rescanned after seeding
    n_dof = _write_batch(spark, src_n, 60, 3, "dups_of_fresh1")
    n_f2 = _write_batch(spark, src_n, 50, 5, "fresh2")
    r2 = run_bloom_stream_once(spark, src_n, out_n,
                               str(tmp_path / "no_such_history"))
    assert r2["rows_total"] == n_dup + n_f1 + n_dof + n_f2

    with open(state_path) as f:
        st2 = json.load(f)
    assert st2["version"] == 2
    files2 = sorted(f for f in os.listdir(parsed_dir)
                    if f.endswith(".parquet"))
    assert st2["folded"] == files2
    new_files = sorted(set(files2) - set(files1))
    assert new_files  # drain 2 committed its own files

    # equivalence: drain-2 tags == rebuild-from-scratch filter over
    # (history ∪ drain-1 output) applied in batch to the same rows
    rows2 = spark.read.parquet(
        *[os.path.join(parsed_dir, f) for f in new_files])
    full_hist = (spark.read.parquet(hist_dir).select("content_hash")
                 .union(spark.read.parquet(
                     *[os.path.join(parsed_dir, f) for f in files1])
                     .select("content_hash")))
    want_df = bloom_dedup_stream(rows2.drop("maybe_dup"),
                                 bloom_history_bits(full_hist))
    want = {(r.url, r.warc_ts): r.maybe_dup
            for r in want_df.select("url", "warc_ts", "maybe_dup").collect()}
    got = {(r.url, r.warc_ts): r.maybe_dup
           for r in rows2.select("url", "warc_ts", "maybe_dup").collect()}
    assert got == want
    # and the incremental fold actually took: drain-1's fresh docs are
    # history now, so their drain-2 duplicates must all be flagged
    hashes1 = {r.content_hash for r in
               spark.read.parquet(
                   *[os.path.join(parsed_dir, f) for f in files1])
               .select("content_hash").collect()}
    n_dup_of_1 = sum(1 for r in rows2.select("content_hash", "maybe_dup")
                     .collect()
                     if r.content_hash in hashes1 and r.maybe_dup == 1)
    assert n_dup_of_1 >= n_dof


def test_stream_drain_kind_must_stay_constant(spark, tmp_path):
    """A parsed sink created by the plain drain cannot be resumed by the
    Bloom drain (different sink schema: maybe_dup) — the marker records
    the drain kind and fails fast instead of mixing schemas."""
    import pytest

    from htmlparser_spark.streaming.job import run_bloom_stream_once

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _write_batch(spark, src, 10, 42, "d1")
    run_stream_once(spark, src, out)
    with pytest.raises(ValueError, match="stream flag mismatch"):
        run_bloom_stream_once(spark, src, out, str(tmp_path / "whatever"))


def test_bloom_crash_between_commit_and_fold_recovers(spark, tmp_path):
    """Code-review finding: if a drain crashes after its sink commit but
    before its fold, the NEXT drain must fold the pending files BEFORE
    tagging — otherwise duplicates of the crashed drain's rows would slip
    through untagged (a Bloom false negative). Simulated by rewinding
    _bloom_state.json to its post-seed value after a completed drain."""
    import json

    from htmlparser_spark.streaming.job import (
        bloom_history_bits, run_bloom_stream_once)

    src_h, out_h = str(tmp_path / "src_h"), str(tmp_path / "out_h")
    src_n, out_n = str(tmp_path / "src_n"), str(tmp_path / "out_n")
    _write_batch(spark, src_h, 60, 1, "hist")
    run_stream_once(spark, src_h, out_h)
    hist_dir = os.path.join(out_h, "parsed")

    n1 = _write_batch(spark, src_n, 50, 3, "drop1")  # fresh vs history
    r1 = run_bloom_stream_once(spark, src_n, out_n, hist_dir)
    assert r1["rows_total"] == n1

    # rewind to the crash state: sink files committed, fold never ran
    state_path = os.path.join(out_n, "_bloom_state.json")
    with open(state_path, "w") as f:
        json.dump({"version": 0, "folded": []}, f)
    hist = spark.read.parquet(hist_dir)
    bloom_history_bits(hist).write.mode("overwrite").parquet(
        os.path.join(out_n, "_bloom_bits", "v0"))

    # drain 2 repeats drop1's content: every row is a duplicate of rows
    # already committed to this sink, so all must be flagged — which only
    # happens if the pre-drain fold recovered the pending files
    n2 = _write_batch(spark, src_n, 50, 3, "drop1_again")
    r2 = run_bloom_stream_once(spark, src_n, out_n,
                               str(tmp_path / "no_such_history"))
    assert r2["rows_total"] == n1 + n2
    assert r2["maybe_dup_total"] >= n2  # no false negatives after crash
    with open(state_path) as f:
        st = json.load(f)
    parsed_dir = os.path.join(out_n, "parsed")
    files = sorted(f for f in os.listdir(parsed_dir)
                   if f.endswith(".parquet"))
    assert st["folded"] == files  # recovery + this drain both folded


def test_stream_flags_legacy_marker_migrates(spark, tmp_path):
    """A pre-kind _stream_flags.json (only {"transcode": ...}) must not
    brick the sink: the resume adopts the requested kind, enforces
    transcode, and upgrades the marker in place."""
    import json

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _write_batch(spark, src, 10, 42, "d1")
    os.makedirs(out, exist_ok=True)
    marker = os.path.join(out, "_stream_flags.json")
    with open(marker, "w") as f:
        json.dump({"transcode": False}, f)  # as written before round 5
    r = run_stream_once(spark, src, out)
    assert r["rows_total"] > 0
    with open(marker) as f:
        assert json.load(f) == {"transcode": False, "kind": "plain"}
    # the transcode flag is still enforced for legacy markers
    import pytest
    with open(marker, "w") as f:
        json.dump({"transcode": True}, f)
    with pytest.raises(ValueError, match="stream flag mismatch"):
        run_stream_once(spark, src, out, transcode=False)
