"""Structured Streaming variant of the extraction pipeline.

A crawl is naturally a stream of WARC drops: new page files land in a
directory (or Kafka/Iceberg CDC in prod) and the extractor keeps up
incrementally. The streaming plan reuses the EXACT batch kernel stage —
``mapInPandas(parse_batch)`` is stateless, so it is legal on a streaming
DataFrame — plus:

  - file-source scan with ``maxFilesPerTrigger`` back-pressure (S1-stream),
  - the same url-hash partitioning expression (S3) computed per micro-batch,
  - exactly-once parquet sink via checkpointed file-sink commit log (S10),
  - watermarked tumbling-window error-counter aggregation (S8-stream):
    late pages beyond the watermark are dropped deterministically,
  - a custom stateful operator via ``applyInPandasWithState``: per-host
    running crawl stats (pages, bytes, error pages seen so far) — the
    streaming analogue of a hypertable rollup.

Scale shape: each micro-batch is a normal Spark job, so everything said in
pipeline/job.py about partitioning, salting, and skew applies per batch; the
stateful host rollup shuffles on `host`, whose cardinality (millions) dwarfs
executor count, and state is RocksDB-backed on a real cluster
(spark.sql.streaming.stateStore.providerClass).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Iterator, Tuple

import pandas as pd

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from ..pipeline.kernel_stage import parse_batch
from ..pipeline.schema import PAGES_SCHEMA, PARSED_SCHEMA


def read_page_stream(spark: SparkSession, src_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """S1-stream: file-source scan of page parquet drops."""
    reader = (spark.readStream.schema(PAGES_SCHEMA)
              # crawl drops arrive as whole directories (one per WARC dump)
              .option("recursiveFileLookup", "true"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(src_dir)


def read_rate_page_stream(spark: SparkSession, rows_per_second: int = 200,
                          partitions: int = 2, seed: int = 42) -> DataFrame:
    """Non-file unbounded source: Spark's built-in ``rate`` source emits
    (timestamp, value) rows at a fixed rate with backpressure knobs —
    the in-sandbox stand-in for a Kafka topic (no broker exists here).
    Pages are synthesized DETERMINISTICALLY from ``value`` through the same
    generator as the batch synth corpus, so for any consumed value range the
    stream's contents are reproducible. Going live is a two-line swap:
    ``format("kafka") + options`` in place of ``format("rate")``, and a
    (key, value)->page decode in place of _rate_rows_to_pages — everything
    downstream (kernel, sinks, watermarks, stateful rollups) is source-
    agnostic."""
    raw = (spark.readStream.format("rate")
           .option("rowsPerSecond", rows_per_second)
           .option("numPartitions", partitions).load())
    return _rate_rows_to_pages(raw, seed)


def _rate_rows_to_pages(raw: DataFrame, seed: int = 42) -> DataFrame:
    """(timestamp, value) -> PAGES_SCHEMA rows via the deterministic batch
    page generator (stateless per-row, so legal on a stream)."""
    from ..synth import gen_page

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_page(seed, int(v)) for v in pdf["value"]]
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return raw.mapInPandas(gen, PAGES_SCHEMA)


def parse_page_stream(pages: DataFrame, extract: bool = True,
                      transcode: bool = False) -> DataFrame:
    """S5 on a stream: identical kernel, identical output schema.

    transcode: same fused charset pass as the batch pipeline — the sniff
    columns are stateless per-row codegen and the re-encode lives inside
    parse_batch, so it is legal on a streaming DataFrame and adds nothing
    to the plan beyond the scan projection."""
    if transcode:
        from ..sources.charset import with_sniffed_encoding
        pages = with_sniffed_encoding(pages).drop("method")
    with_key = (pages
                .withColumn("part_key",
                            F.pmod(F.xxhash64("url"), F.lit(4096))
                            .cast("long"))
                # raw-content fingerprint, same contract as the batch
                # pipeline (pipeline/job.py run_pipeline): computed
                # JVM-side on the RAW capture bytes (before any in-kernel
                # transcode rebinding) and passed through the kernel.
                # Without it every streamed row carries content_hash = 0
                # and the Bloom dedup drain degenerates to flag-everything.
                .withColumn("content_hash", F.xxhash64("html")))
    return with_key.mapInPandas(
        partial(parse_batch, extract=extract), schema=PARSED_SCHEMA)


def write_parsed_stream(parsed: DataFrame, out_dir: str,
                        trigger_available_now: bool = True):
    """S10-stream: exactly-once parquet sink (file-sink commit log in the
    checkpoint dir makes re-runs idempotent)."""
    writer = (parsed.writeStream
              .format("parquet")
              .option("path", os.path.join(out_dir, "parsed"))
              .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_page_stream(pages: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """S6-stream: drop re-deliveries of the same page snapshot across
    micro-batches. Keyed on (url, content_hash = xxhash64(html)) — the same
    (url, bytes) snapshot delivered twice (at-least-once WARC drops,
    retried upstream ingests) parses once; a genuine re-crawl of the url
    with different bytes still flows through. dropDuplicatesWithinWatermark
    bounds the dedup state by the event-time watermark: a key's state is
    evicted once the watermark passes it, so state size tracks the
    re-delivery horizon, not the crawl's lifetime — the property that keeps
    the stream runnable indefinitely at crawl scale (state lives in the
    RocksDB store on a real cluster)."""
    return (pages
            .withColumn("content_hash", F.xxhash64("html"))
            .withWatermark("warc_ts", watermark)
            .dropDuplicatesWithinWatermark(["url", "content_hash"])
            .drop("content_hash"))


def error_window_stream(parsed: DataFrame, window: str = "1 hour",
                        watermark: str = "2 hours") -> DataFrame:
    """S8-stream: watermarked tumbling-window status counters. Append mode
    emits a window only once the watermark passes it — deterministic late-data
    policy instead of unbounded state."""
    return (parsed
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"), F.col("status"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("n_errors").alias("n_errors"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "status", "n", "n_errors"))


# --- custom stateful operator: per-host running crawl stats -------------------

HOST_STATE_SCHEMA = StructType([
    StructField("pages", LongType()),
    StructField("bytes", LongType()),
    StructField("err_pages", LongType()),
])

HOST_ROLLUP_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("pages", LongType()),
    StructField("bytes", LongType()),
    StructField("err_pages", LongType()),
    StructField("batch_ts", TimestampType()),
])


def _host_rollup(key: Tuple[str], batches: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    """Running (pages, bytes, error-pages) per host across micro-batches."""
    pages = 0
    byte_count = 0
    err = 0
    last_ts = None
    for pdf in batches:
        pages += len(pdf)
        byte_count += int(pdf["html_bytes"].sum())
        err += int((pdf["status"] != "ok").sum())
        ts = pdf["warc_ts"].max()
        if last_ts is None or (ts is not None and ts > last_ts):
            last_ts = ts
    if state.exists:
        p0, b0, e0 = state.get
    else:
        p0, b0, e0 = 0, 0, 0
    new = (p0 + pages, b0 + byte_count, e0 + err)
    state.update(new)
    yield pd.DataFrame({"host": [key[0]], "pages": [new[0]],
                        "bytes": [new[1]], "err_pages": [new[2]],
                        "batch_ts": [last_ts]})


def host_expr():
    """Host state-group key from a url. No trailing '/' required:
    'https://host.example' (no path) must still yield its host, not
    collapse into the '' state group; scheme match is case-insensitive
    (RFC 3986 §3.1 — 'HTTPS://x' is a valid URL and must not collapse
    into the '' group either), and the extracted host is lowercased
    (§3.2.2: host comparison is case-insensitive) so 'Example.com' and
    'example.com' share one state group."""
    return F.lower(
        F.regexp_extract("url", r"^(?i)[a-z][a-z0-9+.-]*://([^/]+)", 1))


def host_rollup_stream(parsed: DataFrame) -> DataFrame:
    """Stateful per-host rollup (applyInPandasWithState). Emits the updated
    running totals for every host seen in each micro-batch."""
    return (parsed
            .withColumn("host", host_expr())
            .groupBy("host")
            .applyInPandasWithState(
                _host_rollup,
                outputStructType=HOST_ROLLUP_SCHEMA,
                stateStructType=HOST_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))


def _atomic_json_write(path: str, obj: dict) -> None:
    """tmp-then-rename JSON persistence shared by the flags marker and the
    Bloom bit-set state, so a durability fix (e.g. fsync-before-replace)
    lands in one place."""
    import json
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _check_stream_flags(out_dir: str, transcode: bool,
                        kind: str = "plain") -> None:
    """Enforce the flag-constancy contract across drains of one out_dir,
    mirroring the batch pipeline's lineage-manifest check: a caller flipping
    transcode between drains would otherwise silently produce a parsed sink
    half-decoded each way with nothing recording which. The marker also
    records the DRAIN KIND ("plain" vs "bloom"): the two drains write
    different sink schemas (the Bloom drain adds maybe_dup), so resuming a
    plain out_dir with the Bloom drain (or vice versa) would mix files with
    and without the column — the exact silent-mixed-sink condition the
    marker exists to fail fast on. The flag is persisted once in a marker
    file next to the checkpoint dir (it cannot live IN the checkpoint:
    Spark owns that layout)."""
    marker = os.path.join(out_dir, "_stream_flags.json")
    want = {"transcode": bool(transcode), "kind": kind}
    if os.path.exists(marker):
        import json
        with open(marker) as f:
            have = json.load(f)
        migrate = "kind" not in have
        if migrate:
            # marker written before the drain kind was recorded: adopt the
            # requested kind once (transcode is still enforced) and upgrade
            # the marker, instead of bricking every pre-existing sink on a
            # whole-dict mismatch
            have["kind"] = kind
        if have != want:
            raise ValueError(
                f"stream flag mismatch for {out_dir!r}: this drain requested "
                f"{want} but the sink was created with {have}; use a new "
                "out_dir (or keep the original flags) — mixed decodes in one "
                "parsed sink are unrecoverable")
        if migrate:
            _atomic_json_write(marker, want)
    else:
        os.makedirs(out_dir, exist_ok=True)
        _atomic_json_write(marker, want)


def run_stream_once(spark: SparkSession, src_dir: str, out_dir: str,
                    transcode: bool = False) -> dict:
    """Drain everything currently in src_dir through the kernel into
    out_dir/parsed exactly once (availableNow), then stop. Re-running after
    new files arrive processes ONLY the new files (checkpoint). transcode
    must stay constant across drains of one out_dir (same contract as the
    batch pipeline's resumed sinks) — enforced via a marker file."""
    _check_stream_flags(out_dir, transcode, kind="plain")
    pages = read_page_stream(spark, src_dir)
    parsed = parse_page_stream(pages, transcode=transcode)
    q = write_parsed_stream(parsed, out_dir)
    q.awaitTermination()
    parsed_dir = os.path.join(out_dir, "parsed")
    try:
        out = spark.read.schema(PARSED_SCHEMA).parquet(parsed_dir)
        n = out.count()
    except AnalysisException:
        # empty source on the first run: the file sink never creates the
        # output path, which is "0 rows", not an error. Probed through
        # Spark's reader (not os.path) so hdfs://-s3a:// sinks work too.
        return {"rows_total": 0}
    return {"rows_total": n}


def links_stream(pages: DataFrame) -> DataFrame:
    """Web-graph stage on a stream: links_batch is stateless, so the SAME
    Arrow kernel that serves the batch path (pipeline/links_stage.py) is
    legal per micro-batch — each drop of crawl pages yields its outlink
    rows incrementally."""
    from ..pipeline.links_stage import links_batch
    from ..pipeline.schema import LINKS_SCHEMA
    return pages.mapInPandas(links_batch, schema=LINKS_SCHEMA)


def write_links_stream(links: DataFrame, out_dir: str,
                       trigger_available_now: bool = True):
    """Exactly-once links sink (own commit log, independent of the parsed
    sink's checkpoint so the two streams can run and recover separately)."""
    writer = (links.writeStream
              .format("parquet")
              .option("path", os.path.join(out_dir, "links"))
              .option("checkpointLocation",
                      os.path.join(out_dir, "_links_checkpoint"))
              .outputMode("append"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_links_stream_once(spark: SparkSession, src_dir: str,
                          out_dir: str) -> dict:
    """Drain pending page drops into out_dir/links exactly once."""
    from ..pipeline.schema import LINKS_SCHEMA

    pages = read_page_stream(spark, src_dir)
    q = write_links_stream(links_stream(pages), out_dir)
    q.awaitTermination()
    links_dir = os.path.join(out_dir, "links")
    try:
        n = spark.read.schema(LINKS_SCHEMA).parquet(links_dir).count()
    except AnalysisException:
        return {"links_total": 0}
    return {"links_total": n}


def bloom_history_bits(history: DataFrame) -> DataFrame:
    """Fold a historical parsed corpus's content hashes into the ≤ BLOOM_M
    set bit positions of a Bloom filter — the bit geometry comes from the
    SHARED ops._bloom_position helper (also used by the batch dedup_bloom),
    so the stream and batch paths cannot drift. Map-side explode + partial
    distinct below ONE exchange; output is ≤ m rows regardless of history
    size — the one dedup structure that still broadcasts when history is
    10¹² documents."""
    from ..ops import BLOOM_K, _bloom_position

    pos = [_bloom_position(F.col("content_hash"), j).alias("pos")
           for j in range(BLOOM_K)]
    return history.select(F.explode(F.array(*pos)).alias("pos")).distinct()


def bloom_dedup_stream(parsed: DataFrame, hist_bits: DataFrame) -> DataFrame:
    """Tag a parsed page stream with maybe_dup against the history Bloom
    filter: one stream-static BROADCAST left join per hash function (k=3),
    no aggregation — stateless per row, so it is legal in append mode and
    costs nothing beyond the map stage of each micro-batch. maybe_dup = 1
    iff all k probed bits are set (Bloom positive: every true duplicate of
    a history document is flagged — no false negatives — plus the filter's
    m/k-governed false-positive minority). Works identically on a BATCH
    DataFrame (pinned by a stream-vs-batch differential test).

    Scale shape: the probe never shuffles the stream — k broadcast joins +
    codegen hashes; per-micro-batch cost is O(|batch|), independent of
    history size. run_bloom_stream_once persists the bit set and folds
    only each drained batch back in, so filter maintenance is O(|batch|)
    too."""
    from ..ops import BLOOM_K, _bloom_position

    out = parsed
    hits = []
    for j in range(BLOOM_K):
        pos_j = _bloom_position(F.col("content_hash"), j)
        bits_j = (hist_bits.select(F.col("pos").alias(f"_pos{j}"))
                  .withColumn(f"_set{j}", F.lit(1)))
        out = (out.withColumn(f"_pos{j}", pos_j)
               .join(F.broadcast(bits_j), f"_pos{j}", "left"))
        hits.append(F.coalesce(F.col(f"_set{j}"), F.lit(0)))
    n_set = hits[0]
    for h in hits[1:]:
        n_set = n_set + h
    out = out.withColumn("maybe_dup", (n_set == F.lit(BLOOM_K)).cast("int"))
    return out.drop(*[f"_pos{j}" for j in range(BLOOM_K)],
                    *[f"_set{j}" for j in range(BLOOM_K)])


def _bloom_state_load(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, "_bloom_state.json")
    if not os.path.exists(path):
        return None
    import json
    with open(path) as f:
        return json.load(f)


def _bloom_state_save(out_dir: str, state: dict) -> None:
    _atomic_json_write(os.path.join(out_dir, "_bloom_state.json"), state)


def _bloom_fold_pending(spark: SparkSession, out_dir: str,
                        state: dict) -> dict:
    """Fold every committed sink file not yet in the folded-file manifest
    into the next bit-set version and return the advanced state (or the
    unchanged state when nothing is pending). Idempotent — bits are a
    set — and called both BEFORE a drain (so a crash between a previous
    drain's sink commit and its fold can never leave committed rows out
    of the filter when the next batch is tagged) and after it (folding
    the drain's own output for the future)."""
    import shutil
    parsed_dir = os.path.join(out_dir, "parsed")
    bits_root = os.path.join(out_dir, "_bloom_bits")
    try:
        files = sorted(f for f in os.listdir(parsed_dir)
                       if f.endswith(".parquet"))
    except FileNotFoundError:
        return state
    new = sorted(set(files) - set(state["folded"]))
    if not new:
        return state
    old_bits = spark.read.parquet(
        os.path.join(bits_root, f"v{state['version']}"))
    batch = spark.read.schema(PARSED_SCHEMA).parquet(
        *[os.path.join(parsed_dir, f) for f in new])
    nxt = state["version"] + 1
    (bloom_history_bits(batch).union(old_bits).distinct()
     .write.mode("overwrite").parquet(os.path.join(bits_root, f"v{nxt}")))
    new_state = {"version": nxt, "folded": files}
    _bloom_state_save(out_dir, new_state)
    shutil.rmtree(os.path.join(bits_root, f"v{state['version']}"),
                  ignore_errors=True)
    return new_state


def run_bloom_stream_once(spark: SparkSession, src_dir: str, out_dir: str,
                          history_dir: str) -> dict:
    """Continuous-ingest dedup drain: parse pending page drops and tag
    every parsed row against the history Bloom filter, writing
    parsed + maybe_dup exactly once.

    The bit set is PERSISTED and maintained incrementally: the FIRST drain
    of an out_dir folds history_dir (any parsed parquet sink — a batch run
    or a previous drain) into ``out_dir/_bloom_bits/v0`` once; every drain
    after that reads the ≤ BLOOM_M-row bit-set parquet (never history) and,
    after the sink commits, folds ONLY the newly committed parquet files
    back in, writing the next bit-set version and advancing
    ``_bloom_state.json`` atomically. End-to-end per-drain cost is
    therefore O(|batch|) + O(BLOOM_M), independent of accumulated history —
    the property that makes the drain viable against a 10¹²-document
    history. Crash-safe because bit-folding is idempotent (bits are a set:
    replaying a batch re-sets the same positions), the state json is the
    commit point, AND pending unfolded sink files are folded BEFORE each
    drain tags — a crash between a drain's sink commit and its fold can
    therefore never cost a false negative on the next drain; superseded
    bit-set versions are GC'd. New-file discovery lists the local sink
    directory against the folded-file manifest; on an object-store sink,
    swap in the file sink's own _spark_metadata batch manifest — the fold
    itself is storage-agnostic.

    This drain always parses untranscoded (same marker contract as
    run_stream_once: resuming an out_dir a transcoded — or plain-kind —
    drain created fails fast instead of mixing sink schemas)."""
    _check_stream_flags(out_dir, transcode=False, kind="bloom")
    bits_root = os.path.join(out_dir, "_bloom_bits")
    state = _bloom_state_load(out_dir)
    if state is None:
        hist = spark.read.schema(PARSED_SCHEMA).parquet(history_dir)
        bloom_history_bits(hist).write.mode("overwrite").parquet(
            os.path.join(bits_root, "v0"))
        state = {"version": 0, "folded": []}
        _bloom_state_save(out_dir, state)
    # crash recovery: fold files a previous drain committed but never
    # folded, so this drain tags against the complete history
    state = _bloom_fold_pending(spark, out_dir, state)
    hist_bits = spark.read.parquet(
        os.path.join(bits_root, f"v{state['version']}"))

    pages = read_page_stream(spark, src_dir)
    parsed = parse_page_stream(pages)
    tagged = bloom_dedup_stream(parsed, hist_bits)
    q = write_parsed_stream(tagged, out_dir)
    q.awaitTermination()

    # fold ONLY this drain's newly committed files into the bit set
    _bloom_fold_pending(spark, out_dir, state)

    parsed_dir = os.path.join(out_dir, "parsed")
    try:
        out = spark.read.parquet(parsed_dir)
        row = out.agg(F.count(F.lit(1)).alias("n"),
                      F.sum("maybe_dup").alias("d")).collect()[0]
    except AnalysisException:
        return {"rows_total": 0, "maybe_dup_total": 0}
    return {"rows_total": row["n"], "maybe_dup_total": int(row["d"] or 0)}
