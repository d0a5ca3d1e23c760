"""Input/output schemas (BASELINE.json input_hint; SURVEY.md §1.2)."""
from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, IntegerType, LongType, MapType,
    StringType, StructField, StructType, TimestampType,
)

# Common-Crawl-style pages table (input_hint)
PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])

SPAN_TYPE = StructType([
    StructField("node_id", IntegerType()),
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
])

# Kernel stage (S5) output. content_hash is a PASSTHROUGH column (like
# part_key): the job computes xxhash64(html) JVM-side before the kernel so
# the post-parse dedup window can tiebreak equal-warc_ts snapshots on raw
# content without the raw html ever crossing an exchange.
PARSED_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("lang", StringType()),
    StructField("part_key", LongType()),
    StructField("content_hash", LongType()),
    StructField("status", StringType()),
    StructField("title", StringType()),
    StructField("text", StringType()),
    StructField("main_text", StringType()),
    StructField("spans", ArrayType(SPAN_TYPE)),
    StructField("errors", MapType(StringType(), LongType())),
    StructField("n_errors", LongType()),
    StructField("n_nodes", LongType()),
    StructField("n_elements", LongType()),
    StructField("html_bytes", LongType()),
])

# Exploded arena DOM (FIXTURES.md §4) for SQL-checkable X1/X2 stats
NODES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("node_id", IntegerType()),
    StructField("parent_id", IntegerType()),
    StructField("kind", StringType()),
    StructField("tag", StringType()),
    StructField("depth", IntegerType()),
    StructField("text_len", LongType()),
    StructField("subtree_text_len", LongType()),
    StructField("link_text_len", LongType()),
    StructField("n_desc_tags", LongType()),
    StructField("is_anchor_desc", BooleanType()),
])

# One <a href> outlink as a nested struct (the combined-kernel variant:
# parse_batch with link columns carries links as an array per page, so ONE
# parse of the raw html serves both the extraction sink and the exploded
# links sink — run_pipeline(emit_links=True)).
LINK_TYPE = StructType([
    StructField("seq", IntegerType()),
    StructField("href", StringType()),
    StructField("href_abs", StringType()),
    StructField("dst_host", StringType()),
    StructField("anchor", StringType()),
    StructField("nofollow", BooleanType()),
])

# Optional web-graph columns parse_batch can emit in ADDITION to
# PARSED_SCHEMA (kernel_stage.parsed_schema selects them by name; default
# consumers never build or ship them).
PARSED_LINK_FIELDS = [
    StructField("links", ArrayType(LINK_TYPE)),
    StructField("base_href", StringType()),
    StructField("canonical", StringType()),
    StructField("robots_noindex", BooleanType()),
    StructField("robots_nofollow", BooleanType()),
    StructField("meta_description", StringType()),
]

PARSED_FULL_SCHEMA = StructType(PARSED_SCHEMA.fields + PARSED_LINK_FIELDS)

# Web-graph stage output (kernel/links.py): one row per <a href> outlink.
# (url, warc_ts) is the page key; seq is the anchor's document-order index.
LINKS_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("seq", IntegerType()),
    StructField("href", StringType()),
    StructField("href_abs", StringType()),
    StructField("dst_host", StringType()),
    StructField("anchor", StringType()),
    StructField("nofollow", BooleanType()),
])

# Per-page indexing metadata (kernel/links.py): <base>, <meta robots>,
# <link rel=canonical>, <meta name=description>.
PAGE_META_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("lang", StringType()),
    StructField("status", StringType()),
    StructField("base_href", StringType()),
    StructField("canonical", StringType()),
    StructField("robots_noindex", BooleanType()),
    StructField("robots_nofollow", BooleanType()),
    StructField("meta_description", StringType()),
    StructField("n_links", LongType()),
])

# Per-partition lineage manifest (S9). Carries the byte/error tallies as
# well so job-level metrics are a sum over ≤4096 manifest rows — never a
# scan of the sink.
LINEAGE_SCHEMA = StructType([
    StructField("part_key", LongType()),
    StructField("n_rows", LongType()),
    StructField("n_ok", LongType()),
    StructField("n_bytes", LongType()),
    StructField("n_errors", LongType()),
    StructField("checksum", LongType()),
    # flag the partition was parsed under (run_pipeline(transcode=...)):
    # resume compares it against the current run's flag and fails fast on
    # mismatch, since completed partitions are never re-parsed. Manifests
    # written before this column read NULL = parsed without transcode.
    StructField("transcode", BooleanType()),
])
