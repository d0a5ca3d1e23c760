"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: the HTML parse kernel round-trip over sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB-runnable ANSI SQL equivalents; omitted only for the
                 non-SQL-expressible kernel/corpus queries (rows-only check).

Implementation lives in htmlparser_spark/ (kernel: htmlparser_spark/kernel/,
pipeline ops: htmlparser_spark/ops.py, htmlparser_spark/pipeline/).
"""
from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from htmlparser_spark import multimodal, ops
from htmlparser_spark.pipeline.kernel_stage import nodes_batch, parse_batch
from htmlparser_spark.pipeline.schema import NODES_SCHEMA, PARSED_SCHEMA
from htmlparser_spark.synth import synth_pages

N_MEDIA = 400  # fixed-size deterministic media table for multimodal queries

SF0001 = "/root/testdata/sf0.001"

N_CORPUS = 300  # fixed-size deterministic synthetic corpus for kernel queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: wrap documents.text into pages, run the full HTML5 tokenizer
    + tree builder + main-content extractor, return per-doc extraction."""
    return ops.parse_roundtrip(spark, SF0001)


# --- kernel queries over the deterministic synthetic corpus (rows-only) ------

def _corpus(spark):
    return synth_pages(spark, N_CORPUS, seed=42, partitions=4)


def parse_corpus_extract(spark, sf_dir):
    parsed = _corpus(spark).mapInPandas(parse_batch, schema=PARSED_SCHEMA)
    return parsed.select("url", "status", "title", "n_nodes", "n_elements",
                         F.length("text").alias("text_len"),
                         F.length("main_text").alias("main_len"))


def parse_corpus_status(spark, sf_dir):
    parsed = _corpus(spark).mapInPandas(parse_batch, schema=PARSED_SCHEMA)
    return parsed.groupBy("status").agg(F.count("*").alias("n"))


def parse_error_counters(spark, sf_dir):
    parsed = _corpus(spark).mapInPandas(parse_batch, schema=PARSED_SCHEMA)
    return (parsed.select(F.explode("errors").alias("code", "n"))
            .groupBy("code").agg(F.sum("n").alias("n")))


def parse_spans_explode(spark, sf_dir):
    parsed = _corpus(spark).mapInPandas(parse_batch, schema=PARSED_SCHEMA)
    return (parsed.select("url", F.explode("spans").alias("s"))
            .select("url", "s.node_id", "s.start", "s.end"))


def parse_tokens_explode(spark, sf_dir):
    """Tokenizer-only entry point (Program.cs:8-26 commented harness) exposed
    as a debug tokens table: one row per emitted token."""
    import pandas as pd
    from htmlparser_spark.kernel.api import tokenize
    from htmlparser_spark.kernel.tokenizer import to_wellformed

    def tok_batch(batches):
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"].tolist(), pdf["html"].tolist()):
                toks, _errs = tokenize(bytes(html))
                for i, t in enumerate(toks):
                    name = t[1] if t[0] in ("start", "end") else ""
                    data = t[1] if t[0] in ("chars", "comment") else ""
                    # token payloads are UTF-16 code units (may hold lone
                    # surrogates) — recombine before they hit Arrow
                    rows.append((url, i, t[0], str(name),
                                 to_wellformed(str(data)[:64])))
            yield pd.DataFrame(
                rows, columns=["url", "pos", "token_type", "tag", "data_prefix"])

    return (synth_pages(spark, 60, seed=42, partitions=2)
            .mapInPandas(tok_batch,
                         "url string, pos long, token_type string, "
                         "tag string, data_prefix string"))


def parse_nodes_stats(spark, sf_dir):
    nodes = (synth_pages(spark, 60, seed=42, partitions=2)
             .mapInPandas(nodes_batch, schema=NODES_SCHEMA))
    return (nodes.groupBy("kind")
            .agg(F.count("*").alias("n"),
                 F.sum("text_len").alias("total_text"),
                 F.max("depth").alias("max_depth")))


# --- multimodal binary-column queries (deterministic synthetic media table;
# the DuckDB oracle recomputes the metadata arithmetically, so the value-hash
# gate verifies the binary decode round-trip) ---------------------------------

def media_decode(spark, sf_dir):
    return multimodal.media_decode(spark, N_MEDIA)


def media_image_resize(spark, sf_dir):
    return multimodal.image_resize(spark, N_MEDIA)


def media_audio_frames(spark, sf_dir):
    return multimodal.audio_frame_sample(spark, N_MEDIA)


def media_features(spark, sf_dir):
    df = multimodal.media_feature_vector(spark, N_MEDIA)
    return df.select("media_id", "kind",
                     F.round(F.aggregate("feature", F.lit(0.0),
                                         lambda a, v: a + v), 6).alias("feat_sum"))


def nodes_stats_consistency(spark, sf_dir):
    """X1 invariant check, SQL-checkable: the kernel's bottom-up subtree
    text_len must equal parent-chain aggregation over the exploded nodes
    table (computed here with a Spark self-join; the DuckDB oracle just
    pins the violation count at 0 rows of violations => n_violations=0)."""
    import pandas as pd

    nodes = (synth_pages(spark, 60, seed=42, partitions=2)
             .mapInPandas(nodes_batch, schema=NODES_SCHEMA))

    def check(pdf: pd.DataFrame) -> pd.DataFrame:
        parent = pdf.set_index("node_id")["parent_id"].to_dict()
        direct = pdf.set_index("node_id")["text_len"].to_dict()
        expect = pdf.set_index("node_id")["subtree_text_len"].to_dict()
        totals = {nid: 0 for nid in parent}
        for nid, d in direct.items():  # propagate up every parent chain
            cur = nid
            while cur is not None and cur >= 0:
                totals[cur] += int(d)
                cur = parent.get(cur)
        bad = sum(1 for nid in parent if totals[nid] != expect[nid])
        return pd.DataFrame({"n_violations": [bad]})

    per_page = (nodes.groupBy("url", "warc_ts")
                .applyInPandas(check, schema="n_violations long"))
    return per_page.agg(F.sum("n_violations").alias("n_violations"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # kernel (parse/extract) — flagship is oracle-checkable
        "parse_roundtrip": ops.parse_roundtrip,
        "parse_corpus_extract": parse_corpus_extract,
        "parse_corpus_status": parse_corpus_status,
        "parse_error_counters": parse_error_counters,
        "parse_spans_explode": parse_spans_explode,
        "parse_nodes_stats": parse_nodes_stats,
        "parse_tokens_explode": parse_tokens_explode,
        "nodes_stats_consistency": nodes_stats_consistency,
        # pipeline-shape relational ops (S2/S6/S7/S8)
        "filter_project": ops.filter_project,
        "window_dedup_latest": ops.window_dedup_latest,
        "explode_tokens": ops.explode_tokens,
        "agg_counters": ops.agg_counters,
        # TPC-H-shaped showcases
        "q1_pricing_summary": ops.q1_pricing_summary,
        "q3_revenue_by_order": ops.q3_revenue_by_order,
        "join_broadcast_dims": ops.join_broadcast_dims,
        # dedup family
        "dedup_exact": ops.dedup_exact,
        "dedup_ngram_jaccard": ops.dedup_ngram_jaccard,
        "dedup_minhash_lsh": ops.dedup_minhash_lsh,
        "dedup_simhash": ops.dedup_simhash,
        "dedup_embedding_cosine": ops.dedup_embedding_cosine,
        # TPC-H second-fact-key joins
        "part_brand_revenue": ops.part_brand_revenue,
        "supplier_nation_rank": ops.supplier_nation_rank,
        # similarity search
        "embedding_topk": ops.embedding_topk,
        "embedding_ann_lsh": ops.embedding_ann_lsh,
        "embedding_ann_ivf": ops.embedding_ann_ivf,
        # multimodal binary columns
        "media_decode": media_decode,
        "media_image_resize": media_image_resize,
        "media_audio_frames": media_audio_frames,
        "media_features": media_features,
        # text analysis
        "text_token_count": ops.text_token_count,
        "text_quality": ops.text_quality,
        "text_lang_id": ops.text_lang_id,
        "text_fingerprint": ops.text_fingerprint,
    }


_SHINGLES_CTE = """
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, ws,
               unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i
        FROM words)
  WHERE length(array_to_string(ws[i:i+2], ' ')) > 0
),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "parse_roundtrip": """
            SELECT doc_id, 'ok' AS status,
                   'doc-' || doc_id::varchar AS title,
                   text AS main_text
            FROM documents
            WHERE regexp_matches(text, '^[a-z0-9 ]*$')
        """,
        "filter_project": """
            SELECT doc_id, n_chars, upper(source) AS source_uc,
                   length(text) - n_chars AS len_delta
            FROM documents WHERE lang = 'en'
        """,
        "window_dedup_latest": """
            SELECT user_id, event_id, event_type, round(value, 2) AS value_r
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
                  FROM events)
            WHERE rn = 1
        """,
        "explode_tokens": """
            SELECT doc_id, i - 1 AS pos, ws[i] AS token
            FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
                  FROM (SELECT doc_id, string_split(text, ' ') AS ws
                        FROM documents))
            WHERE ws[i] <> ''
        """,
        "agg_counters": """
            SELECT event_type, count(*) AS n,
                   sum(round(value * 100, 0)::bigint) AS total_value_cents,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(round(l_quantity * 100, 0)::bigint) AS sum_qty_c,
                   sum(round(l_extendedprice * 100, 0)::bigint) AS sum_base_price_c,
                   sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::bigint)
                     AS sum_disc_price_c,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_revenue_by_order": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::bigint)
                     AS revenue_cents
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            HAVING sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::bigint)
                   > 100000
        """,
        "join_broadcast_dims": """
            SELECT r_name, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "dedup_ngram_jaccard": f"""
            WITH {_SHINGLES_CTE},
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT doc_a, doc_b,
                   round(inter::double / (sa.sz + sb.sz - inter), 6) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = doc_a
            JOIN sz sb ON sb.doc_id = doc_b
            WHERE round(inter::double / (sa.sz + sb.sz - inter), 6) >= 0.5
        """,
        "dedup_minhash_lsh": f"""
            WITH {_SHINGLES_CTE},
            mh AS (
              SELECT doc_id, k,
                     min(('0x' || substr(md5(k::varchar || ':' || shingle), 1, 8))::bigint) AS mh
              FROM (SELECT doc_id, shingle,
                           unnest(generate_series(0, 15)) AS k FROM sh)
              GROUP BY doc_id, k),
            sig AS (
              SELECT doc_id, (k // 4) AS band,
                     string_agg(mh::varchar, '-' ORDER BY k) AS sig
              FROM mh GROUP BY doc_id, (k // 4)),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM sig a JOIN sig b
                ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
            inter AS (
              SELECT c.doc_a, c.doc_b, count(*) AS inter
              FROM cand c
              JOIN sh a ON a.doc_id = c.doc_a
              JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
              GROUP BY c.doc_a, c.doc_b)
            SELECT doc_a, doc_b,
                   round(inter::double / (sa.sz + sb.sz - inter), 6) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = doc_a
            JOIN sz sb ON sb.doc_id = doc_b
            WHERE round(inter::double / (sa.sz + sb.sz - inter), 6) >= 0.5
        """,
        "dedup_simhash": f"""
            WITH {_SHINGLES_CTE},
            h AS (SELECT doc_id,
                         ('0x' || substr(md5('0:' || shingle), 1, 8))::bigint AS h
                  FROM sh),
            votes AS (
              SELECT doc_id, bit, sum(((h >> bit) & 1) * 2 - 1) AS vote
              FROM (SELECT doc_id, h, unnest(generate_series(0, 31)) AS bit
                    FROM h)
              GROUP BY doc_id, bit)
            SELECT doc_id,
                   sum(CASE WHEN vote > 0 THEN (1::bigint << bit) ELSE 0 END) AS simhash
            FROM votes GROUP BY doc_id
        """,
        "embedding_topk": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> x::double) AS v
                       FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_dot_product(q.qv, e.v)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(e.v, e.v))) AS cos
              FROM q, e WHERE e.vec_id <> q.query_id),
            ranked AS (
              SELECT query_id, vec_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, vec_id ASC) AS rank
              FROM scored)
            SELECT query_id, vec_id, rank, round(cos, 4) AS cos_r
            FROM ranked WHERE rank <= 3
        """,
        "text_token_count": """
            SELECT doc_id,
                   len(list_filter(string_split(text, ' '), w -> w <> '')) AS ws_tokens,
                   len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens
            FROM documents
        """,
        "text_quality": """
            WITH w AS (SELECT doc_id,
                              list_filter(string_split(text, ' '), x -> x <> '') AS ws
                       FROM documents),
            calc AS (
              SELECT doc_id, len(ws) AS n_words,
                     coalesce(list_sum(list_transform(ws, x -> length(x))), 0)::double
                       / greatest(len(ws), 1) AS awl,
                     len(list_filter(ws, x -> list_contains(
                         ['the','a','of','and','to','in','with','over','my'], x)))::double
                       / greatest(len(ws), 1) AS sr
              FROM w)
            SELECT doc_id, n_words, round(awl, 4) AS avg_word_len,
                   round(sr, 4) AS stopword_ratio,
                   round(least(1.0, sr * 2 + CASE WHEN awl >= 3 AND awl <= 8
                                                  THEN 0.5 ELSE 0.0 END), 4)
                     AS quality_score
            FROM calc
        """,
        "text_lang_id": """
            WITH w AS (SELECT doc_id,
                              list_filter(string_split(text, ' '), x -> x <> '') AS ws
                       FROM documents),
            hits AS (
              SELECT doc_id,
                len(list_filter(ws, x -> list_contains(
                    ['the','a','of','and','to','in','with','over','my'], x))) AS hits_en,
                len(list_filter(ws, x -> list_contains(
                    ['der','die','das','und','mit','ein','zu'], x))) AS hits_de,
                len(list_filter(ws, x -> list_contains(
                    ['le','la','les','et','de','un','une'], x))) AS hits_fr
              FROM w)
            SELECT doc_id, hits_en, hits_de, hits_fr,
                   CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr THEN 'en'
                        WHEN hits_de >= hits_fr THEN 'de'
                        ELSE 'fr' END AS lang_pred
            FROM hits
        """,
        "text_fingerprint": """
            SELECT doc_id,
                   md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
            FROM documents
        """,
        "nodes_stats_consistency": """
            SELECT 0::bigint AS n_violations
        """,
        # fixture-pinned expectations for the deterministic synthetic corpus
        # (seed=42, N_CORPUS=300 + ~5% dup snapshots = 315 pages): these pin
        # the KERNEL's status taxonomy and error counters as a value-hash
        # gate, not just a row count
        "parse_corpus_status": """
            SELECT * FROM (VALUES
              ('ok', 304::bigint),
              ('err:not-implemented:after-after-body', 2::bigint),
              ('err:not-implemented:comment', 1::bigint),
              ('err:not-implemented:in-body-any-other-end-tag', 1::bigint),
              ('err:not-implemented:in-body-form', 2::bigint),
              ('err:not-implemented:in-body-heading', 1::bigint),
              ('err:not-implemented:in-body-pre', 2::bigint),
              ('err:selfclosing-eof', 2::bigint)
            ) AS t(status, n)
        """,
        "parse_error_counters": """
            SELECT * FROM (VALUES
              ('parse error', 5748::bigint),
              ('missing-semicolon-after-character-reference', 36::bigint),
              ('absence-of-digits-in-numeric-character-reference', 31::bigint),
              ('unknown-named-character-reference', 29::bigint),
              ('invalid-first-character-of-tag-name', 2::bigint),
              ('unexpected-question-mark-instead-of-tag-name', 1::bigint)
            ) AS t(code, n)
        """,
        "dedup_embedding_cosine": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> x::double) AS v
                       FROM embeddings),
            c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 16),
            ac AS (
              SELECT e.vec_id, e.v, c.cent_id,
                     list_dot_product(e.v, c.cv)
                       / (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(c.cv, c.cv))) AS cos_c
              FROM e, c),
            assigned AS (
              SELECT vec_id, v, cent_id AS cell FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                           ORDER BY cos_c DESC, cent_id ASC) AS rn FROM ac)
              WHERE rn = 1),
            pairs AS (
              SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                     list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))) AS cos
              FROM assigned a JOIN assigned b
                ON a.cell = b.cell AND a.vec_id < b.vec_id)
            SELECT vec_a, vec_b, round(cos, 4) AS cos_r
            FROM pairs WHERE cos >= 0.40
        """,
        "part_brand_revenue": """
            SELECT p_brand, p_type, count(*) AS n_items,
                   sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::bigint)
                     AS revenue_cents,
                   max(p_size) AS max_size
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, p_type
        """,
        "supplier_nation_rank": """
            WITH per_sup AS (
              SELECT n_name, s_suppkey, s_name,
                     sum(round(l_extendedprice * (1 - l_discount) * 100, 0)::bigint)
                       AS revenue_cents
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              GROUP BY n_name, s_suppkey, s_name)
            SELECT n_name, s_suppkey, s_name, revenue_cents, rank
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY n_name
                      ORDER BY revenue_cents DESC, s_suppkey ASC) AS rank
                  FROM per_sup)
            WHERE rank <= 3
        """,
        "embedding_ann_ivf": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> x::double) AS v
                       FROM embeddings),
            c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 16),
            ac AS (
              SELECT e.vec_id, e.v, c.cent_id,
                     list_dot_product(e.v, c.cv)
                       / (sqrt(list_dot_product(e.v, e.v))
                          * sqrt(list_dot_product(c.cv, c.cv))) AS cos_c
              FROM e, c),
            assigned AS (
              SELECT vec_id, v, cent_id AS cell FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                           ORDER BY cos_c DESC, cent_id ASC) AS rn FROM ac)
              WHERE rn = 1),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
            qc AS (
              SELECT q.query_id, q.qv, c.cent_id,
                     list_dot_product(q.qv, c.cv)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(c.cv, c.cv))) AS cos_c
              FROM q, c),
            probes AS (
              SELECT query_id, qv, cent_id AS cell FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                           ORDER BY cos_c DESC, cent_id ASC) AS rn FROM qc)
              WHERE rn <= 2),
            cand AS (
              SELECT p.query_id, a.vec_id,
                     list_dot_product(p.qv, a.v)
                       / (sqrt(list_dot_product(p.qv, p.qv))
                          * sqrt(list_dot_product(a.v, a.v))) AS cos
              FROM assigned a JOIN probes p ON a.cell = p.cell
              WHERE a.vec_id <> p.query_id),
            ranked AS (
              SELECT query_id, vec_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, vec_id ASC) AS rank
              FROM cand)
            SELECT query_id, vec_id, rank, round(cos, 4) AS cos_r
            FROM ranked WHERE rank <= 3
        """,
        # media oracles recompute the synthetic metadata arithmetically from
        # media_id (htmlparser_spark/multimodal.py formulas) — matching values
        # prove the Spark side decoded the actual bytes correctly
        "media_decode": """
            WITH ids AS (SELECT unnest(generate_series(0, 399)) AS media_id),
            img AS (
              SELECT media_id, 16 + (media_id * 7919) % 240 AS w,
                     16 + (media_id * 104729) % 240 AS h,
                     1 + media_id % 3 AS c
              FROM ids WHERE media_id % 2 = 0),
            aud AS (
              SELECT media_id, 8000 + (media_id % 5) * 4000 AS sr,
                     1000 + (media_id * 31) % 9000 AS ns
              FROM ids WHERE media_id % 2 = 1)
            SELECT media_id, 'image' AS kind, w::int AS width, h::int AS height,
                   c::int AS channels, NULL::int AS sample_rate,
                   NULL::int AS n_samples,
                   least(w * h * c, 4096)::int AS payload_len
            FROM img
            UNION ALL
            SELECT media_id, 'audio', NULL, NULL, NULL, sr::int, ns::int,
                   least(ns * 2, 4096)::int
            FROM aud
        """,
        "media_image_resize": """
            WITH ids AS (SELECT unnest(generate_series(0, 399)) AS media_id),
            img AS (
              SELECT media_id, 16 + (media_id * 7919) % 240 AS w,
                     16 + (media_id * 104729) % 240 AS h,
                     1 + media_id % 3 AS c
              FROM ids WHERE media_id % 2 = 0),
            calc AS (
              SELECT media_id, w // 2 AS w2, h // 2 AS h2, c,
                     least(w * h * c, 4096) AS plen
              FROM img)
            SELECT media_id, w2::int AS out_w, h2::int AS out_h,
                   c::int AS channels,
                   least((plen + 3) // 4, w2 * h2 * c)::int AS out_len
            FROM calc
        """,
        "media_audio_frames": """
            WITH ids AS (SELECT unnest(generate_series(0, 399)) AS media_id),
            a AS (
              SELECT media_id, 1000 + (media_id * 31) % 9000 AS ns,
                     least((1000 + (media_id * 31) % 9000) * 2, 4096) AS plen
              FROM ids WHERE media_id % 2 = 1),
            fr AS (
              SELECT media_id, ns, plen,
                     unnest(generate_series(0, (ns - 1) // 1000)) AS frame_idx
              FROM a)
            SELECT media_id, frame_idx::int AS frame_idx,
                   greatest(0, least(plen - frame_idx * 2000,
                                     least(256, ns - frame_idx * 1000) * 2))::int
                     AS frame_bytes
            FROM fr
        """,
    }
