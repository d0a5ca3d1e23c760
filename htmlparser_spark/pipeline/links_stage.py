"""Web-graph kernel stage: outlinks + page metadata as Arrow batches.

Same execution contract as kernel_stage.parse_batch (S5): mapInPandas over
Arrow record batches, Python loops only inside a batch, output schemas from
pipeline.schema. One parse serves one output table per stage; a consumer
that needs both joins on the (url, warc_ts) page key rather than paying a
wider Arrow transfer on every query.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd

from ..kernel.links import parse_page_graph
from .schema import LINKS_SCHEMA, PAGE_META_SCHEMA

_LINK_COLS = [f.name for f in LINKS_SCHEMA.fields]
_META_COLS = [f.name for f in PAGE_META_SCHEMA.fields]


def links_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One row per extracted <a href> outlink (LINKS_SCHEMA)."""
    for pdf in batches:
        rows = []
        ts_list = (pdf["warc_ts"].tolist() if "warc_ts" in pdf.columns
                   else [None] * len(pdf))
        for url, ts, html in zip(pdf["url"].tolist(), ts_list,
                                 pdf["html"].tolist()):
            r = parse_page_graph(html, url)
            for seq, href, href_abs, dst_host, anchor, nofollow in r["links"]:
                rows.append((url, ts, seq, href, href_abs, dst_host,
                             anchor, nofollow))
        yield pd.DataFrame(rows, columns=_LINK_COLS)


def page_meta_batch(batches: Iterator[pd.DataFrame]
                    ) -> Iterator[pd.DataFrame]:
    """One row per page with its indexing metadata (PAGE_META_SCHEMA)."""
    for pdf in batches:
        rows = []
        n = len(pdf)
        ts_list = (pdf["warc_ts"].tolist() if "warc_ts" in pdf.columns
                   else [None] * n)
        # lang rides through from the pages row (like parse_batch's
        # passthrough columns) so meta consumers never re-join the corpus
        lang_list = (pdf["lang"].tolist() if "lang" in pdf.columns
                     else [""] * n)
        for url, ts, lang, html in zip(pdf["url"].tolist(), ts_list,
                                       lang_list, pdf["html"].tolist()):
            r = parse_page_graph(html, url)
            rows.append((url, ts, lang, r["status"], r["base_href"],
                         r["canonical"], r["robots_noindex"],
                         r["robots_nofollow"], r["meta_description"],
                         len(r["links"])))
        yield pd.DataFrame(rows, columns=_META_COLS)
