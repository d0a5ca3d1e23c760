"""S5: the parse/extract kernel as a vectorized Arrow stage.

``df.mapInPandas(parse_batch, PARSED_SCHEMA)`` — the only Python that runs on
executors. Batches cross the JVM↔Python boundary as Arrow record batches
(never per-row); inside a batch the kernel loops documents (SURVEY.md §4.3).
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd

from ..kernel.api import parse_html
from .schema import NODES_SCHEMA, PARSED_SCHEMA

_COLS = [f.name for f in PARSED_SCHEMA.fields]


def parse_batch(batches: Iterator[pd.DataFrame], extract: bool = True
                ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n = len(pdf)
        if n == 0:
            continue
        urls = pdf["url"].tolist()
        htmls = pdf["html"].tolist()
        out = {c: [] for c in _COLS}
        out["url"] = urls
        out["warc_ts"] = pdf["warc_ts"].tolist()
        out["lang"] = (pdf["lang"].tolist() if "lang" in pdf.columns
                       else [""] * n)
        out["part_key"] = (pdf["part_key"].tolist() if "part_key" in pdf.columns
                           else [0] * n)
        for html in htmls:
            r = parse_html(html, fast=True, extract=extract, want_dom=False)
            out["status"].append(r["status"])
            out["title"].append(r["title"])
            out["text"].append(r["text"])
            out["main_text"].append(r["main_text"])
            out["spans"].append(
                [{"node_id": a, "start": b, "end": c} for a, b, c in r["spans"]])
            errors = {k: int(v) for k, v in r["errors"].items()}
            out["errors"].append(errors)
            out["n_errors"].append(sum(errors.values()))
            out["n_nodes"].append(r["n_nodes"])
            out["n_elements"].append(r["n_elements"])
            out["html_bytes"].append(len(html) if html is not None else 0)
        yield pd.DataFrame(out, columns=_COLS)


def parse_batch_with_dom(batches: Iterator[pd.DataFrame]
                         ) -> Iterator[pd.DataFrame]:
    """Variant that also returns dom_s (golden-diff validation, S11)."""
    for pdf in batches:
        rows = []
        for url, html in zip(pdf["url"].tolist(), pdf["html"].tolist()):
            r = parse_html(html, fast=True, extract=True, want_dom=True)
            rows.append((url, r["status"], r["dom_s"], r["text"],
                         r["main_text"]))
        yield pd.DataFrame(
            rows, columns=["url", "status", "dom_s", "text", "main_text"])


_NODE_COLS = [f.name for f in NODES_SCHEMA.fields]


def nodes_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """S7-style exploded arena DOM: one row per DOM node (FIXTURES.md §4)."""
    for pdf in batches:
        rows = []
        ts_list = (pdf["warc_ts"].tolist() if "warc_ts" in pdf.columns
                   else [None] * len(pdf))
        for url, ts, html in zip(pdf["url"].tolist(), ts_list,
                                 pdf["html"].tolist()):
            r = parse_html(html, fast=True, extract=False, want_dom=False,
                           want_nodes=True)
            if r["nodes"] is None:
                continue
            for (nid, parent, kind, tag, depth, direct_len, text_len,
                 link_len, n_desc, anchor) in r["nodes"]:
                # (url, warc_ts) is the page key — a url can have several
                # snapshots in the corpus
                rows.append((url, ts, nid, parent, kind, tag, depth,
                             direct_len, text_len, link_len, n_desc, anchor))
        yield pd.DataFrame(rows, columns=_NODE_COLS)
