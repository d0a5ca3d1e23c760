"""Public per-document API: parse_html.

Mirrors the reference entry point (Program.cs:3-6: read file → parse →
serialize) but never crashes: inputs on which the C# program would throw or
hang yield a deterministic ``status`` code with the partial DOM serialized up
to the failure point (SURVEY.md §2.5.1).
"""
from __future__ import annotations

from .extract import extract_main_content
from .parser import Parser, serialize
from .tokenizer import KernelError, to_code_units, to_wellformed

OK = "ok"

# error codes produced by the determinizing step/emit budgets — see
# tokenizer.py (_unit_budget/_step_budget) and parser.py (reprocess guard).
#
# Invariant behind the one-directional fast→slow fallback below: on any
# document the per-char machine COMPLETES, it spends < 64 steps per input
# unit + 4096 (every state consumes or reconsumes; a reconsume chain between
# two consumes is bounded by the state-graph diameter, far below 64), so
# slow mode cannot budget-trip on a document fast mode finishes. The
# fast/slow differential (tests/test_differential.py: ~1.3k cases per suite
# run at the default seeds, scalable via SPARK_GRAFT_DIFF_SEEDS; 1.05M grammar cases
# + 117k byte-mutation cases were held clean in the latest sweeps) pins this empirically: a
# slow-mode-only budget trip would show up as a status mismatch.
_BUDGET_CODES = frozenset({"err:tokenizer-loop", "err:reprocess-limit"})


def decode_input(html) -> str:
    """bytes → str the way C# File.ReadAllText does: UTF-8 with replacement
    on invalid bytes, leading BOM stripped (Program.cs:3). A null cell (real
    at corpus scale) must not kill the batch — callers map it to an
    err:null-input row via parse_html."""
    if html is None:
        raise KernelError("err:null-input")
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", "replace")
    else:
        s = html
    if s.startswith("﻿"):
        s = s[1:]
    return to_code_units(s)


def parse_html(html, fast: bool = True, extract: bool = True,
               want_dom: bool = True, want_nodes: bool = False,
               want_links: bool = False, page_url: str = "") -> dict:
    """Tokenize + tree-construct + serialize + extract one document.

    Returns a dict with:
      status    "ok" or the deterministic err:* code
      dom_s     debug serialization (DOM/Node.cs:537-555 format), partial on error
      text      whole-document child_text_content (D6)
      title     child_text_content of the first title element ("" if none)
      main_text X3 main-content text ("" when extract=False)
      spans     list[(node_id, start, end)] into main_text
      errors    {error_code: count} incl. tokenizer codes + "parse error"
      n_nodes / n_elements
      nodes     optional arena rows for the exploded nodes table
      links/base_href/canonical/robots_*/meta_description
                optional web-graph outputs (want_links; kernel/links.py) —
                resolved against page_url, extracted from the same DOM so
                one parse serves both the extraction and link sinks
    """
    try:
        units = decode_input(html)
    except KernelError as e:
        out = {"status": e.code, "dom_s": "", "text": "", "title": "",
               "main_text": "", "spans": [], "errors": {}, "n_nodes": 0,
               "n_elements": 0, "nodes": [] if want_nodes else None}
        if want_links:
            from .links import _EMPTY_META
            out.update(_EMPTY_META, links=[])
        return out
    parser = Parser(units, fast=fast)
    status = OK
    try:
        parser.run()
    except KernelError as e:
        status = e.code
        if fast and status in _BUDGET_CODES:
            # Budget-determinized outcomes (the C# would loop forever; we
            # trip a step budget) are step-count-sensitive, and the fast
            # paths compress many machine steps into one — so the counter
            # snapshot at trip time differs between modes. Re-run the rare
            # pathological document per-char so fast mode is bit-identical
            # to the oracle everywhere, including these rows.
            return parse_html(html, fast=False, extract=extract,
                              want_dom=want_dom, want_nodes=want_nodes,
                              want_links=want_links, page_url=page_url)
    except RecursionError:
        status = "err:recursion-limit"

    doc = parser.document
    dom_s = to_wellformed(serialize(doc)) if want_dom else ""
    text = None
    title = ""
    main_text = ""
    spans = []
    nodes_rows = None
    n_nodes = 0
    n_elements = 0
    try:
        if extract or want_nodes:
            main_raw, spans, arena, nodes = extract_main_content(doc)
            # document text from the arena: preorder Text data in document
            # order is exactly child_text_content of the document (D6) —
            # avoids a second full tree walk
            a_kind = arena.kind
            a_data = arena.text_data
            text = to_wellformed("".join(
                [a_data[i] for i in range(arena.n) if a_kind[i] == "Text"]))
            main_text = to_wellformed(main_raw)
            n_nodes = arena.n
            for nid in range(arena.n):
                if arena.kind[nid] == "HTMLTitleElement":
                    title = to_wellformed(nodes[nid].child_text_content())
                    break
            n_elements = sum(1 for k in arena.kind if k.startswith("HTML"))
            if want_nodes:
                nodes_rows = [
                    (nid, arena.parent[nid], arena.kind[nid], arena.tag[nid],
                     arena.depth[nid], arena.direct_text_len[nid],
                     arena.text_len[nid], arena.link_text_len[nid],
                     arena.n_desc_tags[nid], bool(arena.is_anchor_desc[nid]))
                    for nid in range(arena.n)
                ]
        else:
            n_nodes = _count_nodes(doc)
    except RecursionError:
        if status == OK:
            status = "err:recursion-limit"
    if text is None:
        text = to_wellformed(doc.child_text_content())

    link_out = {}
    if want_links:
        from .links import _EMPTY_META, extract_links
        try:
            links, meta = extract_links(doc, page_url)
        except RecursionError:
            if status == OK:
                status = "err:recursion-limit"
            links, meta = [], dict(_EMPTY_META)
        link_out = {"links": links, **meta}

    return {
        **link_out,
        "status": status,
        "dom_s": dom_s,
        "text": text,
        "title": title,
        "main_text": main_text,
        "spans": spans,
        "errors": dict(parser.errors),
        "n_nodes": n_nodes,
        "n_elements": n_elements,
        "nodes": nodes_rows,
    }


def _count_nodes(doc) -> int:
    n = 0
    stack = [doc]
    while stack:
        node = stack.pop()
        n += 1
        stack.extend(node.children)
    return n


def tokenize(html, fast: bool = True):
    """Entry point 2 (Program.cs:8-26, commented harness): token stream +
    error counts, for fixture tests and the optional tokens debug table."""
    from .tokenizer import Tokenizer, EOF_TOKEN
    errors: dict = {}
    try:
        units = decode_input(html)
    except KernelError as e:
        return [("error", e.code)], errors

    def on_error(code):
        errors[code] = errors.get(code, 0) + 1

    tk = Tokenizer(units, on_error=on_error, fast=fast)
    tokens = []
    try:
        while True:
            tok = tk.next_token()
            if tok is None:
                tokens.append(("null",))
                break
            if tok.t == EOF_TOKEN:
                tokens.append(("eof",))
                break
            tokens.append(_token_tuple(tok))
            # mirror the commented harness's manual script-state switch
            if tok.t == 1 and tok.tag.name == "script":
                tk.switch_to_script_data_state()
    except KernelError as e:
        if fast and e.code in _BUDGET_CODES:
            return tokenize(html, fast=False)  # see parse_html
        tokens.append(("error", e.code))
    return tokens, errors


def _token_tuple(tok):
    from .tokenizer import CHARS, COMMENT, DOCTYPE, END_TAG, START_TAG
    if tok.t == CHARS:
        return ("chars", tok.data)
    if tok.t == START_TAG:
        return ("start", tok.tag.name, tok.tag.self_closing,
                tok.tag.finished_attributes() or [])
    if tok.t == END_TAG:
        return ("end", tok.tag.name, tok.tag.self_closing,
                tok.tag.finished_attributes() or [])
    if tok.t == COMMENT:
        return ("comment", tok.data)
    if tok.t == DOCTYPE:
        d = tok.doctype
        return ("doctype", d.name, d.public_identifier, d.system_identifier,
                d.force_quirks)
    return ("?",)
