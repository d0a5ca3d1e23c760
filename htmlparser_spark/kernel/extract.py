"""X1-X3 extraction operators over the parsed DOM (SURVEY.md §2.4).

The reference contains no extraction heuristics; these are our deterministic
extension, pinned by fixtures (tests/test_extract.py). The parse-time object
DOM is flattened to an arena of parallel arrays (preorder node ids) — the
north-star layout — and all stats/selection run as array passes.

Definitions (frozen):
  X1 per-node stats: text_len (sum of Text data lengths in the subtree),
     link_text_len (text under any `a` descendant-or-self), n_desc_tags
     (element descendants), depth.
  X2 scoring: text_density = text_len / (1 + n_desc_tags);
     link_density = link_text_len / max(text_len, 1);
     prior = -1 if tag in NEGATIVE_TAGS or any class/id attribute value
     contains a NEGATIVE_HINT substring (lowercased), else 0.
     Candidate iff text_density >= TAU1 and link_density <= TAU2 and
     prior >= 0, restricted to elements inside the first body subtree
     (including body itself; head content never qualifies).
  X3 emission: selected = candidates with no candidate proper ancestor;
     main_text = document-order concat of Text data under selected subtrees;
     spans = (node_id, start, end) offsets into main_text per selected node.
"""
from __future__ import annotations

TAU1 = 2.0
TAU2 = 0.33
NEGATIVE_TAGS = frozenset({"nav", "aside", "footer", "header", "form"})
NEGATIVE_HINTS = ("nav", "menu", "footer", "sidebar", "comment", "ad")


class Arena:
    """Flat preorder DOM: parallel lists indexed by node_id."""

    __slots__ = ("kind", "tag", "parent", "depth", "direct_text_len",
                 "text_len", "link_text_len", "n_desc_tags", "is_anchor_desc",
                 "text_data", "n")

    def __init__(self):
        self.kind = []
        self.tag = []
        self.parent = []
        self.depth = []
        self.direct_text_len = []
        self.text_len = []
        self.link_text_len = []
        self.n_desc_tags = []
        self.is_anchor_desc = []
        self.text_data = []  # data for Text nodes, "" otherwise
        self.n = 0


def flatten(document) -> tuple[Arena, list]:
    """Preorder flatten; returns (arena, node_objects_in_preorder)."""
    a = Arena()
    nodes = []
    stack = [(document, -1, 0, False)]
    # bound-method locals: this loop runs once per DOM node and the attribute
    # lookups dominate it
    nodes_a = nodes.append
    kind_a = a.kind.append
    tag_a = a.tag.append
    parent_a = a.parent.append
    depth_a = a.depth.append
    dlen_a = a.direct_text_len.append
    tdata_a = a.text_data.append
    anchor_a = a.is_anchor_desc.append
    tlen_a = a.text_len.append
    llen_a = a.link_text_len.append
    ndesc_a = a.n_desc_tags.append
    push = stack.append
    pop = stack.pop
    n = 0
    while stack:
        node, parent_id, depth, anchor = pop()
        nid = n
        n += 1
        nodes_a(node)
        kind = node.kind
        data = node.data if kind == "Text" else ""
        kind_a(kind)
        tag_a(node.tag_name)
        parent_a(parent_id)
        depth_a(depth)
        dlen_a(len(data))
        tdata_a(data)
        anchor_a(anchor)
        tlen_a(0)
        llen_a(0)
        ndesc_a(0)
        children = node.children
        if children:
            child_anchor = anchor or node.tag_name == "a"
            cdepth = depth + 1
            for child in reversed(children):
                push((child, nid, cdepth, child_anchor))
    a.n = n
    # bottom-up accumulation (children have larger ids than parents is NOT
    # guaranteed by this stack order — it is: preorder with parent before
    # child, so iterate ids descending and add into parent)
    parent = a.parent
    dlen = a.direct_text_len
    tlen = a.text_len
    llen = a.link_text_len
    ndesc = a.n_desc_tags
    anchor = a.is_anchor_desc
    kinds = a.kind
    for nid in range(n - 1, 0, -1):
        p = parent[nid]
        own_text = dlen[nid]
        t = tlen[nid] + own_text
        tlen[nid] = t
        tlen[p] += t
        lt = llen[nid] + (own_text if anchor[nid] else 0)
        llen[nid] = lt
        llen[p] += lt
        # kinds are Document/Text/DocumentType/HTML* — only elements start
        # with "H"
        ndesc[p] += ndesc[nid] + (1 if kinds[nid][0] == "H" else 0)
    if n:
        tlen[0] += dlen[0]
    return a, nodes


def _node_prior(node) -> int:
    if node.tag_name in NEGATIVE_TAGS:
        return -1
    if node.attributes:
        for name, value in node.attributes:
            if name in ("class", "id"):
                v = value.lower()
                for hint in NEGATIVE_HINTS:
                    if hint in v:
                        return -1
    return 0


def extract_main_content(document):
    """Returns (main_text, spans, arena, nodes).

    spans: list of (node_id, start, end) into main_text.
    """
    arena, nodes = flatten(document)
    # locate the first body subtree (document order)
    body_id = None
    for nid in range(arena.n):
        if arena.tag[nid] == "body" and arena.kind[nid] == "HTMLBodyElement":
            body_id = nid
            break
    if body_id is None:
        return "", [], arena, nodes

    # preorder flatten gives every subtree a contiguous id range, so
    # "inside the first body subtree" is the range [body_id, body_end) —
    # an O(1) test instead of an O(depth) parent-chain walk per node (the
    # quirk-preserving tree never pops block elements, so depth grows with
    # element count and chain walks are quadratic on clean pages)
    depth = arena.depth
    d_body = depth[body_id]
    body_end = body_id + 1
    a_n = arena.n
    while body_end < a_n and depth[body_end] > d_body:
        body_end += 1

    kind = arena.kind
    text_len = arena.text_len
    link_len = arena.link_text_len
    n_desc = arena.n_desc_tags
    qualifying = [False] * a_n
    for nid in range(body_id, body_end):
        if not kind[nid].startswith("HTML"):
            continue
        tl = text_len[nid]
        density = tl / (1 + n_desc[nid])
        link_density = link_len[nid] / max(tl, 1)
        if density >= TAU1 and link_density <= TAU2 and _node_prior(nodes[nid]) >= 0:
            qualifying[nid] = True
    # maximal: drop nodes with a qualifying proper ancestor. Parents precede
    # children in preorder, so one ascending pass propagates
    # "has-qualifying-ancestor" in O(n) instead of O(n·depth).
    parent = arena.parent
    anc_qual = [False] * a_n
    selected = []
    for nid in range(body_id, body_end):
        p = parent[nid]
        if p >= 0 and (qualifying[p] or anc_qual[p]):
            anc_qual[nid] = True
        elif qualifying[nid]:
            selected.append(nid)

    parts = []
    spans = []
    offset = 0
    for nid in selected:
        start = offset
        sub = _subtree_text(arena, nid)
        offset += len(sub)
        parts.append(sub)
        spans.append((nid, start, offset))
    return "".join(parts), spans, arena, nodes


def _subtree_text(arena, root):
    """Document-order Text concat under root (preorder ids are contiguous
    per subtree? — NOT guaranteed by list layout, so walk by parent links)."""
    # Preorder flatten gives each subtree a contiguous id range [root, end):
    # the next id with depth <= depth[root] after root ends the subtree.
    out = []
    d = arena.depth[root]
    nid = root + 1
    while nid < arena.n and arena.depth[nid] > d:
        if arena.kind[nid] == "Text":
            out.append(arena.text_data[nid])
        nid += 1
    if arena.kind[root] == "Text":
        out.append(arena.text_data[root])
    return "".join(out)
