"""Line-faithful transliteration of the reference tree-construction stage.

Reference: HTMLParser.cs (insertion modes P0-P13), DOM/Node.cs, DOM/DOM.cs,
DOM/Document.cs, DOM/Element.cs, DOM/Text.cs (mutation ops D1-D6). Quirks
Q8-Q15 from SURVEY.md §2.5 are preserved; inputs on which the C# program
throws or hangs raise KernelError with a deterministic code (§2.5.1).

Character tokens may arrive as multi-char runs (fast tokenizer mode); each
mode handler splits runs so the result is identical to per-char processing
(see _chars_* methods; differential-tested in tests/test_differential.py).
"""
from __future__ import annotations

from .tokenizer import (
    CHARS, COMMENT, DOCTYPE, END_TAG, EOF_TOKEN, NUL, SPACE5, START_TAG,
    KernelError, Tag, Token, Tokenizer, to_code_units,
)

# insertion modes (HTMLParser.cs:44-68)
(
    M_INITIAL, M_BEFORE_HTML, M_BEFORE_HEAD, M_IN_HEAD, M_IN_HEAD_NOSCRIPT,
    M_AFTER_HEAD, M_IN_BODY, M_TEXT, M_IN_TABLE, M_IN_TABLE_TEXT, M_IN_CAPTION,
    M_IN_COLUMN_GROUP, M_IN_TABLE_BODY, M_IN_ROW, M_IN_CELL, M_IN_SELECT,
    M_IN_SELECT_IN_TABLE, M_IN_TEMPLATE, M_AFTER_BODY, M_IN_FRAMESET,
    M_AFTER_FRAMESET, M_AFTER_AFTER_BODY, M_AFTER_AFTER_FRAMESET,
) = range(23)

_NOT_IMPLEMENTED_MODES = {
    M_IN_HEAD_NOSCRIPT: "in-head-noscript", M_IN_TABLE: "in-table",
    M_IN_TABLE_TEXT: "in-table-text", M_IN_CAPTION: "in-caption",
    M_IN_COLUMN_GROUP: "in-column-group", M_IN_TABLE_BODY: "in-table-body",
    M_IN_ROW: "in-row", M_IN_CELL: "in-cell", M_IN_SELECT: "in-select",
    M_IN_SELECT_IN_TABLE: "in-select-in-table", M_IN_TEMPLATE: "in-template",
    M_IN_FRAMESET: "in-frameset", M_AFTER_FRAMESET: "after-frameset",
    M_AFTER_AFTER_BODY: "after-after-body",
    M_AFTER_AFTER_FRAMESET: "after-after-frameset",
}


# --- DOM (DOM/Node.cs, DOM/Document.cs, DOM/Element.cs, DOM/Text.cs) -------

class Node:
    """kind == the C# class name used by the debug serializer
    (DOM/Node.cs:531-543, GetType().ToString())."""

    __slots__ = ("kind", "tag_name", "children", "parent", "attributes",
                 "_chunks")

    def __init__(self, kind, tag_name=""):
        self.kind = kind
        self.tag_name = tag_name
        self.children = []
        self.parent = None
        self.attributes = None  # list[(name, value)] — ordered, dups kept (Q17)
        self._chunks = None  # Text data chunks

    # Text data (DOM/DOM.cs:29-60, lazily joined)
    @property
    def data(self):
        return "".join(self._chunks)

    def append_data(self, s):  # DOM/DOM.cs:58-60
        self._chunks.append(s)

    # --- D4: CharacterData edits (DOM/DOM.cs:42-107), code-unit offsets ----
    def substring_data(self, offset, count):  # :43-56
        data = self.data
        if offset > len(data):
            raise KernelError("err:dom:index-size")  # IndexSizeError
        return data[offset:] if offset + count > len(data) \
            else data[offset:offset + count]

    def insert_data(self, offset, s):  # :63-66
        self.replace_data(offset, 0, s)

    def delete_data(self, offset, count):  # :68-71
        self.replace_data(offset, count, "")

    def replace_data(self, offset, count, s):  # :73-107
        data = self.data
        if offset > len(data):
            raise KernelError("err:dom:index-size")
        if offset + count > len(data):
            count = len(data) - offset
        data = data[:offset] + s + data[offset:]  # insert at offset (:88)
        delete_offset = offset + len(s)  # :90
        data = data[:delete_offset] + data[delete_offset + count:]  # :92
        self._chunks = [data]

    def is_element(self):
        return self.attributes is not None or self.kind.startswith("HTML")

    # https://dom.spec.whatwg.org/#concept-node-append as transliterated in
    # DOM/Node.cs:127-131 → pre_insert → ensure validity → insert
    def append_child(self, node):
        ensure_pre_insert_validity(node, self)
        # append_ordered_set (DOM/Node.cs:391-395): identity dedup
        if any(c is node for c in self.children):
            return node
        self.children.append(node)
        node.parent = self
        return node

    def last_child(self):  # DOM/Node.cs:48-53
        return self.children[-1] if self.children else None

    # --- D4: remove / replace / sibling nav (DOM/Node.cs:134-313) ----------
    # NOTE on fidelity: the C# never assigns `_parent` (DOM/Node.cs:34 is the
    # only mention besides the getter), so `parent_node` is ALWAYS null there
    # and remove_child/replace_child as written can only throw NotFoundError.
    # These methods are dead code in the reference (nothing on the parse path
    # calls them). Our Node maintains parent pointers (required by
    # extraction), so we implement the DOM-spec behavior the reference
    # transcribed, with its remaining transcription bugs preserved.
    @property
    def index(self):  # Node.cs index-derived sibling accessors :54-68
        return self.parent.children.index(self) if self.parent else -1

    @property
    def previous_sibling(self):  # :54-60
        if self.parent is None:
            return None
        i = self.index - 1
        return self.parent.children[i] if i >= 0 else None

    @property
    def next_sibling(self):  # :62-68
        if self.parent is None:
            return None
        i = self.index + 1
        return self.parent.children[i] if i < len(self.parent.children) else None

    def remove_child(self, child):  # :138-141 → pre_remove :236-245
        if child.parent is not self:
            raise KernelError("err:dom:not-found")  # NotFoundError
        _remove_node(child)
        return child

    def replace_child(self, node, child):  # :133-136 → repalce_child :144-222
        parent = self
        if parent.kind not in ("Document", "DocumentFragment") \
                and not parent.is_element():
            raise KernelError("err:dom:hierarchy-request")
        if child.parent is not parent:
            raise KernelError("err:dom:not-found")
        if node.kind not in ("DocumentFragment", "DocumentType") \
                and not node.is_element() \
                and node.kind not in ("Text", "Comment"):
            raise KernelError("err:dom:hierarchy-request")
        if (node.kind == "Text" and parent.kind == "Document") or \
                (node.kind == "DocumentType" and parent.kind != "Document"):
            raise KernelError("err:dom:hierarchy-request")
        if parent.kind == "Document":
            if node.kind == "DocumentFragment":
                # transcription bug kept (:171): `Count >= 1` (spec: > 1) and
                # has_text_node_child checked on CHILD (spec: node) — any
                # non-empty fragment throws; the elif (:173-177) is dead
                if len(node.children) >= 1 or any(
                        c.kind == "Text" for c in child.children):
                    raise KernelError("err:dom:hierarchy-request")
            elif node.is_element():  # :178-181
                el = next((c for c in parent.children if c.is_element()), None)
                if (el is not None and el is not child) or \
                        (_following_node(child) is not None
                         and _following_node(child).kind == "DocumentType"):
                    raise KernelError("err:dom:hierarchy-request")
            elif node.kind == "DocumentType":  # :182-185
                dt = next((c for c in parent.children
                           if c.kind == "DocumentType"), None)
                if (dt is not None and dt is not child) or \
                        (_preceding_node(child) is not None
                         and _preceding_node(child).is_element()):
                    raise KernelError("err:dom:hierarchy-request")
        reference_child = child.next_sibling  # :190
        if reference_child is node:  # :193-195
            reference_child = node.next_sibling
        if child.parent is not None:  # :205-212
            _remove_node(child)
        _insert_before(node, parent, reference_child)  # :217
        return child

    def child_text_content(self):  # D6, DOM/Node.cs:74-84
        out = []
        _collect_text(self, out)
        return "".join(out)


def _collect_text(node, out):
    stack = [iter(node.children)]
    while stack:
        try:
            child = next(stack[-1])
        except StopIteration:
            stack.pop()
            continue
        if child.kind == "Text":
            out.append(child.data)
        else:
            stack.append(iter(child.children))


def _remove_node(node):  # remove_node, DOM/Node.cs:247-313
    parent = node.parent
    parent.children.remove(node)
    node.parent = None


def _following_node(node):  # find_following_node, DOM/Node.cs:465-481
    if node.children:
        return node.children[0]
    current = node
    while current is not None:
        ns = current.next_sibling
        if ns is not None:
            return ns
        current = current.parent
    return None


def _preceding_node(node):  # find_preceding_node, DOM/Node.cs:226-230
    ps = node.previous_sibling
    if ps is not None:
        return ps
    return node.parent


def _insert_before(node, parent, child):
    """insert_node_into_parent_before_child, DOM/Node.cs:332-390.
    DocumentFragment insertion throws NotImplementedException (:344-347);
    adopt removes node from its old parent first (:406-409)."""
    if node.kind == "DocumentFragment":
        raise KernelError("err:not-implemented:fragment-insert")
    if node.parent is not None:  # adopt_node_into_document :403-409
        _remove_node(node)
    if child is None:
        # append_ordered_set identity dedup (:393-397)
        if not any(c is node for c in parent.children):
            parent.children.append(node)
    else:
        parent.children.insert(child.index, node)
    node.parent = parent


def ensure_pre_insert_validity(node, parent):
    """DOM/Node.cs:427-463 — transcription bug kept: step 5 checks NODE's
    parent instead of the parent argument, so appending a DocumentType node
    (fresh, parent None → 'is not Document') ALWAYS throws
    HierarchyRequestError; Text-into-Document never does."""
    if parent.kind not in ("Document", "DocumentFragment") and not parent.is_element():
        raise KernelError("err:dom:hierarchy-request")
    if node.kind == "Text" and node.parent is not None and node.parent.kind == "Document":
        raise KernelError("err:dom:hierarchy-request")
    if node.kind == "DocumentType" and (node.parent is None or node.parent.kind != "Document"):
        raise KernelError("err:dom:hierarchy-request")


def new_text(data):
    t = Node("Text")
    t._chunks = [data]
    return t


_TYPED_ELEMENTS = {  # Document.cs:59-71 factory
    "html": "HTMLHtmlElement",
    "head": "HTMLHeadElement",
    "script": "HTMLScriptElement",
    "body": "HTMLBodyElement",
    "title": "HTMLTitleElement",
}


def create_an_element(local_name):  # Document.cs:29-76
    kind = _TYPED_ELEMENTS.get(local_name, "HTMLElement")
    el = Node(kind, tag_name=local_name)
    el.attributes = []
    return el


# --- serializer (D5, DOM/Node.cs:537-555) -----------------------------------

def serialize(node):
    out = []
    stack = [(node, 0)]
    while stack:
        n, indent = stack.pop()
        out.append("  " * indent)
        if n.kind == "Text":
            d = (n.data.replace(" ", "\\s").replace("\n", "\\n")
                 .replace("\t", "\\t").replace("\r", "\\r"))
            out.append(f"[Text: {d}]\n")
        else:
            out.append(f"[{n.kind}]\n")
        for child in reversed(n.children):
            stack.append((child, indent + 1))
    return "".join(out)


# --- the parser (HTMLParser.cs) ---------------------------------------------

_BODY_OK_TAGS = ("dd", "dt", "li", "optgroup", "option", "p", "rb", "rp",
                 "rt", "rtc", "tbody", "td", "tfoot", "th", "thead", "tr",
                 "body", "html")  # HTMLParser.cs:684,702
_BLOCK_START_TAGS = ("address", "article", "aside", "blockquote", "center",
                     "details", "dialog", "dir", "div", "dl", "fieldset",
                     "figcaption", "figure", "footer", "header", "hgroup",
                     "main", "menu", "nav", "ol", "p", "search", "section",
                     "summary", "ul")  # :716
_BLOCK_END_TAGS = ("address", "article", "aside", "blockquote", "button",
                   "center", "details", "dialog", "dir", "div", "dl",
                   "fieldset", "figcaption", "figure", "footer", "header",
                   "hgroup", "listing", "main", "menu", "nav", "ol", "pre",
                   "search", "section", "summary", "ul")  # :804
_IMPLIED_END_TAGS = ("dd", "dt", "li", "optgroup", "option", "rb", "rp",
                     "rt", "rtc", "p")  # :894
_HEAD_RESIDENT_TAGS = ("base", "basefont", "bgsound", "link", "meta",
                       "noframes", "script", "style", "template", "title")  # :573,646

# frozenset views for O(1) membership in the hot in-body dispatch
_HEAD_RESIDENT_SET = frozenset(_HEAD_RESIDENT_TAGS)
_BLOCK_START_SET = frozenset(_BLOCK_START_TAGS)
_BLOCK_END_SET = frozenset(_BLOCK_END_TAGS)
_HEADING_SET = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))
# Every start-tag name with a dedicated in-body branch; anything else goes
# straight to the any-other-start-tag path with ONE set probe instead of
# walking the whole branch chain (the chain order for these names is
# unchanged below)
_IN_BODY_SPECIAL_START = (frozenset(("html", "body", "frameset", "pre",
                                     "listing", "form", "li", "dd", "dt",
                                     "plaintext", "button"))
                          | _HEAD_RESIDENT_SET | _BLOCK_START_SET
                          | _HEADING_SET)


class Parser:
    """HTMLParser.cs:1-1194."""

    def __init__(self, units: str, errors=None, fast: bool = True):
        self.errors = errors if errors is not None else {}
        self.tokenizer = Tokenizer(units, on_error=self._count_error, fast=fast)
        self.document = Node("Document")
        self.open_elements = []  # Stack<Element>: append=Push, [-1]=Peek
        self.mode = M_INITIAL
        self.original_mode = M_INITIAL
        self.head_element = None
        self.form_element = None
        self.frameset_ok = False  # HTMLParser.cs:19
        self.quirks_mode = "no-quirks"
        self._reprocess = False
        self._token = None

    def _count_error(self, code):
        self.errors[code] = self.errors.get(code, 0) + 1

    def on_error(self, _msg="parse error"):  # HTMLParser.cs:13-17 — every
        # parser-stage error prints the literal string "parse error"
        self._count_error("parse error")

    # --- stack ops (HTMLParser.cs:38-41) ------------------------------------
    def current_node(self):
        if not self.open_elements:
            raise KernelError("err:empty-stack")  # Stack.Peek on empty
        return self.open_elements[-1]

    def pop_current_node(self):
        if not self.open_elements:
            raise KernelError("err:empty-stack")  # Stack.Pop on empty
        return self.open_elements.pop()

    # --- helpers -------------------------------------------------------------
    def find_appropriate_place(self):  # :79-119 — foster parenting flag is
        # always false (:33), so this is just the current node
        return self.current_node()

    def create_element_for_token(self, token):  # :246-281
        tag = token.tag
        if tag is None:
            # token.tag!.name on a Character/other token → NullReferenceException
            raise KernelError("err:null-ref:create-element")
        # create_an_element + finished_attributes inlined (hot path):
        # typed factory lookup, then attribute list with duplicates
        # preserved (Q17). tag.finished is the memoized finished form for
        # fast-path tags — shared across elements, never mutated (no
        # attribute-mutation exists on the parse path; Element.cs:25).
        name = tag.name
        el = Node(_TYPED_ELEMENTS.get(name, "HTMLElement"), tag_name=name)
        if tag.finished is not None:
            el.attributes = tag.finished
        else:
            attrs = tag.attributes
            el.attributes = ([(n, "".join(v)) for n, v in attrs]
                             if attrs is not None else [])
        return el

    def insert_foreign_element(self, token):  # insert_a_foreign_element, :122-135
        stack = self.open_elements
        if not stack:
            raise KernelError("err:empty-stack")  # current_node / Peek
        target = stack[-1]  # find_appropriate_place, inlined
        el = self.create_element_for_token(token)
        # append_child inlined for the FRESH-node case, observationally
        # identical: ensure_pre_insert_validity cannot throw (el.parent is
        # None and el is not a DocumentType; target is an element or
        # Document) and the ordered-set identity dedup cannot hit a node
        # that was just constructed
        target.children.append(el)
        el.parent = target
        stack.append(el)
        return el

    def insert_a_character(self, data):  # :517-533
        stack = self.open_elements
        if not stack:
            raise KernelError("err:empty-stack")  # current_node / Peek
        target = stack[-1]  # find_appropriate_place, inlined
        if target.kind == "Document":
            return
        children = target.children
        if children:
            last = children[-1]
            if last.kind == "Text":
                last._chunks.append(data)
                return
        # fresh Text node: validity cannot throw, dedup cannot hit (as above)
        t = new_text(data)
        children.append(t)
        t.parent = target

    def has_element_in_scope(self, tag_name):  # :857-859 — stub: False (Q9)
        return False

    def has_element_in_button_scope(self, tag_name):  # :861-863 — stub (Q9)
        return False

    def generate_implied_end_tags(self, except_for=None):  # :888-898 — pops
        # AT MOST one node (no loop; Q10)
        cur = self.current_node()
        if cur.tag_name == except_for:
            return
        if cur.tag_name in _IMPLIED_END_TAGS:
            self.pop_current_node()

    def pop_element_until(self, tag_name):  # :878-885 — pops the target AND
        # one extra (Q8); Peek/Pop on empty stack → err:empty-stack
        while True:
            self.pop_current_node()
            if self.current_node().tag_name != tag_name:
                break
        self.pop_current_node()

    def close_a_p_element(self):  # :866-876
        self.generate_implied_end_tags(except_for="p")
        cur = self.current_node()
        if cur.tag_name != "p":
            self.on_error()
            return
        self.pop_element_until("p")

    def reconstruct_active_formatting_elements(self):  # :906-935 — list is
        # never populated, so this is a no-op
        pass

    def parse_rcdata_or_rawtext(self, token, is_raw_text):  # :333-353
        self.insert_foreign_element(token)
        if is_raw_text:
            self.tokenizer.switch_to_raw_text_state()
        else:
            self.tokenizer.switch_to_rcdata_state()
        self.original_mode = self.mode
        self.mode = M_TEXT

    def prepare_script_element(self, el):  # :994-1029 — has_attribute is
        # always false (DOM/Element.cs:25) and is_connected false
        # (DOM/Node.cs:24), so no observable effect beyond the type check
        if el.kind != "HTMLScriptElement":
            # (HTMLScriptElement) cast on a non-script → InvalidCastException
            raise KernelError("err:invalid-cast:prepare-script")

    # --- chars-run handlers (exact splits of per-char mode behavior) ---------
    def _split_spaces(self, data):
        i = 0
        n = len(data)
        while i < n and data[i] in SPACE5:
            i += 1
        return data[:i], data[i:]

    def _chars_initial(self, data):  # :142-189
        _spaces, rest = self._split_spaces(data)  # space chars: ignored
        if rest:
            self.on_error()  # "parse error" once for the first non-space token
            self.document_mode_quirks()
            self.mode = M_BEFORE_HTML
            self._reprocess_chars(rest)

    def document_mode_quirks(self):  # :178-183
        self.quirks_mode = "quirks"

    def _chars_before_html(self, data):  # :192-238
        _spaces, rest = self._split_spaces(data)
        if rest:
            html = create_an_element("html")  # synthetic root (:231-233)
            self.document.append_child(html)
            self.open_elements.append(html)
            self.mode = M_BEFORE_HEAD
            self._reprocess_chars(rest)

    def _chars_before_head(self, data):  # :284-330 — a character token
        # reaching anything-else crashes in create_element_for_token (Q15)
        _spaces, rest = self._split_spaces(data)
        if rest:
            raise KernelError("err:null-ref:create-element")

    def _chars_in_head(self, data):  # :356-359 space → insert; else
        # anything-else (:501-508): pop head, after-head, reprocess
        spaces, rest = self._split_spaces(data)
        if spaces:
            self.insert_a_character(spaces)
        if rest:
            self.pop_current_node()
            self.mode = M_AFTER_HEAD
            self._reprocess_chars(rest)

    def _chars_after_head(self, data):  # :541-543, :588-593
        spaces, rest = self._split_spaces(data)
        if spaces:
            self.insert_a_character(spaces)
        if rest:
            body_tok = Token(START_TAG, tag=Tag("body"))
            self.insert_foreign_element(body_tok)
            self.mode = M_IN_BODY
            self._reprocess_chars(rest)

    def _chars_in_body(self, data):  # :598-622 — NUL: error+ignore; space:
        # insert; other: insert + frameset_ok=False
        if NUL not in data:  # hot path: C-speed scan, no slicing loop
            self.reconstruct_active_formatting_elements()
            self.insert_a_character(data)
            if data.strip(SPACE5):
                self.frameset_ok = False
            return
        i = 0
        n = len(data)
        while i < n:
            j = data.find(NUL, i)
            if j == -1:
                j = n
            if j > i:
                seg = data[i:j]
                self.reconstruct_active_formatting_elements()
                self.insert_a_character(seg)
                if seg.strip(SPACE5):
                    self.frameset_ok = False
            if j < n:
                self.on_error()  # each NUL char token: parse error, ignored
                j += 1
            i = j

    def _chars_text(self, data):  # :937-941 — any character token inserted
        self.insert_a_character(data)

    def _chars_after_body(self, data):  # :1061-1092
        spaces, rest = self._split_spaces(data)
        if spaces:
            # space → run_in_body → reconstruct + insert (:603-609)
            self.reconstruct_active_formatting_elements()
            self.insert_a_character(spaces)
        if rest:
            self.on_error()
            self.mode = M_IN_BODY
            self._reprocess_chars(rest)

    def _reprocess_chars(self, data):
        self._token = Token(CHARS, data=data)
        self._reprocess = True

    # --- mode handlers (non-chars tokens) -------------------------------------
    def run_initial_mode(self, token):  # :142-189
        if token.t == COMMENT:
            raise KernelError("err:not-implemented:comment")  # :70-76
        if token.t == DOCTYPE:
            dt = token.doctype
            if dt.name != "html" or dt.public_identifier is not None:
                node = Node("DocumentType")
                # append_child → ensure validity → ALWAYS HierarchyRequestError
                # for a fresh DocumentType (DOM/Node.cs:447 bug; Q11 corrected)
                self.document.append_child(node)
            self.mode = M_BEFORE_HTML
            return
        # anything else (incl start/end tags)
        self.on_error()
        self.document_mode_quirks()
        self.mode = M_BEFORE_HTML
        self._reprocess = True

    def run_before_html_mode(self, token):  # :192-238
        if token.t == DOCTYPE:
            self.on_error()
            return
        if token.t == COMMENT:
            raise KernelError("err:not-implemented:comment")
        if token.is_start_tag_of("html"):
            el = self.create_element_for_token(token)
            self.document.append_child(el)
            self.open_elements.append(el)
            self.mode = M_BEFORE_HEAD
            return
        if token.is_end_tag_of("head", "body", "html", "br"):
            pass  # fall to anything-else
        elif token.t == END_TAG:
            self.on_error()
            return
        html = create_an_element("html")
        self.document.append_child(html)
        self.open_elements.append(html)
        self.mode = M_BEFORE_HEAD
        self._reprocess = True

    def run_before_head_mode(self, token):  # :284-330
        if token.t == COMMENT:
            raise KernelError("err:not-implemented:comment")
        if token.t == DOCTYPE:
            self.on_error()
            return
        if token.is_start_tag_of("html"):
            raise KernelError("err:not-implemented:before-head-html")  # :299-301
        if token.is_start_tag_of("head"):
            el = self.insert_foreign_element(token)
            self.head_element = el
            self.mode = M_IN_HEAD
            return
        if token.is_end_tag_of("head", "body", "html", "br"):
            pass
        elif token.t == END_TAG:
            self.on_error()
            return
        # anything-else inserts an element for the CURRENT token (Q15)
        ele = self.insert_foreign_element(token)
        self.head_element = ele
        self.mode = M_IN_HEAD
        self._reprocess = True

    def run_in_head_mode(self, token):  # :356-508
        if token.t == COMMENT:
            raise KernelError("err:not-implemented:comment")
        if token.t == DOCTYPE:
            self.on_error()
            return
        if token.is_start_tag_of("html"):
            # missing return (:370-373, Q14): falls through to anything-else
            self.run_in_body_mode(token)
        if token.is_start_tag_of("base", "basefont", "bgsound", "link"):
            self.insert_foreign_element(token)
            self.pop_current_node()
            return
        if token.is_start_tag_of("meta"):
            self.insert_foreign_element(token)
            self.pop_current_node()
            return
        if token.is_start_tag_of("title"):
            self.parse_rcdata_or_rawtext(token, is_raw_text=False)
            return
        if token.is_start_tag_of("noscript", "noframes", "style"):
            self.parse_rcdata_or_rawtext(token, is_raw_text=True)
            return
        if token.is_start_tag_of("noscript"):  # dead (caught above)
            self.insert_foreign_element(token)
            self.mode = M_IN_HEAD_NOSCRIPT
            return
        if token.is_start_tag_of("script"):  # :432-462
            target = self.find_appropriate_place()
            el = self.create_element_for_token(token)
            target.append_child(el)
            self.open_elements.append(el)
            self.tokenizer.switch_to_script_data_state()
            self.original_mode = self.mode
            self.mode = M_TEXT
            return
        if token.is_end_tag_of("head"):
            self.pop_current_node()
            self.mode = M_AFTER_HEAD
            return
        if token.is_end_tag_of("body", "html", "br"):
            pass  # fall-through comment only — caught by is_end_tag below (Q13)
        if token.is_start_tag_of("template") or token.is_end_tag_of("template"):
            raise KernelError("err:not-implemented:template")  # :479-491
        if token.is_start_tag_of("head") or token.t == END_TAG:
            self.on_error()
            return
        # anything else: pop head, after-head, reprocess (:501-508)
        self.pop_current_node()
        self.mode = M_AFTER_HEAD
        self._reprocess = True

    def run_after_head_mode(self, token):  # :540-594
        if token.t == COMMENT:
            raise KernelError("err:not-implemented:comment")
        if token.t == DOCTYPE:
            self.on_error()
            return
        if token.is_start_tag_of("html"):
            self.run_in_body_mode(token)
            return
        if token.is_start_tag_of("body"):
            self.insert_foreign_element(token)
            self.frameset_ok = False
            self.mode = M_IN_BODY
            return
        if token.is_start_tag_of("frameset"):
            self.insert_foreign_element(token)
            self.mode = M_IN_FRAMESET
            return
        if token.is_start_tag_of(*_HEAD_RESIDENT_TAGS):
            raise KernelError("err:not-implemented:after-head-head-tag")  # :573-575
        if token.is_end_tag_of("template"):
            raise KernelError("err:not-implemented:template")
        if token.is_end_tag_of("body", "html", "br"):
            pass  # fall
        if token.is_start_tag_of("head") or token.t == END_TAG:
            self.on_error()  # Q13: end body/html/br land here too
            return
        self.insert_foreign_element(Token(START_TAG, tag=Tag("body")))
        self.mode = M_IN_BODY
        self._reprocess = True

    def run_in_body_mode(self, token):  # :597-855
        # Dispatch is split by token type with frozenset membership; the
        # branch ORDER within each type matches the C# check sequence exactly
        # (the original sequential is_start_tag_of chain cost ~12 calls/token).
        t = token.t
        if t == CHARS:
            self._chars_in_body(token.data)
            return
        if t == COMMENT:
            raise KernelError("err:not-implemented:comment")
        if t == DOCTYPE:
            self.on_error()
            return
        name = token.tag.name
        if t == START_TAG:
            if name not in _IN_BODY_SPECIAL_START:
                # any other start tag (:845-852), hoisted: one membership
                # probe replaces the full branch chain for the common case
                self.reconstruct_active_formatting_elements()
                self.insert_foreign_element(token)
                return
            if name == "html":
                self.on_error()
                return
            if name in _HEAD_RESIDENT_SET:
                self.run_in_head_mode(token)
                return
            if name == "body":
                self.on_error()
                raise KernelError("err:not-implemented:in-body-body")  # :659
            if name == "frameset":
                raise KernelError("err:not-implemented:in-body-frameset")  # :663
            # EOF branch (:666-673) is dead: the pump returns on EOF first
            if name in _BLOCK_START_SET:  # :716-723 — only fires when a p is
                # literally on the stack; otherwise FALLS THROUGH
                for e in self.open_elements:
                    if e.tag_name == "p":
                        self.close_a_p_element()
                        self.insert_foreign_element(token)
                        return
            if name in _HEADING_SET:
                raise KernelError("err:not-implemented:in-body-heading")  # :730
            if name == "pre" or name == "listing":
                raise KernelError("err:not-implemented:in-body-pre")  # :739
            if name == "form":
                raise KernelError("err:not-implemented:in-body-form")  # :748
            if name == "li":  # :752-778 — `node` is never reassigned, so an
                # li start with an li current node loops, draining the stack
                # until Peek/Pop crashes (err:empty-stack)
                self.frameset_ok = False
                node = self.current_node()
                while node.tag_name == "li":
                    self.generate_implied_end_tags(except_for="li")
                    if self.current_node().tag_name != "li":
                        self.on_error()
                    self.pop_element_until("li")
                if self.has_element_in_button_scope("p"):
                    self.close_a_p_element()
                self.insert_foreign_element(token)
                return
            if name == "dd" or name == "dt":
                raise KernelError("err:not-implemented:in-body-dd-dt")  # :782
            if name == "plaintext":
                raise KernelError("err:not-implemented:in-body-plaintext")  # :787
            if name == "button":  # :790-801 — scope stub False
                if self.has_element_in_scope("button"):
                    self.on_error()
                    self.generate_implied_end_tags()
                    self.pop_element_until("button")
                self.reconstruct_active_formatting_elements()
                self.insert_foreign_element(token)
                self.frameset_ok = False
                return
            # any other start tag (:845-852)
            self.reconstruct_active_formatting_elements()
            self.insert_foreign_element(token)
            return
        # END_TAG
        if name == "template":
            self.run_in_head_mode(token)
            return
        if name == "body":  # :676-692 — mode switch WITHOUT pop
            if not any(e.tag_name == "body" for e in self.open_elements):
                self.on_error()
                return
            if any(e.tag_name not in _BODY_OK_TAGS for e in self.open_elements):
                self.on_error()
                return  # NB: returns (ignores token) — deviation from spec kept
            self.mode = M_AFTER_BODY
            return
        if name == "html":  # :694-713
            if not any(e.tag_name == "body" for e in self.open_elements):
                self.on_error()
                return
            if any(e.tag_name not in _BODY_OK_TAGS for e in self.open_elements):
                self.on_error()
                return
            self.mode = M_AFTER_BODY
            self._reprocess = True
            return
        if name in _BLOCK_END_SET:  # :804-820 — scope stub False, so ALWAYS
            # parse error + ignore (Q9)
            if not self.has_element_in_scope(name):
                self.on_error()
                return
            self.generate_implied_end_tags()
            if self.current_node().tag_name != name:
                self.on_error()
            self.pop_element_until(name)
            return
        if name == "form":
            raise KernelError("err:not-implemented:in-body-end-form")  # :824
        if name == "p":
            raise KernelError("err:not-implemented:in-body-end-p")  # :828
        if name == "li":  # :831-842 — no scope check; double pop
            self.generate_implied_end_tags(except_for="li")
            if self.current_node().tag_name != "li":
                self.on_error()
            self.pop_element_until("li")
            return
        # any other end tag (:854)
        raise KernelError("err:not-implemented:in-body-any-other-end-tag")

    def run_text_mode(self, token):  # :937-991
        if token.t == CHARS:
            self._chars_text(token.data)
            return
        # EOF branch (:943-947) dead: pump returns first
        if token.is_end_tag_of("script"):
            script = self.current_node()
            self.pop_current_node()
            self.mode = self.original_mode
            self.prepare_script_element(script)  # effective no-op (:994-1029)
            return
        if token.t == END_TAG:
            self.pop_current_node()
            self.mode = self.original_mode
            return
        # start tags / comments / doctypes fall through: IGNORED (no else)

    def run_after_body_mode(self, token):  # :1061-1092
        if token.t == COMMENT:
            raise KernelError("err:not-implemented:comment")
        if token.t == DOCTYPE:
            self.on_error()
            return
        if token.is_start_tag_of("html"):
            self.run_in_body_mode(token)
            return
        if token.is_end_tag_of("html"):
            self.mode = M_AFTER_AFTER_BODY
            return
        self.on_error()
        self.mode = M_IN_BODY
        self._reprocess = True

    # --- the pump (P0, HTMLParser.cs:1106-1193) -------------------------------
    _CHARS_HANDLERS = {}

    def run(self):
        reprocess_guard = 0
        tokenizer = self.tokenizer
        emitting = tokenizer._emitting  # inlined next_token FIFO drain
        popleft = emitting.popleft
        while True:
            if self._reprocess:
                self._reprocess = False
                reprocess_guard += 1
                if reprocess_guard > 32:
                    raise KernelError("err:reprocess-limit")
            else:
                if not emitting:
                    tokenizer._run_machine()
                self._token = popleft()
                reprocess_guard = 0
            token = self._token
            if token is None:
                # null token from BogusDOCTYPE double-emit (:1222 + :1362):
                # _next_token.is_eof → NullReferenceException
                raise KernelError("err:null-ref:null-token")
            if token.t == EOF_TOKEN:
                return self.document  # :1113 — EOF returns before any mode
            mode = self.mode
            if token.t == CHARS:
                h = _CHARS_DISPATCH.get(mode)
                if h is not None:
                    h(self, token.data)
                    continue
                # fall into not-implemented modes below
            h = _MODE_DISPATCH.get(mode)
            if h is not None:
                h(self, token)
            else:
                raise KernelError(
                    "err:not-implemented:" + _NOT_IMPLEMENTED_MODES[mode])


_MODE_DISPATCH = {
    M_INITIAL: Parser.run_initial_mode,
    M_BEFORE_HTML: Parser.run_before_html_mode,
    M_BEFORE_HEAD: Parser.run_before_head_mode,
    M_IN_HEAD: Parser.run_in_head_mode,
    M_AFTER_HEAD: Parser.run_after_head_mode,
    M_IN_BODY: Parser.run_in_body_mode,
    M_TEXT: Parser.run_text_mode,
    M_AFTER_BODY: Parser.run_after_body_mode,
}

_CHARS_DISPATCH = {
    M_INITIAL: Parser._chars_initial,
    M_BEFORE_HTML: Parser._chars_before_html,
    M_BEFORE_HEAD: Parser._chars_before_head,
    M_IN_HEAD: Parser._chars_in_head,
    M_AFTER_HEAD: Parser._chars_after_head,
    M_IN_BODY: Parser._chars_in_body,
    M_TEXT: Parser._chars_text,
    M_AFTER_BODY: Parser._chars_after_body,
}
