"""Line-faithful Python transliteration of the reference HTML5 tokenizer.

Reference: HTMLTokenizer.cs (80-state WHATWG tokenizer, as written — quirks
included, see SURVEY.md §2.5). Every state cites the C# lines it mirrors.
Operates on UTF-16 code units (astral input chars are pre-split into
surrogate pairs) to match C# string semantics (HTMLTokenizer.cs:1753-1766).

Fast mode adds run-skipping in pure-text states (Data/RCDATA/RAWTEXT/
ScriptData/attribute values/comment bodies): a run of characters that the
per-char machine would emit one-by-one (all coalescing into the same Text
node / attribute value) is emitted as a single multi-char token. The parser
(parser.py) splits runs so observable behavior is identical; differential
tests (tests/test_differential.py) enforce fast == slow.
"""
from __future__ import annotations

import re
from collections import deque

from ._entities_data import NAMED_REFERENCES, NAME_MAX_LENGTH

EOF = None  # HTMLTokenizer.cs:1577
REPLACEMENT_CHARACTER = "�"  # HTMLTokenizer.cs:1573
NUL = "\x00"


class KernelError(Exception):
    """Deterministic stand-in for a C# crash/hang (SURVEY.md §2.5.1)."""

    def __init__(self, code: str):
        super().__init__(code)
        self.code = code


# --- char classes (HTMLTokenizer.cs:1580-1676; quirks preserved) ----------

def is_ascii_upper_alpha(c):  # :1649-1651
    return c is not EOF and "A" <= c <= "Z"


def is_ascii_lower_alpha(c):  # :1652-1654
    return c is not EOF and "a" <= c <= "z"


def is_ascii_alpha(c):  # :1645-1647
    return c is not EOF and ("A" <= c <= "Z" or "a" <= c <= "z")


def is_ascii_digit(c):  # :1667-1669
    return c is not EOF and "0" <= c <= "9"


def is_ascii_alphanumeric(c):  # :1655-1657
    return c is not EOF and ("0" <= c <= "9" or "a" <= c <= "z" or "A" <= c <= "Z")


def is_ascii_upper_hex_digit(c):  # :1658-1660 — BUG KEPT: matches a-f AND A-F
    return c is not EOF and ("a" <= c <= "f" or "A" <= c <= "F")


def is_ascii_lower_hex_digit(c):  # :1661-1663 — same body as upper (bug kept)
    return c is not EOF and ("a" <= c <= "f" or "A" <= c <= "F")


def is_ascii_hex_digit(c):  # :1664-1666 — BUG KEPT: all letters, no digits
    return is_ascii_upper_alpha(c) or is_ascii_lower_alpha(c)


def is_white_space(c):  # :1670-1672 — tokenizer ws set (no \r)
    return c == "\t" or c == "\n" or c == "\x0c" or c == " "


def to_lower(c):  # :1674-1676 — BUG KEPT: unconditional +0x20
    return chr(ord(c) + 0x20)


def _is_surrogate_cp(cp):  # :1588-1590
    return 0xD800 <= cp <= 0xDFFF


def _is_noncharacter_cp(cp):  # :1592-1630
    return (0xFDD0 <= cp <= 0xFDEF) or (cp & 0xFFFE) == 0xFFFE and cp <= 0x10FFFF


def _is_control_cp(cp):  # :1633-1639
    return 0 <= cp <= 0x1F or 0x7F <= cp <= 0x9F


def _is_ascii_whitespace_cp(cp):  # :1641-1643
    return cp in (0x09, 0x0A, 0x0C, 0x0D, 0x20)


# NumericCharacterReferenceTable.cs:3-31 (C1 remap; dead code in practice —
# the control-character branch shadows it, HTMLTokenizer.cs:1521-1524 — but
# transliterated for exactness of the elif chain).
NUMERIC_REMAP = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}


# --- token model (HTMLToken.cs, HTMLAttribute.cs) --------------------------

DOCTYPE, START_TAG, END_TAG, COMMENT, CHARS, EOF_TOKEN = range(6)  # HTMLToken.cs:59-66

SPACE5 = "\t\n\x0c\r "  # token-level space set (HTMLToken.cs:37-45; incl \r)


class Tag:
    __slots__ = ("name", "self_closing", "attributes", "finished")

    def __init__(self, name=""):
        self.name = name
        self.self_closing = False
        self.attributes = None  # list of [name:str, value_chunks:list[str]]
        self.finished = None  # memoized finished_attributes() (fast path)

    def start_new_attribute(self, name="", value=""):  # HTMLToken.cs:126-136
        if self.attributes is None:
            self.attributes = []
        self.attributes.append([name, [value] if value else []])

    def append_to_current_attribute_name(self, c):  # HTMLToken.cs:138-142
        self.attributes[-1][0] += c

    def append_to_current_attribute_value(self, s):  # HTMLToken.cs:144-148
        self.attributes[-1][1].append(s)

    def finished_attributes(self):
        if self.finished is not None:
            return self.finished
        if self.attributes is None:
            return None
        return [(n, "".join(v)) for n, v in self.attributes]


class Doctype:
    __slots__ = ("name", "public_identifier", "system_identifier", "force_quirks")

    def __init__(self):
        self.name = ""
        self.public_identifier = None  # non-None only after init_public_identifier
        self.system_identifier = None
        self.force_quirks = False


class Token:
    __slots__ = ("t", "tag", "doctype", "data")

    def __init__(self, t, tag=None, doctype=None, data=""):
        self.t = t
        self.tag = tag
        self.doctype = doctype
        self.data = data  # chars payload / comment data

    # HTMLToken.cs:36-45 — space set includes \r
    def is_space_character(self):
        return self.t == CHARS and self.data[0] in SPACE5

    def is_null_character(self):  # HTMLToken.cs:47-54
        return self.t == CHARS and self.data[0] == NUL

    def is_start_tag_of(self, *names):  # HTMLToken.cs:20-22
        return self.t == START_TAG and self.tag.name in names

    def is_end_tag_of(self, *names):  # HTMLToken.cs:24-26
        return self.t == END_TAG and self.tag.name in names

    def get_attribute_value(self, name):  # HTMLToken.cs:201-203
        if self.tag.attributes is None:
            return None
        for n, v in self.tag.attributes:
            if n == name:
                return "".join(v)
        return None

    def __repr__(self):
        return f"Token({self.t},{self.tag.name if self.tag else self.data!r})"


# --- tokenizer states (HTMLTokenizer.cs:1789-1870, same order) -------------
(
    S_DATA, S_RCDATA, S_RAWTEXT, S_SCRIPT_DATA, S_PLAINTEXT,
    S_TAG_OPEN, S_END_TAG_OPEN, S_TAG_NAME,
    S_RCDATA_LT, S_RCDATA_END_TAG_OPEN, S_RCDATA_END_TAG_NAME,
    S_RAWTEXT_LT, S_RAWTEXT_END_TAG_OPEN, S_RAWTEXT_END_TAG_NAME,
    S_SD_LT, S_SD_END_TAG_OPEN, S_SD_END_TAG_NAME,
    S_SD_ESCAPE_START, S_SD_ESCAPE_START_DASH,
    S_SD_ESCAPED, S_SD_ESCAPE_DASH, S_SD_ESCAPE_DASH_DASH,
    S_SD_ESCAPED_LT, S_SD_ESCAPED_END_TAG_OPEN, S_SD_ESCAPED_END_TAG_NAME,
    S_SD_DOUBLE_ESCAPE_START, S_SD_DOUBLE_ESCAPED,
    S_SD_DOUBLE_ESCAPED_DASH, S_SD_DOUBLE_ESCAPED_DASH_DASH,
    S_SD_DOUBLE_ESCAPED_LT, S_SD_DOUBLE_ESCAPED_END,
    S_BEFORE_ATTR_NAME, S_ATTR_NAME, S_AFTER_ATTR_NAME,
    S_BEFORE_ATTR_VALUE, S_ATTR_VALUE_DQ, S_ATTR_VALUE_SQ, S_ATTR_VALUE_UNQ,
    S_AFTER_ATTR_VALUE_QUOTED, S_SELF_CLOSING_START_TAG,
    S_BOGUS_COMMENT, S_MARKUP_DECLARATION_OPEN,
    S_COMMENT_START, S_COMMENT_START_DASH, S_COMMENT,
    S_COMMENT_LT, S_COMMENT_LT_BANG, S_COMMENT_LT_BANG_DASH,
    S_COMMENT_LT_BANG_DASH_DASH, S_COMMENT_END_DASH, S_COMMENT_END,
    S_COMMENT_END_BANG,
    S_DOCTYPE, S_BEFORE_DOCTYPE_NAME, S_DOCTYPE_NAME, S_AFTER_DOCTYPE_NAME,
    S_AFTER_DOCTYPE_PUBLIC_KEYWORD, S_BEFORE_DOCTYPE_PUBLIC_ID,
    S_DOCTYPE_PUBLIC_ID_DQ, S_DOCTYPE_PUBLIC_ID_SQ,
    S_AFTER_DOCTYPE_PUBLIC_ID, S_BETWEEN_DOCTYPE_PUBLIC_SYSTEM,
    S_AFTER_DOCTYPE_SYSTEM_KEYWORD, S_BEFORE_DOCTYPE_SYSTEM_ID,
    S_DOCTYPE_SYSTEM_ID_DQ, S_DOCTYPE_SYSTEM_ID_SQ,
    S_AFTER_DOCTYPE_SYSTEM_ID, S_BOGUS_DOCTYPE,
    S_CDATA_SECTION, S_CDATA_SECTION_BRACKET, S_CDATA_SECTION_END,
    S_CHARACTER_REFERENCE, S_NAMED_CHARACTER_REFERENCE, S_AMBIGUOUS_AMPERSAND,
    S_NUMERIC_CHARACTER_REFERENCE, S_HEX_CHARREF_START, S_DEC_CHARREF_START,
    S_HEX_CHARREF, S_DEC_CHARREF, S_NUMERIC_CHARREF_END,
) = range(80)

# Run-skipping stop sets per state (fast mode). Each run is a maximal span of
# characters whose per-char handling is "append/emit verbatim, no error, no
# state change" — so batching is observationally identical.
_RX_DATA = re.compile(r"[^&<\x00]+")        # HTMLTokenizer.cs:23-38
# Raw-text runs may swallow a '<' that provably does NOT open an end tag
# (or, in ScriptData, an escape start): the per-char walk for that '<' is
# LT-state → anything-else → emit '<' with no error and return to the text
# state, i.e. it contributes exactly its own character to the run. The
# lookahead is POSITIVE ((?=[^/])): at end-of-input it fails, so a trailing
# '<' still falls to the machine for its reconsume-at-EOF walk. Script-heavy
# pages ('a < b', 'i<n') previously paid one machine entry + one singleton
# token per comparison operator.
_RX_RCDATA = re.compile(r"(?:[^&<\x00]|<(?=[^/]))+")   # :39-54
_RX_RAWTEXT = re.compile(r"(?:[^<\x00]|<(?=[^/]))+")   # :55-67
_RX_SCRIPT = re.compile(r"(?:[^<\x00]|<(?=[^/!]))+")   # :68-80
_RX_PLAINTEXT = re.compile(r"[^\x00]+")     # :81-91
_RX_SD_ESCAPED = re.compile(r"[^-<\x00]+")  # :375-391 (also double-escaped :519-536)
_RX_TAG_NAME = re.compile(r"[^\t\n\x0c/>\x00A-Z ]+")  # :134-158
_RX_ATTR_NAME = re.compile(r"[^\t\n\x0c />=\x00\"'<A-Z]+")  # :625-646
_RX_ATTR_VALUE_DQ = re.compile(r"[^\"&\x00]+")  # :683-701
_RX_ATTR_VALUE_SQ = re.compile(r"[^'&\x00]+")   # :702-720
_RX_ATTR_VALUE_UNQ = re.compile(r"[^\t\n\x0c &>\x00\"'<=`]+")  # :721-746
_RX_COMMENT = re.compile(r"[^<\-\x00]+")    # :844-865
_RX_BOGUS_COMMENT = re.compile(r"[^>\x00]+")  # :773-788

# Whole-tag fast paths (Data state only). A match is exactly the shape the
# per-char machine walks with NO parse error, NO charref, NO case folding and
# NO self-closing flag: lowercase name, ws-separated lowercase attrs that are
# valueless, double-quoted or single-quoted (&-free, NUL-free values),
# optional trailing ws. Anything else (uppercase, unquoted values, `/>`,
# `&` in a value, `=` detached from the name, …) falls through to the
# machine, so quirks Q1/Q5/Q6/Q17 and all error counters are untouched.
# Attr-state whitespace is tab/LF/FF/space only (CR is NOT whitespace there).
_WS_ATTR = r"\t\n\x0c "
_ATTR_SHAPE = r"[a-z][a-z0-9-]*(?:=\"[^\"&\x00]*\"|='[^'&\x00]*')?"
_RX_FAST_START = re.compile(
    r"<([a-z][a-z0-9]*)"
    r"((?:[" + _WS_ATTR + r"]+" + _ATTR_SHAPE + r")*)"
    r"[" + _WS_ATTR + r"]*>")
_RX_FAST_END = re.compile(r"</([a-z][a-z0-9]*)[" + _WS_ATTR + r"]*>")
_RX_FAST_ATTR = re.compile(
    r"([a-z][a-z0-9-]*)(?:=\"([^\"&\x00]*)\"|='([^'&\x00]*)')?")
# One alternation of text-run | end tag | start tag for the batched Data
# scan: a single C-level match per token instead of up to three attempts.
# Disambiguate via lastindex: 1=text, 2=end, 4=start (the attrs group
# participates, possibly empty, whenever the start branch matches).
_RX_FAST_ANY = re.compile(
    r"([^&<\x00]+)"
    r"|</([a-z][a-z0-9]*)[" + _WS_ATTR + r"]*>"
    r"|<([a-z][a-z0-9]*)"
    r"((?:[" + _WS_ATTR + r"]+" + _ATTR_SHAPE + r")*)"
    r"[" + _WS_ATTR + r"]*>")

# Start tags after which the PARSER switches the tokenizer out of the Data
# state (RCDATA/RAWTEXT/ScriptData via parse_rcdata_or_rawtext /
# prepare-script, HTMLParser.cs:333-353/432-462). The batched Data-state
# scan must stop BEFORE emitting one of these: tokens after it belong to a
# different tokenizer state that only exists once the parser consumes the
# tag. Every other start tag leaves the tokenizer in Data.
_STATE_SWITCH_TAGS = frozenset(
    {"title", "noscript", "noframes", "style", "script"})
_FAST_BATCH_MAX = 256  # bound wasted lookahead if the parser throws mid-batch

# Memo of fast-path attribute-string parses. Real pages repeat the same
# attribute strings constantly (class="nav", rel="stylesheet", …), so the
# regex walk runs once per distinct string. Safe to SHARE the parsed list
# between Tag instances: fast-path tags are never the tokenizer's
# _current_token, and nothing downstream mutates tag.attributes — the
# parser and harness only read them (finished_attributes/get_attribute_value
# build fresh objects). Bounded so adversarial pages can't grow it.
_ATTRS_MEMO: dict = {}
_ATTRS_MEMO_MAX = 8192
_ATTRS_MEMO_KEY_MAX = 256


# Every proper prefix of every named reference, for early exit in the
# longest-match walk (entity names are not prefix-closed, so the walk must
# otherwise always run to NAME_MAX_LENGTH)
_ENTITY_PREFIXES = frozenset(
    name[:i] for name in NAMED_REFERENCES for i in range(1, len(name) + 1))


def _longest_named_at(inp: str, pos: int, n: int):
    """Longest NAMED_REFERENCES match starting at pos (the same walk as
    _consume_named_charref, on the raw input)."""
    matched = None
    end = min(pos + NAME_MAX_LENGTH, n)
    i = pos
    while i < end:
        cand = inp[pos:i + 1]
        if cand not in _ENTITY_PREFIXES:
            break
        if cand in NAMED_REFERENCES:
            matched = cand
        i += 1
    return matched


def _parse_fast_attrs(attrs: str):
    """Returns (machine-format attrs, finished tuple list) — both shared
    between tags via the memo; neither is ever mutated downstream."""
    got = _ATTRS_MEMO.get(attrs)
    if got is not None:
        return got
    parsed = [[a, [dq or sq] if (dq or sq) else []]
              for a, dq, sq in _RX_FAST_ATTR.findall(attrs)]
    pair = (parsed, [(n, "".join(v)) for n, v in parsed])
    if len(attrs) <= _ATTRS_MEMO_KEY_MAX and len(_ATTRS_MEMO) < _ATTRS_MEMO_MAX:
        _ATTRS_MEMO[attrs] = pair
    return pair

_ATTR_VALUE_RETURN_STATES = (S_ATTR_VALUE_DQ, S_ATTR_VALUE_SQ, S_ATTR_VALUE_UNQ)


def to_code_units(s: str) -> str:
    """Split astral chars into surrogate pairs, mirroring C# UTF-16 strings.
    str.isascii() is O(1) (compact-unicode kind flag), so the overwhelmingly
    common ASCII page skips the scan entirely; max(s) is a C-level char scan,
    far cheaper than max(map(ord, s))."""
    if not s or s.isascii() or ord(max(s)) <= 0xFFFF:
        return s
    b = s.encode("utf-16-le", "surrogatepass")
    return "".join(map(chr, memoryview(b).cast("H")))


def to_wellformed(s: str) -> str:
    """Recombine surrogate pairs into astral chars for output (the reverse of
    to_code_units); lone surrogates become U+FFFD like the C# UTF-8 console
    encoder would produce."""
    if s.isascii():
        return s
    try:
        s.encode("utf-8")
        return s
    except UnicodeEncodeError:
        return s.encode("utf-16-le", "surrogatepass").decode("utf-16-le", "replace")


class Tokenizer:
    """HTMLTokenizer.cs:4-1892 as written."""

    def __init__(self, units: str, on_error=None, fast: bool = True):
        self._input = units
        self._n = len(units)
        self._cursor = 0
        self._cur = None  # _current_input_character
        self._state = S_DATA
        self._return_state = S_DATA
        self._current_token = None
        self._temp = []  # _temporary_buffer (None ~ [] distinction irrelevant: always re-newed)
        self._emitting = deque()  # FIFO _emitting_tokens (HTMLTokenizer.cs:1890)
        self._last_start_tag_name = None  # semantically equal to the full
        # _emitted_tokens history scan (HTMLTokenizer.cs:1558-1571,1889)
        self._charref_code = 0
        self.on_error = on_error
        self.fast = fast
        # Determinized hang detection (SURVEY.md §2.5.1): the as-written
        # machine loops forever emitting tokens when reconsume-at-EOF
        # re-reads the last char (e.g. input ending in "&" in Data, or "<"
        # in RCDATA). Budgets below bound total emission / machine steps.
        self._unit_budget = 4 * self._n + 128
        self._step_budget = 64 * self._n + 4096

    # external mode-switch API (HTMLTokenizer.cs:1718-1728)
    def switch_to_script_data_state(self):
        self._state = S_SCRIPT_DATA

    def switch_to_raw_text_state(self):
        self._state = S_RAWTEXT

    def switch_to_rcdata_state(self):
        self._state = S_RCDATA

    # --- plumbing ---------------------------------------------------------
    def _parse_error(self, code):  # :1701-1705
        if self.on_error is not None:
            self.on_error(code)

    def _consume(self):  # consume_next_input_character, :1758-1766
        if self._cursor < self._n:
            self._cur = self._input[self._cursor]
            self._cursor += 1
        else:
            self._cur = EOF

    def _reconsume(self, state):  # :1707-1712 (cursor may step below a
        # consumed-at-EOF position, re-reading the last char — kept)
        self._state = state
        self._cursor -= 1
        if self._cursor < 0:
            raise KernelError("err:cursor-underflow")

    def _peek(self, offset):  # peek_codepoint, :1753-1756
        i = self._cursor + offset
        if i >= self._n:
            return EOF
        return self._input[i]

    def _next_input_character(self):  # :1872
        return self._peek(0)

    def _next_few_characters_are(self, s):  # :1730-1737 — to_lower on both
        # sides is a bijection, so this is an EXACT case-sensitive match (Q2)
        i = self._cursor
        if i + len(s) > self._n:
            return False
        return self._input[i:i + len(s)] == s

    def _try_consume(self, s):  # :1745-1751
        if self._next_few_characters_are(s):
            self._cursor += len(s)
            return True
        return False

    def _emit_token(self, tok):  # emit_current_token, :1768-1773
        self._emitting.append(tok)
        if tok is not None:
            if tok.t == START_TAG:
                self._last_start_tag_name = tok.tag.name
            self._unit_budget -= 1
            if self._unit_budget < 0:
                raise KernelError("err:tokenizer-loop")

    def _emit_current_token(self):
        tok = self._current_token
        self._current_token = None
        # C# Debug.Assert(_current_token != null) is release-no-op; a null
        # token crashes the parser pump (BogusDOCTYPE path, HTMLParser.cs:1113)
        self._emit_token(tok)

    def _emit_chars(self, s):  # emit_character_token (+ run batching)
        self._emitting.append(Token(CHARS, data=s))
        self._unit_budget -= len(s)
        if self._unit_budget < 0:
            raise KernelError("err:tokenizer-loop")

    def _emit_eof(self):  # :1784-1787
        self._emitting.append(Token(EOF_TOKEN))

    def _charref_in_attribute(self):  # :1554-1556
        return self._return_state in _ATTR_VALUE_RETURN_STATES

    def _flush_charref(self):  # flush_code_points..., :1540-1552
        s = "".join(self._temp)
        if self._charref_in_attribute():
            if s:
                self._current_token.tag.append_to_current_attribute_value(s)
        else:
            if s:
                self._emit_chars(s)

    def _is_appropriate_end_tag(self):  # :1558-1571
        tok = self._current_token
        if tok is None or tok.t != END_TAG:
            return False
        if self._last_start_tag_name is None:
            return False
        return tok.tag.name == self._last_start_tag_name

    def _consume_named_charref(self):  # :1678-1699 longest match
        matched = None
        cand = []
        for i in range(NAME_MAX_LENGTH):
            ch = self._peek(i)
            if ch is EOF:
                break
            cand.append(ch)
            c = "".join(cand)
            if c in NAMED_REFERENCES:
                matched = c
        if matched is not None:
            self._temp.append(matched)
            self._cursor += len(matched)
            return matched
        return None

    def _match_appropriate_end_tag(self, inp):
        """Fast path shared by RCDATA/RAWTEXT/ScriptData: an exact lowercase
        `</lastname>` at the cursor is precisely the sequence the per-char
        less-than/end-tag-open/end-tag-name walk accepts with no parse error,
        ending in emit + switch-to-Data (appropriate-end-tag rule,
        HTMLTokenizer.cs:159-287/288-608). Anything else (uppercase,
        whitespace, attributes, inappropriate name) falls to the machine."""
        name = self._last_start_tag_name
        if (name and inp.startswith("</", self._cursor)
                and inp.startswith(name, self._cursor + 2)
                and self._peek(2 + len(name)) == ">"):
            self._cursor += len(name) + 3
            self._emit_token(Token(END_TAG, tag=Tag(name)))
            self._state = S_DATA
            return True
        return False

    def next_token(self):
        """HTMLTokenizer.cs:9-16 — drain FIFO, else run machine."""
        if self._emitting:
            return self._emitting.popleft()
        self._run_machine()
        return self._emitting.popleft()

    # --- the machine --------------------------------------------------------
    def _run_machine(self):  # the big switch, HTMLTokenizer.cs:22-1533
        inp = self._input
        fast = self.fast
        while not self._emitting:
            self._step_budget -= 1
            if self._step_budget < 0:
                raise KernelError("err:tokenizer-loop")
            st = self._state
            # ---------------- text states ----------------
            if st == S_DATA:  # :23-38
                if fast:
                    # Batched scan: emit MANY error-free tokens per machine
                    # entry (text runs + whole tags — exactly the shapes the
                    # per-char machine walks with no parse error, see
                    # _RX_FAST_* definitions). Stops before any tag in
                    # _STATE_SWITCH_TAGS so parser-driven tokenizer state
                    # switches see the same stream as the per-char walk; no
                    # batched token can record a parse error, so lookahead
                    # beyond a parser crash is side-effect-free.
                    cursor = self._cursor
                    n_em = 0
                    any_m = _RX_FAST_ANY.match
                    emitting_append = self._emitting.append
                    budget = self._unit_budget
                    while n_em < _FAST_BATCH_MAX:
                        m = any_m(inp, cursor)
                        if m is None:
                            # error-free named charref: a full ;-terminated
                            # longest match in Data state is exactly one
                            # machine walk Data→CharRef→Named→flush with NO
                            # parse error, emitting the decoded value as one
                            # chars token and returning to Data. Anything
                            # else (&name without ';', &#…, ambiguous &)
                            # falls to the machine.
                            if cursor < self._n and inp[cursor] == "&":
                                ent = _longest_named_at(inp, cursor + 1,
                                                        self._n)
                                if ent is not None and ent[-1] == ";":
                                    cursor += 1 + len(ent)
                                    s = NAMED_REFERENCES[ent]
                                    emitting_append(Token(CHARS, None, None, s))
                                    budget -= len(s)
                                    n_em += 1
                                    continue
                            break
                        g = m.lastindex
                        if g == 1:  # text run
                            s = m.group(1)
                            cursor = m.end()
                            emitting_append(Token(CHARS, None, None, s))
                            budget -= len(s)
                            n_em += 1
                            continue
                        if g == 2:  # end tag
                            cursor = m.end()
                            emitting_append(Token(END_TAG, Tag(m.group(2))))
                            budget -= 1
                            n_em += 1
                            continue
                        # start tag (g == 4: attrs group participates)
                        name = m.group(3)
                        if name in _STATE_SWITCH_TAGS:
                            break
                        tag = Tag(name)
                        attrs = m.group(4)
                        if attrs:
                            # (name, dq-value, sq-value); valueless and
                            # empty-quoted both yield value "" exactly
                            # like the machine's finished_attributes
                            tag.attributes, tag.finished = \
                                _parse_fast_attrs(attrs)
                        cursor = m.end()
                        emitting_append(Token(START_TAG, tag))
                        self._last_start_tag_name = name
                        budget -= 1
                        n_em += 1
                    self._cursor = cursor
                    self._unit_budget = budget
                    if budget < 0:
                        raise KernelError("err:tokenizer-loop")
                    if n_em:
                        continue
                    # single-shot fast path for state-switching tags (the
                    # batch stops before them; parser switches state after
                    # consuming the tag, before pulling the next token)
                    if cursor < self._n and inp[cursor] == "<":
                        m = _RX_FAST_START.match(inp, cursor)
                        if m:
                            tag = Tag(m.group(1))
                            attrs = m.group(2)
                            if attrs:
                                tag.attributes, tag.finished = \
                                    _parse_fast_attrs(attrs)
                            self._cursor = m.end()
                            self._emit_token(Token(START_TAG, tag=tag))
                            continue
                self._consume()
                c = self._cur
                if c == "&":
                    self._return_state = S_DATA
                    self._state = S_CHARACTER_REFERENCE
                elif c == "<":
                    self._state = S_TAG_OPEN
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._emit_chars(c)  # raw NUL emitted (:30-32)
                elif c is EOF:
                    self._emit_eof()
                else:
                    self._emit_chars(c)
            elif st == S_RCDATA:  # :39-54
                if fast:
                    m = _RX_RCDATA.match(inp, self._cursor)
                    if m:
                        self._cursor = m.end()
                        self._emit_chars(m.group())
                        continue
                    if self._match_appropriate_end_tag(inp):
                        continue
                    cur = self._cursor
                    # (benign '<' runs are consumed by _RX_RCDATA above;
                    # reaching here means '</', '&', NUL, or EOF at cursor)
                    # ;-terminated named charref in RCDATA flushes via
                    # _emit_chars exactly like the Data-state walk
                    if cur < self._n and inp[cur] == "&":
                        ent = _longest_named_at(inp, cur + 1, self._n)
                        if ent is not None and ent[-1] == ";":
                            self._cursor = cur + 1 + len(ent)
                            self._emit_chars(NAMED_REFERENCES[ent])
                            continue
                self._consume()
                c = self._cur
                if c == "&":
                    self._return_state = S_RCDATA
                    self._state = S_CHARACTER_REFERENCE
                elif c == "<":
                    self._state = S_RCDATA_LT
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._emit_chars(REPLACEMENT_CHARACTER)
                elif c is EOF:
                    self._emit_eof()
                else:
                    self._emit_chars(c)
            elif st == S_RAWTEXT:  # :55-67
                if fast:
                    m = _RX_RAWTEXT.match(inp, self._cursor)
                    if m:
                        self._cursor = m.end()
                        self._emit_chars(m.group())
                        continue
                    if self._match_appropriate_end_tag(inp):
                        continue
                self._consume()
                c = self._cur
                if c == "<":
                    self._state = S_RAWTEXT_LT
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._emit_chars(REPLACEMENT_CHARACTER)
                elif c is EOF:
                    self._emit_eof()
                else:
                    self._emit_chars(c)
            elif st == S_SCRIPT_DATA:  # :68-80
                if fast:
                    m = _RX_SCRIPT.match(inp, self._cursor)
                    if m:
                        self._cursor = m.end()
                        self._emit_chars(m.group())
                        continue
                    if self._match_appropriate_end_tag(inp):
                        continue
                self._consume()
                c = self._cur
                if c == "<":
                    self._state = S_SD_LT
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._emit_chars(REPLACEMENT_CHARACTER)
                elif c is EOF:
                    self._emit_eof()
                else:
                    self._emit_chars(c)
            elif st == S_PLAINTEXT:  # :81-91
                if fast:
                    m = _RX_PLAINTEXT.match(inp, self._cursor)
                    if m:
                        self._cursor = m.end()
                        self._emit_chars(m.group())
                        continue
                self._consume()
                c = self._cur
                if c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._emit_chars(REPLACEMENT_CHARACTER)
                elif c is EOF:
                    self._emit_eof()
                else:
                    self._emit_chars(c)
            # ---------------- tag open ----------------
            elif st == S_TAG_OPEN:  # :92-114
                self._consume()
                c = self._cur
                if c == "!":
                    self._state = S_MARKUP_DECLARATION_OPEN
                elif c == "/":
                    self._state = S_END_TAG_OPEN
                elif is_ascii_alpha(c):
                    self._current_token = Token(START_TAG, tag=Tag())
                    self._reconsume(S_TAG_NAME)
                elif c == "?":  # Q5: truncates the parse
                    self._parse_error("unexpected-question-mark-instead-of-tag-name")
                    self._emit_chars("<")
                    self._emit_eof()
                elif c is EOF:
                    self._parse_error("eof-before-tag-name")
                    self._emit_chars("<")
                    self._emit_eof()
                else:
                    self._parse_error("invalid-first-character-of-tag-name")
                    self._emit_chars("<")
                    self._reconsume(S_DATA)
            elif st == S_END_TAG_OPEN:  # :115-133
                self._consume()
                c = self._cur
                if is_ascii_alpha(c):
                    self._current_token = Token(END_TAG, tag=Tag())
                    self._reconsume(S_TAG_NAME)
                elif c == ">":
                    self._parse_error("missing-end-tag-name")
                    self._state = S_DATA
                elif c is EOF:
                    self._parse_error("eof-before-tag-name")
                    self._emit_chars("</")
                    self._emit_eof()
                else:
                    self._parse_error("invalid-first-character-of-tag-name")
                    self._current_token = Token(COMMENT, data="")
                    self._reconsume(S_BOGUS_COMMENT)
            elif st == S_TAG_NAME:  # :134-158
                if fast:
                    m = _RX_TAG_NAME.match(inp, self._cursor)
                    if m:
                        self._current_token.tag.name += m.group()
                        self._cursor = m.end()
                        continue
                self._consume()
                c = self._cur
                if is_white_space(c):
                    self._state = S_BEFORE_ATTR_NAME
                elif c == "/":
                    self._state = S_SELF_CLOSING_START_TAG
                elif c == ">":
                    self._emit_current_token()
                    self._state = S_DATA
                elif is_ascii_upper_alpha(c):
                    self._current_token.tag.name += to_lower(c)
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._current_token.tag.name += REPLACEMENT_CHARACTER
                elif c is EOF:
                    self._parse_error("eof-in-tag")
                    self._emit_eof()
                else:
                    self._current_token.tag.name += c
            # ---------------- RCDATA/RAWTEXT/script end tags ----------------
            elif st == S_RCDATA_LT:  # :159-168
                self._consume()
                if self._cur == "/":
                    self._temp = []
                    self._state = S_RCDATA_END_TAG_OPEN
                else:
                    self._emit_chars("<")
                    self._reconsume(S_RCDATA)
            elif st == S_RCDATA_END_TAG_OPEN:  # :169-179
                self._consume()
                if is_ascii_alpha(self._cur):
                    self._current_token = Token(END_TAG, tag=Tag())
                    self._reconsume(S_RCDATA_END_TAG_NAME)
                else:
                    self._emit_chars("</")
                    self._reconsume(S_RCDATA)
            elif st in (S_RCDATA_END_TAG_NAME, S_RAWTEXT_END_TAG_NAME, S_SD_END_TAG_NAME):
                # :180-223 / :244-287 / :313-356 (identical bodies)
                back = {S_RCDATA_END_TAG_NAME: S_RCDATA,
                        S_RAWTEXT_END_TAG_NAME: S_RAWTEXT,
                        S_SD_END_TAG_NAME: S_SCRIPT_DATA}[st]
                self._consume()
                c = self._cur
                if is_white_space(c) and self._is_appropriate_end_tag():
                    self._state = S_BEFORE_ATTR_NAME
                    continue
                if c == "/" and self._is_appropriate_end_tag():
                    self._state = S_SELF_CLOSING_START_TAG
                    continue
                if c == ">" and self._is_appropriate_end_tag():
                    self._state = S_DATA
                    self._emit_current_token()
                    continue
                if is_ascii_upper_alpha(c):
                    self._current_token.tag.name += to_lower(c)
                    self._temp.append(c)
                    continue
                if is_ascii_lower_alpha(c):
                    self._current_token.tag.name += c
                    self._temp.append(c)
                    continue
                # anything else (:216-222)
                self._emit_chars("</" + "".join(self._temp))
                self._reconsume(back)
            elif st == S_RAWTEXT_LT:  # :224-233
                self._consume()
                if self._cur == "/":
                    self._temp = []
                    self._state = S_RAWTEXT_END_TAG_OPEN
                else:
                    self._emit_chars("<")
                    self._reconsume(S_RAWTEXT)
            elif st == S_RAWTEXT_END_TAG_OPEN:  # :234-243
                self._consume()
                if is_ascii_alpha(self._cur):
                    self._current_token = Token(END_TAG, tag=Tag())
                    self._reconsume(S_RAWTEXT_END_TAG_NAME)
                else:
                    self._emit_chars("</")
                    self._reconsume(S_RAWTEXT)
            elif st == S_SD_LT:  # :288-301
                self._consume()
                c = self._cur
                if c == "/":
                    self._temp = []
                    self._state = S_SD_END_TAG_OPEN
                elif c == "!":
                    self._state = S_SD_ESCAPE_START
                    self._emit_chars("<!")
                else:
                    self._emit_chars("<")
                    self._reconsume(S_SCRIPT_DATA)
            elif st == S_SD_END_TAG_OPEN:  # :302-312
                self._consume()
                if is_ascii_alpha(self._cur):
                    self._current_token = Token(END_TAG, tag=Tag())
                    self._reconsume(S_SD_END_TAG_NAME)
                else:
                    self._emit_chars("</")
                    self._reconsume(S_SCRIPT_DATA)
            elif st == S_SD_ESCAPE_START:  # :357-365
                self._consume()
                if self._cur == "-":
                    self._state = S_SD_ESCAPE_START_DASH
                    self._emit_chars("-")
                else:
                    self._reconsume(S_SCRIPT_DATA)
            elif st == S_SD_ESCAPE_START_DASH:  # :366-374
                self._consume()
                if self._cur == "-":
                    self._state = S_SD_ESCAPE_DASH_DASH
                    self._emit_chars("-")
                else:
                    self._reconsume(S_SCRIPT_DATA)
            elif st == S_SD_ESCAPED:  # :375-391
                if fast:
                    m = _RX_SD_ESCAPED.match(inp, self._cursor)
                    if m:
                        self._cursor = m.end()
                        self._emit_chars(m.group())
                        continue
                self._consume()
                c = self._cur
                if c == "-":
                    self._state = S_SD_ESCAPE_DASH
                    self._emit_chars("-")
                elif c == "<":
                    self._state = S_SD_ESCAPED_LT
                elif c == NUL:  # Q7: NUL emits EOF token (truncation)
                    self._parse_error("unexpected-null-character")
                    self._emit_eof()
                elif c is EOF:
                    self._parse_error("eof-in-script-html-comment-like-text")
                    self._emit_eof()
                else:
                    self._emit_chars(c)
            elif st == S_SD_ESCAPE_DASH:  # :392-409
                self._consume()
                c = self._cur
                if c == "-":
                    self._state = S_SD_ESCAPE_DASH_DASH
                    self._emit_chars("-")
                elif c == "<":
                    self._state = S_SD_ESCAPED_LT
                elif c == NUL:
                    self._parse_error("eof-in-html-comment-like-text")  # wrong code kept (:400)
                    self._emit_eof()
                elif c is EOF:
                    self._parse_error("eof-in-script-html-comment-like-text")
                    self._emit_eof()
                else:
                    self._state = S_SD_ESCAPED
                    self._emit_chars(c)
            elif st == S_SD_ESCAPE_DASH_DASH:  # :410-430
                self._consume()
                c = self._cur
                if c == "-":
                    self._emit_chars("-")
                elif c == "<":
                    self._state = S_SD_ESCAPED_LT
                elif c == ">":
                    self._state = S_SCRIPT_DATA
                    self._emit_chars(">")
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._state = S_SD_ESCAPED
                    self._emit_chars(REPLACEMENT_CHARACTER)
                elif c is EOF:
                    self._parse_error("eof-in-html-comment-like-text")
                    self._emit_eof()
                else:
                    self._state = S_SD_ESCAPED
                    self._emit_chars(c)
            elif st == S_SD_ESCAPED_LT:  # :431-444 — NB '/' routes to the
                # PLAIN ScriptDataEndTagOpen (:433-435), so the Escaped end-tag
                # states below are unreachable (SURVEY.md T4)
                self._consume()
                c = self._cur
                if c == "/":
                    self._temp = []
                    self._state = S_SD_END_TAG_OPEN
                elif is_ascii_alpha(c):
                    self._temp = []
                    self._emit_chars("<")
                    self._reconsume(S_SD_DOUBLE_ESCAPE_START)
                else:
                    self._emit_chars("<")
                    self._reconsume(S_SD_ESCAPED)
            elif st == S_SD_ESCAPED_END_TAG_OPEN:  # :445-455 (unreachable)
                self._consume()
                if is_ascii_alpha(self._cur):
                    self._current_token = Token(END_TAG, tag=Tag())
                    self._reconsume(S_SD_ESCAPED_END_TAG_NAME)
                else:
                    self._emit_chars("</")
                    self._reconsume(S_SD_ESCAPED)
            elif st == S_SD_ESCAPED_END_TAG_NAME:  # :456-498 (unreachable;
                # missing consume kept — operates on the stale current char)
                c = self._cur
                if is_white_space(c) and self._is_appropriate_end_tag():
                    self._state = S_BEFORE_ATTR_NAME
                    continue
                if c == "/" and self._is_appropriate_end_tag():
                    self._state = S_SELF_CLOSING_START_TAG
                    continue
                if c == ">" and self._is_appropriate_end_tag():
                    self._state = S_DATA
                    self._emit_current_token()
                    continue
                if is_ascii_upper_alpha(c):
                    self._current_token.tag.name += to_lower(c)
                    self._temp.append(c)
                    continue
                if is_ascii_lower_alpha(c):
                    self._current_token.tag.name += c
                    self._temp.append(c)
                    continue
                self._emit_chars("</" + "".join(self._temp))
                self._reconsume(S_SD_ESCAPED)
            elif st == S_SD_DOUBLE_ESCAPE_START:  # :499-518
                self._consume()
                c = self._cur
                if is_white_space(c) or c == "/" or c == ">":
                    if "".join(self._temp) == "script":
                        self._state = S_SD_DOUBLE_ESCAPED
                    else:
                        self._state = S_SD_ESCAPED
                        self._emit_chars(c)
                elif is_ascii_upper_alpha(c):
                    self._temp.append(to_lower(c))
                    self._emit_chars(c)
                elif is_ascii_lower_alpha(c):
                    self._temp.append(c)
                    self._emit_chars(c)
                else:
                    self._reconsume(S_SD_ESCAPED)
            elif st == S_SD_DOUBLE_ESCAPED:  # :519-536
                if fast:
                    m = _RX_SD_ESCAPED.match(inp, self._cursor)
                    if m:
                        self._cursor = m.end()
                        self._emit_chars(m.group())
                        continue
                self._consume()
                c = self._cur
                if c == "-":
                    self._state = S_SD_DOUBLE_ESCAPED_DASH
                    self._emit_chars("-")
                elif c == "<":
                    self._state = S_SD_DOUBLE_ESCAPED_LT
                    self._emit_chars("<")
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._emit_chars(REPLACEMENT_CHARACTER)
                elif c is EOF:
                    self._parse_error("eof-in-html-comment-like-text")
                    self._emit_eof()
                else:
                    self._emit_chars(c)
            elif st == S_SD_DOUBLE_ESCAPED_DASH:  # :537-556
                self._consume()
                c = self._cur
                if c == "-":
                    self._state = S_SD_DOUBLE_ESCAPED_DASH_DASH
                    self._emit_chars("-")
                elif c == "<":
                    self._state = S_SD_DOUBLE_ESCAPED_LT
                    self._emit_chars("<")
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._state = S_SD_DOUBLE_ESCAPED
                    self._emit_chars(REPLACEMENT_CHARACTER)
                elif c is EOF:
                    self._parse_error("eof-in-html-comment-like-text")
                    self._emit_eof()
                else:
                    self._state = S_SD_DOUBLE_ESCAPED
                    self._emit_chars(c)
            elif st == S_SD_DOUBLE_ESCAPED_DASH_DASH:  # :557-578
                self._consume()
                c = self._cur
                if c == "-":
                    self._emit_chars("-")
                elif c == "<":
                    self._state = S_SD_DOUBLE_ESCAPED_LT
                    self._emit_chars("<")
                elif c == ">":
                    self._state = S_SCRIPT_DATA
                    self._emit_chars(">")
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._state = S_SD_DOUBLE_ESCAPED
                    self._emit_chars(REPLACEMENT_CHARACTER)
                elif c is EOF:
                    self._parse_error("eof-in-html-comment-like-text")
                    self._emit_eof()
                else:
                    self._state = S_SD_DOUBLE_ESCAPED
                    self._emit_chars(c)
            elif st == S_SD_DOUBLE_ESCAPED_LT:  # :579-588
                self._consume()
                if self._cur == "/":
                    self._temp = []
                    self._state = S_SD_DOUBLE_ESCAPED_END
                    self._emit_chars("/")
                else:
                    self._reconsume(S_SD_DOUBLE_ESCAPED)
            elif st == S_SD_DOUBLE_ESCAPED_END:  # :589-608
                self._consume()
                c = self._cur
                if is_white_space(c) or c == "/" or c == ">":
                    if "".join(self._temp) == "script":
                        self._state = S_SD_ESCAPED
                    else:
                        self._state = S_SD_DOUBLE_ESCAPED
                        self._emit_chars(c)
                elif is_ascii_upper_alpha(c):
                    self._temp.append(to_lower(c))
                    self._emit_chars(c)
                elif is_ascii_lower_alpha(c):
                    self._temp.append(c)
                    self._emit_chars(c)
                else:
                    self._reconsume(S_SD_DOUBLE_ESCAPED)
            # ---------------- attributes ----------------
            elif st == S_BEFORE_ATTR_NAME:  # :609-624
                self._consume()
                c = self._cur
                if is_white_space(c):
                    pass
                elif c == "/" or c == ">" or c is EOF:
                    self._reconsume(S_AFTER_ATTR_NAME)
                elif c == "=":
                    # wrong error code kept (:615); attribute named "=" (:617)
                    self._parse_error("unexpected-question-mark-instead-of-tag-name")
                    self._current_token.tag.start_new_attribute("=", "")
                    self._state = S_ATTR_NAME
                else:
                    self._current_token.tag.start_new_attribute()
                    self._reconsume(S_ATTR_NAME)
            elif st == S_ATTR_NAME:  # :625-646 — NO duplicate drop (Q17)
                if fast:
                    m = _RX_ATTR_NAME.match(inp, self._cursor)
                    if m:
                        self._current_token.tag.attributes[-1][0] += m.group()
                        self._cursor = m.end()
                        continue
                self._consume()
                c = self._cur
                if is_white_space(c) or c == "/" or c == ">" or c is EOF:
                    self._reconsume(S_AFTER_ATTR_NAME)
                elif c == "=":
                    self._state = S_BEFORE_ATTR_VALUE
                elif is_ascii_upper_alpha(c):
                    self._current_token.tag.append_to_current_attribute_name(to_lower(c))
                elif c == NUL:
                    self._parse_error("unexpected-question-mark-instead-of-tag-name")  # wrong code kept (:635)
                    self._current_token.tag.append_to_current_attribute_name(REPLACEMENT_CHARACTER)
                else:
                    if c == '"' or c == "'" or c == "<":
                        self._parse_error("unexpected-character-in-attribute-name")
                    self._current_token.tag.append_to_current_attribute_name(c)
            elif st == S_AFTER_ATTR_NAME:  # :647-666
                self._consume()
                c = self._cur
                if is_white_space(c):
                    pass
                elif c == "/":
                    self._state = S_SELF_CLOSING_START_TAG
                elif c == "=":
                    self._state = S_BEFORE_ATTR_VALUE
                elif c == ">":
                    self._state = S_DATA
                    self._emit_current_token()
                elif c is EOF:
                    self._parse_error("eof-in-tag")
                    self._emit_eof()
                else:
                    self._current_token.tag.start_new_attribute()
                    self._reconsume(S_ATTR_NAME)
            elif st == S_BEFORE_ATTR_VALUE:  # :667-682
                self._consume()
                c = self._cur
                if is_white_space(c):
                    pass
                elif c == '"':
                    self._state = S_ATTR_VALUE_DQ
                elif c == "'":
                    self._state = S_ATTR_VALUE_SQ
                elif c == ">":
                    self._parse_error("missing-attribute-value")
                    self._state = S_DATA
                    self._emit_current_token()
                else:
                    self._reconsume(S_ATTR_VALUE_UNQ)
            elif st == S_ATTR_VALUE_DQ:  # :683-701
                if fast:
                    m = _RX_ATTR_VALUE_DQ.match(inp, self._cursor)
                    if m:
                        self._current_token.tag.append_to_current_attribute_value(m.group())
                        self._cursor = m.end()
                        continue
                self._consume()
                c = self._cur
                if c == '"':
                    self._state = S_AFTER_ATTR_VALUE_QUOTED
                elif c == "&":
                    self._return_state = S_ATTR_VALUE_DQ
                    self._state = S_CHARACTER_REFERENCE
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._current_token.tag.append_to_current_attribute_value(REPLACEMENT_CHARACTER)
                elif c is EOF:
                    self._parse_error("eof-in-tag")
                    self._emit_eof()
                else:
                    self._current_token.tag.append_to_current_attribute_value(c)
            elif st == S_ATTR_VALUE_SQ:  # :702-720
                if fast:
                    m = _RX_ATTR_VALUE_SQ.match(inp, self._cursor)
                    if m:
                        self._current_token.tag.append_to_current_attribute_value(m.group())
                        self._cursor = m.end()
                        continue
                self._consume()
                c = self._cur
                if c == "'":
                    self._state = S_AFTER_ATTR_VALUE_QUOTED
                elif c == "&":
                    self._return_state = S_ATTR_VALUE_SQ
                    self._state = S_CHARACTER_REFERENCE
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._current_token.tag.append_to_current_attribute_value(REPLACEMENT_CHARACTER)
                elif c is EOF:
                    self._parse_error("eof-in-tag")
                    self._emit_eof()
                else:
                    self._current_token.tag.append_to_current_attribute_value(c)
            elif st == S_ATTR_VALUE_UNQ:  # :721-746
                if fast:
                    m = _RX_ATTR_VALUE_UNQ.match(inp, self._cursor)
                    if m:
                        self._current_token.tag.append_to_current_attribute_value(m.group())
                        self._cursor = m.end()
                        continue
                self._consume()
                c = self._cur
                if is_white_space(c):
                    self._state = S_BEFORE_ATTR_NAME
                elif c == "&":
                    self._return_state = S_ATTR_VALUE_UNQ
                    self._state = S_CHARACTER_REFERENCE
                elif c == ">":
                    self._state = S_DATA
                    self._emit_current_token()
                elif c == NUL:
                    self._parse_error("unexpected-character-in-attribute-name")  # wrong code kept (:733)
                    self._current_token.tag.append_to_current_attribute_value(REPLACEMENT_CHARACTER)
                elif c in ('"', "'", "<", "=", "`"):  # Q6: truncates the parse
                    self._parse_error("unexpected-character-in-attribute-name")
                    self._emit_eof()
                elif c is EOF:
                    self._parse_error("eof-in-tag")
                    self._emit_eof()
                else:
                    self._current_token.tag.append_to_current_attribute_value(c)
            elif st == S_AFTER_ATTR_VALUE_QUOTED:  # :747-764
                self._consume()
                c = self._cur
                if is_white_space(c):
                    self._state = S_BEFORE_ATTR_NAME
                elif c == "/":
                    self._state = S_SELF_CLOSING_START_TAG
                elif c == ">":
                    self._state = S_DATA
                    self._emit_current_token()
                elif c is EOF:
                    self._parse_error("eof-in-tag")
                    self._emit_eof()
                else:
                    self._parse_error("missing-whitespace-between-attributes")
                    self._reconsume(S_BEFORE_ATTR_NAME)
            elif st == S_SELF_CLOSING_START_TAG:  # :765-772 — Q1: token is
                # NEVER emitted; non-'>' chars swallowed; EOF loops forever in
                # C# → deterministic error here (SURVEY.md §2.5.1)
                self._consume()
                c = self._cur
                if c == ">":
                    self._current_token.tag.self_closing = True
                    self._state = S_DATA
                elif c is EOF:
                    raise KernelError("err:selfclosing-eof")
            # ---------------- comments ----------------
            elif st == S_BOGUS_COMMENT:  # :773-788 — '>' DROPS the token (Q18)
                if fast:
                    tok = self._current_token
                    if tok is not None and tok.t == COMMENT:
                        m = _RX_BOGUS_COMMENT.match(inp, self._cursor)
                        if m:
                            tok.data += m.group()
                            self._cursor = m.end()
                            continue
                self._consume()
                c = self._cur
                if c == ">":
                    self._state = S_DATA
                elif c is EOF:
                    self._emit_current_token()
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    tok = self._current_token
                    if tok.data is None or tok.t != COMMENT:
                        # DOCTYPE token routed here via :1286 — comment field
                        # is null in C# → NullReferenceException
                        raise KernelError("err:null-ref:bogus-comment")
                    tok.data += REPLACEMENT_CHARACTER
                else:
                    tok = self._current_token
                    if tok.t != COMMENT:
                        raise KernelError("err:null-ref:bogus-comment")
                    tok.data += c
            elif st == S_MARKUP_DECLARATION_OPEN:  # :789-810 — no consume
                # first; try_consume is EXACT-case (Q2)
                if self._try_consume("--"):
                    self._current_token = Token(COMMENT, data="")
                    self._state = S_COMMENT_START
                elif self._try_consume("DOCTYPE"):
                    self._state = S_DOCTYPE
                elif self._try_consume("[CDATA["):
                    self._parse_error("cdata-in-html-content")
                    self._current_token = Token(COMMENT, data="[CDATA[")
                    self._state = S_BOGUS_COMMENT
                else:
                    self._parse_error("incorrectly-opened-comment")
                    self._current_token = Token(COMMENT, data="")
                    self._state = S_BOGUS_COMMENT
            elif st == S_COMMENT_START:  # :811-823
                self._consume()
                c = self._cur
                if c == "-":
                    self._state = S_COMMENT_START_DASH
                elif c == ">":
                    self._parse_error("abrupt-closing-of-empty-comment")
                    self._state = S_DATA
                    self._emit_current_token()
                else:
                    self._reconsume(S_COMMENT)
            elif st == S_COMMENT_START_DASH:  # :824-843
                self._consume()
                c = self._cur
                if c == "-":
                    self._state = S_COMMENT_END
                elif c == ">":
                    self._parse_error("abrupt-closing-of-empty-comment")
                    self._state = S_DATA
                    self._emit_current_token()
                elif c is EOF:
                    self._parse_error("eof-in-comment")
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._current_token.data += "-"
                    self._reconsume(S_COMMENT)
            elif st == S_COMMENT:  # :844-865
                if fast:
                    m = _RX_COMMENT.match(inp, self._cursor)
                    if m:
                        self._current_token.data += m.group()
                        self._cursor = m.end()
                        continue
                self._consume()
                c = self._cur
                if c == "<":
                    self._current_token.data += c
                    self._state = S_COMMENT_LT
                elif c == "-":
                    self._state = S_COMMENT_END_DASH
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._current_token.data += REPLACEMENT_CHARACTER
                elif c is EOF:
                    self._parse_error("eof-in-comment")
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._current_token.data += c
            elif st == S_COMMENT_LT:  # :866-878
                self._consume()
                c = self._cur
                if c == "!":
                    self._current_token.data += c
                    self._state = S_COMMENT_LT_BANG
                elif c == "<":
                    self._current_token.data += c
                else:
                    self._reconsume(S_COMMENT)
            elif st == S_COMMENT_LT_BANG:  # :879-886
                self._consume()
                if self._cur == "-":
                    self._state = S_COMMENT_LT_BANG_DASH
                else:
                    self._reconsume(S_COMMENT_END_DASH)
            elif st == S_COMMENT_LT_BANG_DASH:  # :887-894
                self._consume()
                if self._cur == "-":
                    self._state = S_COMMENT_LT_BANG_DASH_DASH
                else:
                    self._reconsume(S_COMMENT_END_DASH)
            elif st == S_COMMENT_LT_BANG_DASH_DASH:  # :895-903
                self._consume()
                c = self._cur
                if c == ">" or c is EOF:
                    self._reconsume(S_COMMENT_END)
                else:
                    self._parse_error("nested-comment")
                    self._reconsume(S_COMMENT_END)
            elif st == S_COMMENT_END_DASH:  # :904-918
                self._consume()
                c = self._cur
                if c == "-":
                    self._state = S_COMMENT_END
                elif c is EOF:
                    self._parse_error("eof-in-comment")
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._current_token.data += "-"
                    self._reconsume(S_COMMENT)
            elif st == S_COMMENT_END:  # :919-940
                self._consume()
                c = self._cur
                if c == ">":
                    self._state = S_DATA
                    self._emit_current_token()
                elif c == "!":
                    self._state = S_COMMENT_END_BANG
                elif c == "-":
                    self._current_token.data += "-"
                elif c is EOF:
                    self._parse_error("eof-in-comment")
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._current_token.data += "-"
                    self._reconsume(S_COMMENT)
            elif st == S_COMMENT_END_BANG:  # :941-962
                self._consume()
                c = self._cur
                if c == "-":
                    self._current_token.data += "--!"
                    self._state = S_COMMENT_END
                elif c == ">":
                    self._parse_error("incorrectly-closed-comment")
                    self._state = S_DATA
                    self._emit_current_token()
                elif c is EOF:
                    self._parse_error("eof-in-comment")
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._current_token.data += "--!"
                    self._reconsume(S_COMMENT)
            # ---------------- DOCTYPE ----------------
            elif st == S_DOCTYPE:  # :963-979
                self._consume()
                c = self._cur
                if is_white_space(c):
                    self._state = S_BEFORE_DOCTYPE_NAME
                elif c == ">":
                    self._reconsume(S_BEFORE_DOCTYPE_NAME)
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token = Token(DOCTYPE, doctype=Doctype())
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._parse_error("missing-whitespace-before-doctype-name")
                    self._reconsume(S_BEFORE_DOCTYPE_NAME)
            elif st == S_BEFORE_DOCTYPE_NAME:  # :980-1005
                self._consume()
                c = self._cur
                if is_white_space(c):
                    pass
                elif is_ascii_upper_alpha(c):
                    self._current_token = Token(DOCTYPE, doctype=Doctype())
                    self._current_token.doctype.name += to_lower(c)  # Q12
                    self._state = S_DOCTYPE_NAME
                elif c is EOF:
                    self._parse_error("unexpected-null-character")  # wrong code kept (:989)
                    self._current_token = Token(DOCTYPE, doctype=Doctype())
                    self._current_token.doctype.name += REPLACEMENT_CHARACTER
                    self._emit_current_token()  # NB: no EOF token, no state change (:988-992)
                elif c == ">":
                    self._parse_error("missing-doctype-name")
                    self._current_token = Token(DOCTYPE, doctype=Doctype())
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._state = S_DATA
                else:
                    self._current_token = Token(DOCTYPE, doctype=Doctype())
                    self._current_token.doctype.name += c
                    self._state = S_DOCTYPE_NAME
            elif st == S_DOCTYPE_NAME:  # :1006-1031
                self._consume()
                c = self._cur
                if is_white_space(c):
                    self._state = S_AFTER_DOCTYPE_NAME
                elif c == ">":
                    self._state = S_DATA
                    self._emit_current_token()
                elif is_ascii_upper_alpha(c):
                    self._current_token.doctype.name += c  # verbatim! (Q12, :1014-1016)
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._current_token.doctype.name += REPLACEMENT_CHARACTER
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token = Token(DOCTYPE, doctype=Doctype())
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._current_token.doctype.name += c
            elif st == S_AFTER_DOCTYPE_NAME:  # :1032-1057 — NB try_consume
                # peeks AFTER the already-consumed char, so "PUBLIC"/"SYSTEM"
                # only match doubled-first-letter input ("PPUBLIC"); normal
                # doctypes with ids go to BogusDOCTYPE instead
                self._consume()
                c = self._cur
                if is_white_space(c):
                    pass
                elif c == ">":
                    self._emit_current_token()
                    self._state = S_DATA
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    if self._try_consume("PUBLIC"):
                        self._state = S_AFTER_DOCTYPE_PUBLIC_KEYWORD
                    elif self._try_consume("SYSTEM"):
                        self._state = S_AFTER_DOCTYPE_SYSTEM_KEYWORD
                    else:
                        self._parse_error("invalid-character-sequence-after-doctype-name")
                        self._current_token.doctype.force_quirks = True
                        self._reconsume(S_BOGUS_DOCTYPE)
            elif st == S_AFTER_DOCTYPE_PUBLIC_KEYWORD:  # :1058-1085 — NB no
                # anything-else branch: other chars are silently consumed
                self._consume()
                c = self._cur
                if is_white_space(c):
                    self._state = S_BEFORE_DOCTYPE_PUBLIC_ID
                elif c == '"':
                    self._parse_error("missing-whitespace-after-doctype-public-keyword")
                    self._current_token.doctype.public_identifier = ""
                    self._state = S_DOCTYPE_PUBLIC_ID_DQ
                elif c == "'":
                    self._parse_error("missing-whitespace-after-doctype-public-keyword")
                    self._current_token.doctype.public_identifier = ""
                    self._state = S_DOCTYPE_PUBLIC_ID_SQ
                elif c == ">":
                    self._parse_error("missing-doctype-public-identifier")
                    self._current_token.doctype.force_quirks = True
                    self._state = S_DATA
                    self._emit_current_token()
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
            elif st == S_BEFORE_DOCTYPE_PUBLIC_ID:  # :1086-1115
                self._consume()
                c = self._cur
                if is_white_space(c):
                    pass
                elif c == '"':
                    self._current_token.doctype.public_identifier = ""
                    self._state = S_DOCTYPE_PUBLIC_ID_DQ
                elif c == "'":
                    self._current_token.doctype.public_identifier = ""
                    self._state = S_DOCTYPE_PUBLIC_ID_SQ
                elif c == ">":
                    self._parse_error("missing-doctype-public-identifier")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()  # NB: emits EOF without state change (:1097-1102)
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._parse_error("missing-quote-before-doctype-public-identifier")
                    self._current_token.doctype.force_quirks = True
                    self._reconsume(S_BOGUS_DOCTYPE)
            elif st == S_DOCTYPE_PUBLIC_ID_DQ:  # :1116-1140
                self._consume()
                c = self._cur
                if c == '"':
                    self._state = S_AFTER_DOCTYPE_PUBLIC_ID
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._current_token.doctype.public_identifier += REPLACEMENT_CHARACTER
                elif c == ">":
                    self._parse_error("abrupt-doctype-public-identifier")
                    self._current_token.doctype.force_quirks = True
                    self._state = S_DATA
                    self._emit_current_token()
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._current_token.doctype.public_identifier += c
            elif st == S_DOCTYPE_PUBLIC_ID_SQ:  # :1141-1165
                self._consume()
                c = self._cur
                if c == "'":
                    self._state = S_AFTER_DOCTYPE_PUBLIC_ID
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._current_token.doctype.public_identifier += REPLACEMENT_CHARACTER
                elif c == ">":
                    self._parse_error("abrupt-doctype-public-identifier")
                    self._current_token.doctype.force_quirks = True
                    self._state = S_DATA
                    self._emit_current_token()
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._current_token.doctype.public_identifier += c
            elif st == S_AFTER_DOCTYPE_PUBLIC_ID:  # :1166-1196
                self._consume()
                c = self._cur
                if is_white_space(c):
                    self._state = S_BETWEEN_DOCTYPE_PUBLIC_SYSTEM
                elif c == ">":
                    self._state = S_DATA
                    self._emit_current_token()
                elif c == '"':
                    self._parse_error("missing-whitespace-between-doctype-public-and-system-identifiers")
                    self._current_token.doctype.system_identifier = ""
                    self._state = S_DOCTYPE_SYSTEM_ID_DQ
                elif c == "'":
                    self._parse_error("missing-whitespace-between-doctype-public-and-system-identifiers")
                    self._current_token.doctype.system_identifier = ""
                    self._state = S_DOCTYPE_SYSTEM_ID_SQ
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._parse_error("missing-quote-before-doctype-system-identifier")
                    self._current_token.doctype.force_quirks = True
                    self._reconsume(S_BOGUS_DOCTYPE)
            elif st == S_BETWEEN_DOCTYPE_PUBLIC_SYSTEM:  # :1197-1225
                self._consume()
                c = self._cur
                if is_white_space(c):
                    pass
                elif c == ">":
                    self._state = S_DATA
                    self._emit_current_token()
                elif c == '"':
                    self._current_token.doctype.system_identifier = ""
                    self._state = S_DOCTYPE_SYSTEM_ID_DQ
                elif c == "'":
                    self._current_token.doctype.system_identifier = ""
                    self._state = S_DOCTYPE_SYSTEM_ID_SQ
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._parse_error("missing-quote-before-doctype-system-identifier")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()  # NB: emits BEFORE bogus (:1222)
                    self._reconsume(S_BOGUS_DOCTYPE)
            elif st == S_AFTER_DOCTYPE_SYSTEM_KEYWORD:  # :1226-1258
                self._consume()
                c = self._cur
                if is_white_space(c):
                    self._state = S_BEFORE_DOCTYPE_SYSTEM_ID
                elif c == '"':
                    self._parse_error("missing-whitespace-after-doctype-system-keyword")
                    self._current_token.doctype.system_identifier = ""
                    self._state = S_DOCTYPE_SYSTEM_ID_DQ
                elif c == "'":
                    self._parse_error("missing-whitespace-after-doctype-system-keyword")
                    self._current_token.doctype.system_identifier = ""
                    self._state = S_DOCTYPE_SYSTEM_ID_SQ
                elif c == ">":
                    self._parse_error("missing-doctype-system-identifier")
                    self._current_token.doctype.force_quirks = True
                    self._state = S_DATA
                    self._emit_current_token()
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._parse_error("missing-doctype-system-identifier")
                    self._current_token.doctype.force_quirks = True
                    self._reconsume(S_BOGUS_DOCTYPE)
            elif st == S_BEFORE_DOCTYPE_SYSTEM_ID:  # :1259-1288
                self._consume()
                c = self._cur
                if is_white_space(c):
                    pass
                elif c == '"':
                    self._current_token.doctype.system_identifier = ""
                    self._state = S_DOCTYPE_SYSTEM_ID_DQ
                elif c == "'":
                    self._current_token.doctype.system_identifier = ""
                    self._state = S_DOCTYPE_SYSTEM_ID_SQ
                elif c == ">":
                    self._parse_error("missing-doctype-system-identifier")
                    self._current_token.doctype.force_quirks = True
                    self._state = S_DATA
                    self._emit_current_token()
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._parse_error("missing-quote-before-doctype-system-identifier")
                    self._current_token.doctype.force_quirks = True
                    self._reconsume(S_BOGUS_COMMENT)  # NB: BogusComment, not
                    # BogusDOCTYPE (:1286) → null-ref crash on next char
            elif st == S_DOCTYPE_SYSTEM_ID_DQ:  # :1289-1313
                self._consume()
                c = self._cur
                if c == '"':
                    self._state = S_AFTER_DOCTYPE_SYSTEM_ID
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._current_token.doctype.system_identifier += REPLACEMENT_CHARACTER
                elif c == ">":
                    self._parse_error("abrupt-doctype-public-identifier")  # wrong code kept (:1298)
                    self._current_token.doctype.force_quirks = True
                    self._state = S_DATA
                    self._emit_current_token()
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._current_token.doctype.system_identifier += c
            elif st == S_DOCTYPE_SYSTEM_ID_SQ:  # :1314-1338
                self._consume()
                c = self._cur
                if c == "'":
                    self._state = S_AFTER_DOCTYPE_SYSTEM_ID
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                    self._current_token.doctype.system_identifier += REPLACEMENT_CHARACTER
                elif c == ">":
                    self._parse_error("abrupt-doctype-public-identifier")  # wrong code kept (:1323)
                    self._current_token.doctype.force_quirks = True
                    self._state = S_DATA
                    self._emit_current_token()
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._current_token.doctype.system_identifier += c
            elif st == S_AFTER_DOCTYPE_SYSTEM_ID:  # :1339-1356
                self._consume()
                c = self._cur
                if is_white_space(c):
                    pass
                elif c == ">":
                    self._state = S_DATA
                    self._emit_current_token()
                elif c is EOF:
                    self._parse_error("eof-in-doctype")
                    self._current_token.doctype.force_quirks = True
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    self._parse_error("unexpected-character-after-doctype-system-identifier")
                    self._reconsume(S_BOGUS_DOCTYPE)
            elif st == S_BOGUS_DOCTYPE:  # :1357-1371
                self._consume()
                c = self._cur
                if c == ">":
                    self._state = S_DATA
                    self._emit_current_token()  # may emit None if token was
                    # already emitted (:1222) → parser null-token crash
                elif c == NUL:
                    self._parse_error("unexpected-null-character")
                elif c is EOF:
                    self._emit_current_token()
                    self._emit_eof()
                else:
                    pass
            # ---------------- CDATA (unreachable: T8 never routes here) -----
            elif st == S_CDATA_SECTION:  # :1372-1382
                self._consume()
                c = self._cur
                if c == "!":
                    self._state = S_CDATA_SECTION_BRACKET
                elif c is EOF:
                    self._parse_error("eof-in-cdata")
                    self._emit_eof()
                else:
                    self._emit_chars(c)
            elif st == S_CDATA_SECTION_BRACKET:  # :1383-1391
                self._consume()
                if self._cur == "]":
                    self._state = S_CDATA_SECTION_END
                else:
                    self._emit_chars("]")
                    self._reconsume(S_CDATA_SECTION)
            elif st == S_CDATA_SECTION_END:  # :1392-1402
                self._consume()
                c = self._cur
                if c == "]":
                    self._emit_chars("]")
                elif c == ">":
                    self._state = S_DATA
                else:
                    self._emit_chars("]")
                    self._reconsume(S_CDATA_SECTION)
            # ---------------- character references ----------------
            elif st == S_CHARACTER_REFERENCE:  # :1403-1415
                self._temp = ["&"]
                self._consume()
                c = self._cur
                if is_ascii_alphanumeric(c):
                    self._reconsume(S_NAMED_CHARACTER_REFERENCE)
                elif c == "#":
                    self._temp.append(c)
                    self._state = S_NUMERIC_CHARACTER_REFERENCE
                else:
                    self._flush_charref()
                    self._reconsume(self._return_state)
            elif st == S_NAMED_CHARACTER_REFERENCE:  # :1416-1435
                name = self._consume_named_charref()
                if name is not None:
                    nxt = self._next_input_character()
                    if (self._charref_in_attribute() and name[-1] != ";" and
                            (nxt == "=" or is_ascii_alphanumeric(nxt))):
                        self._flush_charref()  # flush "&name" verbatim
                        self._state = self._return_state
                    else:
                        if name[-1] != ";":
                            self._parse_error("missing-semicolon-after-character-reference")
                        self._temp = [NAMED_REFERENCES[name]]  # REPLACES buffer (:1427)
                        self._flush_charref()
                        self._state = self._return_state
                else:
                    self._flush_charref()
                    self._state = S_AMBIGUOUS_AMPERSAND
            elif st == S_AMBIGUOUS_AMPERSAND:  # :1436-1451
                self._consume()
                c = self._cur
                if is_ascii_alpha(c):  # NB alpha, not alnum (:1438)
                    if self._charref_in_attribute():
                        self._current_token.tag.append_to_current_attribute_value(c)
                    else:
                        self._emit_chars(c)
                elif c == ";":
                    self._parse_error("unknown-named-character-reference")
                    self._reconsume(self._return_state)
                else:
                    self._reconsume(self._return_state)
            elif st == S_NUMERIC_CHARACTER_REFERENCE:  # :1452-1461
                self._charref_code = 0
                self._consume()
                c = self._cur
                if c == "x" or c == "X":
                    self._temp.append(c)
                    self._state = S_HEX_CHARREF_START
                else:
                    self._reconsume(S_DEC_CHARREF_START)
            elif st == S_HEX_CHARREF_START:  # :1462-1471 — broken hex
                # predicate (Q4): only letters qualify
                self._consume()
                if is_ascii_hex_digit(self._cur):
                    self._reconsume(S_HEX_CHARREF)
                else:
                    self._parse_error("absence-of-digits-in-numeric-character-reference")
                    self._flush_charref()
                    self._reconsume(self._return_state)
            elif st == S_DEC_CHARREF_START:  # :1472-1481
                self._consume()
                if is_ascii_digit(self._cur):
                    self._reconsume(S_DEC_CHARREF)
                else:
                    self._parse_error("absence-of-digits-in-numeric-character-reference")
                    self._flush_charref()
                    self._reconsume(self._return_state)
            elif st == S_HEX_CHARREF:  # :1482-1496 — A-F offset applied to
                # lowercase too (Q4: is_ascii_upper_hex_digit matches a-f)
                self._consume()
                c = self._cur
                if is_ascii_digit(c):
                    self._charref_code = self._charref_code * 16 + (ord(c) - 0x30)
                elif is_ascii_upper_hex_digit(c):
                    self._charref_code = self._charref_code * 16 + (ord(c) - 0x37)
                elif is_ascii_lower_hex_digit(c):
                    self._charref_code = self._charref_code * 16 + (ord(c) - 0x57)
                elif c == ";":
                    self._state = S_NUMERIC_CHARREF_END
                else:
                    self._parse_error("missing-semicolon-after-character-reference")
                    self._reconsume(S_NUMERIC_CHARREF_END)
            elif st == S_DEC_CHARREF:  # :1497-1507
                self._consume()
                c = self._cur
                if is_ascii_digit(c):
                    self._charref_code = self._charref_code * 10 + (ord(c) - 0x30)
                elif c == ";":
                    self._state = S_NUMERIC_CHARREF_END
                else:
                    self._parse_error("missing-semicolon-after-character-reference")
                    self._reconsume(S_NUMERIC_CHARREF_END)
            elif st == S_NUMERIC_CHARREF_END:  # :1508-1529 — Q3: the decoded
                # char is never appended (StringBuilder capacity ctor), so
                # numeric refs contribute only error counts
                code = self._charref_code
                if code == 0:
                    self._parse_error("null-character-reference")
                    self._charref_code = 0xFFFD
                elif code > 0x10FFFF:
                    self._parse_error("character-reference-outside-unicode-range")
                    self._charref_code = 0xFFFD
                elif _is_surrogate_cp(code):
                    self._parse_error("surrogate-character-reference")
                    self._charref_code = 0xFFFD
                elif _is_noncharacter_cp(code):
                    self._parse_error("noncharacter-character-reference")
                    self._charref_code = 0xFFFD
                elif code == 0x0D or (_is_control_cp(code) and not _is_ascii_whitespace_cp(code)):
                    self._parse_error("control-character-reference")
                elif code in NUMERIC_REMAP:  # dead in practice (shadowed above)
                    self._charref_code = NUMERIC_REMAP[code]
                self._temp = []  # new StringBuilder((char)code) == capacity ctor → EMPTY
                self._flush_charref()
                self._state = self._return_state
            else:
                raise KernelError("err:unknown-state")
