"""D4 DOM mutation ops (SURVEY.md §2.2): remove/replace/CharacterData edits.

The C# originals are dead code with an always-null parent pointer (see the
NOTE in parser.py); these tests pin OUR functional semantics plus the
transcription bugs the reference would exhibit if its parent pointer worked
(fragment replace throws on ANY non-empty fragment, Q-style identity dedup).
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from htmlparser_spark.kernel.parser import (
    KernelError, Node, create_an_element, new_text,
)


def _tree():
    doc = Node("Document")
    html = create_an_element("html")
    doc.append_child(html)
    body = create_an_element("body")
    html.append_child(body)
    a = create_an_element("div")
    b = new_text("hello")
    c = create_an_element("p")
    body.append_child(a)
    body.append_child(b)
    body.append_child(c)
    return doc, html, body, a, b, c


def test_sibling_navigation():
    _doc, _html, body, a, b, c = _tree()
    assert a.previous_sibling is None
    assert a.next_sibling is b
    assert b.previous_sibling is a
    assert c.next_sibling is None
    assert [n.index for n in (a, b, c)] == [0, 1, 2]


def test_remove_child():
    _doc, _html, body, a, b, c = _tree()
    got = body.remove_child(b)
    assert got is b and b.parent is None
    assert body.children == [a, c]
    with pytest.raises(KernelError, match="not-found"):
        body.remove_child(b)  # no longer a child


def test_replace_child_basic():
    _doc, _html, body, a, b, c = _tree()
    repl = create_an_element("span")
    got = body.replace_child(repl, b)
    assert got is b and b.parent is None
    assert [n.tag_name or n.kind for n in body.children] == ["div", "span", "p"]
    assert repl.parent is body


def test_replace_child_moves_existing_sibling():
    _doc, _html, body, a, b, c = _tree()
    # replacing b with c (already in the tree): c is adopted out of its slot
    body.replace_child(c, b)
    assert body.children == [a, c]


def test_replace_child_wrong_parent_raises():
    _doc, html, body, a, b, c = _tree()
    with pytest.raises(KernelError, match="not-found"):
        html.replace_child(create_an_element("span"), b)  # b is body's child


def test_replace_doc_element_rules():
    doc = Node("Document")
    root = create_an_element("html")
    doc.append_child(root)
    # replacing the document element with another element is allowed
    other = create_an_element("html")
    doc.replace_child(other, root)
    assert doc.children == [other]
    # a non-empty DocumentFragment always throws (transcription bug :171)
    frag = Node("DocumentFragment")
    frag.children.append(create_an_element("div"))
    with pytest.raises(KernelError, match="hierarchy-request"):
        doc.replace_child(frag, other)


def test_characterdata_edits():
    t = new_text("hello world")
    assert t.substring_data(0, 5) == "hello"
    assert t.substring_data(6, 99) == "world"  # over-length clamps (:51-54)
    with pytest.raises(KernelError, match="index-size"):
        t.substring_data(99, 1)
    t.insert_data(5, ",")
    assert t.data == "hello, world"
    t.delete_data(5, 1)
    assert t.data == "hello world"
    t.replace_data(0, 5, "goodbye")
    assert t.data == "goodbye world"
    with pytest.raises(KernelError, match="index-size"):
        t.replace_data(99, 0, "x")
