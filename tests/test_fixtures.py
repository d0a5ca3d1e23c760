"""Replay committed golden fixtures through both kernel modes (FIXTURES.md §2)."""
import json
from pathlib import Path

import pytest

from htmlparser_spark.kernel import parse_html

FIXDIR = Path(__file__).resolve().parent.parent / "fixtures"
CATEGORIES = sorted(p.stem for p in FIXDIR.glob("*.json"))


def load_cases():
    for cat in CATEGORIES:
        for case in json.loads((FIXDIR / f"{cat}.json").read_text()):
            yield pytest.param(case, id=f"{cat}:{case['name']}")


@pytest.mark.parametrize("case", load_cases())
@pytest.mark.parametrize("fast", [True, False], ids=["fast", "slow"])
def test_fixture(case, fast):
    r = parse_html(case["html"], fast=fast)
    exp = case["expect"]
    assert r["status"] == exp["status"]
    assert r["dom_s"] == exp["dom_s"]
    assert r["text"] == exp["text"]
    assert r["title"] == exp["title"]
    assert r["main_text"] == exp["main_text"]
    assert [list(s) for s in r["spans"]] == [list(s) for s in exp["spans"]]
    assert r["errors"] == exp["errors"]
