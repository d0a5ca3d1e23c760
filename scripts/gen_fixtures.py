"""Generate golden parse fixtures (FIXTURES.md §2 categories).

Expected values are produced ONCE by the slow (per-char, faithful) kernel and
committed; tests/test_fixtures.py replays them through both kernel modes.
The quirk-critical cases are independently pinned by hand-derived assertions
in tests/test_kernel_quirks.py — these goldens guard against regressions.

Run: python scripts/gen_fixtures.py
"""
import json
from pathlib import Path

from htmlparser_spark.kernel import parse_html

FIXDIR = Path(__file__).resolve().parent.parent / "fixtures"

CASES = {
    "skeleton": [
        ("full", "<!DOCTYPE html><html><head><title>t</title></head><body>x</body></html>"),
        ("no-doctype", "<html><head></head><body>quirks</body></html>"),
        ("no-head", "<html><body>x</body></html>"),
        ("bare-text-crash", "hello"),
        ("doctype-public-bogus", '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN"><html><body>x'),
        ("doctype-foo-crash", "<!DOCTYPE foo><html>"),
        ("doctype-system", "<!DOCTYPE html SYSTEM 'x'><html><body>y"),
        ("whitespace-everywhere", "  <!DOCTYPE html>\n<html>\n<head>\n</head>\n<body>\nx\n</body>\n</html>\n"),
    ],
    "entities": [
        ("named", "<html><body>&amp;&nbsp;&lt;&gt;"),
        ("named-nosemi", "<html><body>&amp x"),
        ("astral", "<html><body>&Afr;&Bfr;"),
        ("numeric-dec", "<html><body>a&#65;b"),
        ("numeric-hex-digits", "<html><body>a&#x41;b"),
        ("numeric-hex-letters", "<html><body>a&#xff;b"),
        ("numeric-control", "<html><body>a&#128;b"),
        ("numeric-zero", "<html><body>a&#0;b"),
        ("ambiguous", "<html><body>x&noSuch;y"),
        ("attr-suppression", '<html><body y="a&ampb" z="c&amp;d">t'),
        ("bare-amp-mid", "<html><body>a & b"),
    ],
    "malformed_tags": [
        ("self-closing-br", "<html><body>a<br/>b"),
        ("self-closing-meta", "<html><head><meta charset='u'/><title>t</title></head><body>x"),
        ("empty-end", "<html><body>a</>b"),
        ("numeric-tag", "<html><body>a<123>b"),
        ("eq-attr", "<html><body><div =x>t"),
        ("unquoted-quote", '<html><body><div a=b"c>t'),
        ("pi", "<html><body>a<?pi?>b"),
        ("dup-attrs", '<html><body><div a="1" a="2">t'),
        ("swallowed", "<html><body><div/junk>t"),
    ],
    "rawtext_script": [
        ("script-lt", "<html><head><script>a<b</script></head><body>ok"),
        ("script-escape", "<html><head><script><!-- x --></script></head><body>ok"),
        ("script-double-escape", "<html><head><script><!-- <script>y</script> --></script></head><body>ok"),
        ("style", "<html><head><style>p{c:red}</style></head><body>ok"),
        ("title-entity", "<html><head><title>a&amp;b</title></head><body>ok"),
        ("case-close", "<html><head><title>T</tiTLE></head><body>ok"),
        ("unterminated-script", "<html><head><script>var a=1;"),
        ("script-nul", "<html><head><script><!-- a\x00b --></script><body>x"),
    ],
    "misnested": [
        ("ul-li", "<html><body><ul><li>1</li><li>2</li></ul>x"),
        ("p-div", "<html><body><p>a<div>b</div>c"),
        ("b-i-cross", "<html><body><b><i>x</b></i>"),
        ("li-li-drain", "<html><body><ul><li>1<li>2"),
        ("p-p", "<html><body><p>a<p>b"),
        ("button", "<html><body><button>b</button>x"),
    ],
    "head_quirks": [
        ("meta-plain-vs-selfclosed", "<html><head><meta a=1><meta b=2/></head><body>x"),
        ("end-body-in-head", "<html><head></body><title>t</title></head><body>x"),
        ("second-html-in-head", "<html><head><html><body>x"),
        ("body-as-head", "<html><body>x</body></html>"),
        ("link-base", "<html><head><link href=x><base href=y></head><body>z"),
    ],
    "doctype_case": [
        ("lower", "<!doctype html><html><body>x"),
        ("upper", "<!DOCTYPE HTML><html>"),
        ("mixed", "<!DOCTYPE Html><html><body>x"),
        ("system-unquoted", "<!DOCTYPE html SYSTEM x><html>"),
    ],
    "crashers": [
        ("comment", "<html><!--c--><body>x"),
        ("h1", "<html><body><h1>x"),
        ("form", "<html><body><form>"),
        ("dd", "<html><body><dd>x"),
        ("template", "<html><head><template>"),
        ("frameset-after-body", "<html><body>x<frameset>"),
        ("text-before-head", "<html>x<head>"),
        ("selfclosing-eof", "<html><body><br/"),
        ("table-end", "<html><body><table>x</table>"),
        ("after-after-body", "<html><body>x</body></html>y"),
        ("plaintext", "<html><body><plaintext>x"),
        ("pre", "<html><body><pre>x</pre>"),
    ],
    "test_html": [
        ("reference-sample", open("/root/reference/test.html", "rb").read().decode()),
    ],
}


def main():
    FIXDIR.mkdir(exist_ok=True)
    for category, cases in CASES.items():
        out = []
        for name, html in cases:
            r = parse_html(html, fast=False)
            out.append({
                "name": name,
                "html": html,
                "expect": {
                    "status": r["status"],
                    "dom_s": r["dom_s"],
                    "text": r["text"],
                    "title": r["title"],
                    "main_text": r["main_text"],
                    "spans": r["spans"],
                    "errors": r["errors"],
                },
            })
        path = FIXDIR / f"{category}.json"
        path.write_text(json.dumps(out, indent=1, ensure_ascii=True))
        print(f"wrote {path} ({len(out)} cases)")


if __name__ == "__main__":
    main()
