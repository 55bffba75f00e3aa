"""Unit tests for engine.kernels (SURVEY.md §5.1).

The extract-text tests enforce the byte-identity invariant
(BASELINE.json:15) against frozen golden fixtures.
"""

from __future__ import annotations

import pathlib

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.kernels import (
    canonicalize_batch,
    canonicalize_url,
    discovery_seq,
    extract_links,
    extract_links_batch,
    extract_text,
    extract_text_batch,
    host_hash64,
    host_of,
    key64,
    key_batch,
    sha1_key,
)

FIX = pathlib.Path(__file__).parent / "fixtures" / "extract"


CANON_CASES = [
    ("http://Example.COM/", "http://example.com/"),
    ("HTTP://EXAMPLE.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/a/../b", "http://example.com/b"),
    ("http://example.com/a/./b", "http://example.com/a/b"),
    ("http://example.com/a/b/../../c/d", "http://example.com/c/d"),
    ("http://example.com/../x", "http://example.com/x"),
    ("http://example.com/a/", "http://example.com/a/"),
    ("http://example.com/a/..", "http://example.com/"),
    ("http://example.com/p?b=2&a=1", "http://example.com/p?b=2&a=1"),  # query order kept
    ("http://example.com/p?x=1#frag", "http://example.com/p?x=1"),
    ("http://example.com/#frag", "http://example.com/"),
    ("  http://example.com/x  ", "http://example.com/x"),
    ("http://user:pw@Example.com/x", "http://user:pw@example.com/x"),
    ("ftp://Example.com/X#f", "ftp://Example.com/X"),  # non-http: fragment strip only
    ("http://[2001:DB8::1]:80/x", "http://[2001:db8::1]/x"),
]


@pytest.mark.parametrize("raw,want", CANON_CASES)
def test_canonicalize_table(raw, want):
    assert canonicalize_url(raw) == want


def test_canonicalize_bare_query_mark():
    """Regression (r5): a trailing bare '?' (empty query) is NOT a
    canonical fixed point — urlsplit drops it — so the fast-path
    regex must not accept it, or the same URL gets two identities."""
    import engine.kernels as K

    assert K._CANON_FAST.match("http://h.example/a?") is None
    assert canonicalize_url("http://h.example/a?") == "http://h.example/a"
    assert canonicalize_url("http://h.example/a?") == K._canonicalize_slow(
        "http://h.example/a?"
    )


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent_and_total(s):
    once = canonicalize_url(s)
    assert canonicalize_url(once) == once  # idempotence


_CANON_FUZZ_ATOMS = [
    "http://", "https://", "HTTP://", "h.example", "H.Example", "h",
    "/", "/a", "/a/b", "/./", "/../", "/.", "/..", "/.hidden", "//x",
    "?q=1", "?", "#f", "#", ":80", ":443", ":8080", "@", "user:pw@",
    "%20", "x y", "\t", "\n", " ", "\x01", "\x7f", "~", ";p", "é",
    "[::1]", "a..b", ".",
]


@given(st.lists(st.sampled_from(_CANON_FUZZ_ATOMS), min_size=1, max_size=8))
@settings(max_examples=500, deadline=None)
def test_canonicalize_fast_path_differential(parts):
    """The already-canonical fast path (kernels._CANON_FAST) must be a
    pure fixed-point detector: canonicalize_url (fast path enabled)
    equals _canonicalize_slow on every input — incl. dot segments,
    ports, userinfo, controls urlsplit strips, unicode, fragments."""
    import engine.kernels as K

    s = "".join(parts)
    u = s.strip()
    want = u if not u else K._canonicalize_slow(u)
    assert canonicalize_url(s) == want, repr(s)


def test_keys():
    u = "http://example.com/"
    k = sha1_key(u)
    assert len(k) == 20 and k == sha1_key(u)
    assert 0 <= key64(k) < 2**64
    assert host_hash64("a.example") != host_hash64("b.example")
    assert host_of("https://User@A.Example.com:8443/p") == "a.example.com"


def test_discovery_seq_breadth_first():
    k1, k2 = sha1_key("http://a/1"), sha1_key("http://a/2")
    assert discovery_seq(0, k1) < discovery_seq(1, k2)  # depth dominates
    assert discovery_seq(3, k1) != discovery_seq(3, k2)


def test_extract_text_golden_fixtures():
    pairs = sorted(FIX.glob("*.html"))
    assert len(pairs) >= 15, "fixtures missing — run tools/gen_extract_fixtures.py"
    for h in pairs:
        want = (FIX / (h.stem + ".txt")).read_bytes()
        got = extract_text(h.read_bytes()).encode("utf-8")
        assert got == want, f"byte drift in extract_text for fixture {h.stem}"


def test_extract_text_basics():
    assert extract_text(b"<p>a</p><p>b</p>") == "a\nb"
    assert extract_text(b"x <b>y</b> z") == "x y z"
    assert extract_text(b"<script>a</script>b") == "b"
    assert extract_text(b"") == ""
    # determinism across calls
    h = b"<div><p>q</p></div>"
    assert extract_text(h) == extract_text(h)


def test_extract_links_kinds_and_order():
    html = (
        b'<a href="/a">1</a><img src="/i.png"><script src="/s.js"></script>'
        b'<link href="/c.css"><a href="mailto:x@y">m</a><a href="#top">f</a>'
        b'<a href="http://Other.example/B#z">2</a>'
    )
    got = extract_links(html, "https://h.example/p/0")
    assert got == [
        ("https://h.example/a", "link", 0),
        ("https://h.example/i.png", "prereq", 1),
        ("https://h.example/s.js", "prereq", 2),
        ("https://h.example/c.css", "prereq", 3),
        ("http://Other.example/B#z", "link", 4),
    ]


def test_batch_wrappers_roundtrip():
    t = pa.table({"url": ["HTTP://A.example:80/x/../y#f", "https://b.example/p"]})
    t = canonicalize_batch(t)
    assert t["url"].to_pylist() == ["http://a.example/y", "https://b.example/p"]
    t = key_batch(t)
    assert t.schema.field("url_key").type == pa.binary(20)
    assert t["host"].to_pylist() == ["a.example", "b.example"]

    pages = pa.table(
        {
            "url": ["https://h.example/p/0"],
            "html": [b'<p>hi</p><a href="/p/1">x</a>'],
            "depth": pa.array([0], type=pa.int32()),
        }
    )
    txt = extract_text_batch(pages)
    assert txt["text"].to_pylist() == ["hi\nx"]
    links = extract_links_batch(pages)
    assert links["url"].to_pylist() == ["https://h.example/p/1"]
    assert links["parent_depth"].to_pylist() == [0]


def test_combined_page_extractor_equals_separate():
    """extract_page (single-pass perf path) must match extract_text +
    extract_links exactly — locked over all golden fixtures and the
    synthetic generator's html."""
    from engine.kernels import extract_page
    from engine.synth import SynthConfig, build_pages_table

    for h in sorted(FIX.glob("*.html")):
        b = h.read_bytes()
        t, l = extract_page(b, "https://x.example/p")
        assert t == extract_text(b)
        assert l == extract_links(b, "https://x.example/p")
    tbl = build_pages_table(SynthConfig(n_hosts=3, n_pages=30))
    for u, html in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()):
        t, l = extract_page(html, u)
        assert t == extract_text(html)
        assert l == extract_links(html, u)


# ---------------------------------------------------------------------------
# Fast-scanner / fast-urljoin differential locks
# ---------------------------------------------------------------------------

def _reference_page(html, base_url):
    """Stdlib-HTMLParser-based reference: the behavior the fast scanner
    in kernels._scan_page must reproduce byte-for-byte."""
    import engine.kernels as K
    from urllib.parse import urljoin

    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", "replace")
    p = K._PageExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    text = K._WS_RUN.sub(K._collapse, "".join(p.parts)).strip()
    out = []
    for raw, kind in p.links:
        h = raw.strip()
        if not h or h.startswith("#") or h.lower().startswith(K._BAD_SCHEMES):
            continue
        try:
            absu = urljoin(base_url, h)
        except ValueError:
            continue
        out.append((absu, kind, len(out)))
    return text, out


def test_fast_scan_matches_reference_on_fixtures_and_synth():
    from engine.kernels import extract_page
    from engine.synth import SynthConfig, build_pages_table

    for f in sorted(FIX.glob("*.html")):
        b = f.read_bytes()
        for base in ("http://fix.example/a/b/c.html?q=1", "https://x.example"):
            assert extract_page(b, base) == _reference_page(b, base), f.name
    tbl = build_pages_table(SynthConfig(n_hosts=4, n_pages=60, seed=5))
    for u, html in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()):
        assert extract_page(html, u) == _reference_page(html, u)


_SOUP_FRAGMENTS = [
    '<a href="', "<a href=", "<A HREF='", '">x</a>', "<p>", "</p>", "<br/>", "<br />",
    "<script>", "</script>", "<script src=a.js>", "</SCRIPT >", "<style>", "</style>",
    "<!-- c -->", "<!--", "-->", "<!doctype html>", "<!DOCTYPE", "<?pi?>", "<?",
    '<img src="i.png"/>', "<img src=i.png>", "&amp;", "&lt;", "&#65;", "&#x41;", "&bogus;",
    "&", "<", ">", '"', "'", "=", "/", " ", "\t", "\n", "txt", "a", "#f", "../x", "/y?q=1",
    '<div class="a" id=b>', '<div class=a id="b">', "<span/>", "</div>", "<li>", "</li>",
    '<a href="/p/1#s">', '<a href="http://o.example/z">', "<a href=x/>", "<a href=x />",
    '<a href="a&amp;b">', "<a href='s p'>", "<tag-odd>", "</ x>", "</>", "<5>", "<a b=c=d>",
    "<a href>", "<a href=>", '<a href="">', "<a =x>", '<a href="x>', "<noscript>", "</noscript>",
    "<template>", "</template>", '<a href="x" href="y">', "\x00", "<a/ >", "<a b / c>",
    "<![CDATA[x]]>", "<![if]>", "&#", "&#;", ";", "?q", "//h.example/p", "mailto:x@y",
    "javascript:void(0)", "a:b", "x;y", "p/", "./", "..", ".", "http://", "https:///x", "[", "]",
    "\xa0", "\x0b", "\f", "<pre>", "</pre>", "<a\x00b>", "<p\t>", '<a href= "x">',
]


def test_fast_scan_soup_differential():
    """Deterministic fuzz: random concatenations of adversarial markup
    fragments must parse identically via the fast scanner and the
    stdlib-based reference classes."""
    import random

    from engine.kernels import extract_page

    rng = random.Random(20260817)
    bases = ["http://s.example/d/e/f", "https://s.example/d/", "http://s.example",
             "http://u@h.example:8080/p?q=0"]
    for _ in range(1500):
        s = "".join(rng.choice(_SOUP_FRAGMENTS) for _ in range(rng.randrange(1, 25)))
        base = rng.choice(bases)
        assert extract_page(s, base) == _reference_page(s, base), repr(s)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="<>&;/=\"' \t\n\x00abpAP!?#.-x0", max_size=120))
def test_fast_scan_hypothesis(s):
    from engine.kernels import extract_page

    assert extract_page(s, "http://h.example/a/b") == _reference_page(s, "http://h.example/a/b")


@settings(max_examples=500, deadline=None)
@given(st.text(alphabet="ab \t\r\n\f\v\x00 ", max_size=80))
def test_collapse_text_matches_callback_spec(s):
    """_collapse_text (split/strip + memchr-gated replaces) must equal
    the frozen callback form _WS_RUN.sub(_collapse, s).strip() on
    whitespace-dense inputs incl. NBSP and break markers — the A9
    byte-stability contract for the optimized path."""
    import engine.kernels as K

    assert K._collapse_text(s) == K._WS_RUN.sub(K._collapse, s).strip(), repr(s)


_URLJOIN_ATOMS = [
    "a", "b", "p", "..", ".", "", "x y", "%20", "p;q", "a=1", "#f", "#", "?", "?q=1", "?q",
    ";p=2", "http://o.example", "https://o.example/z", "HTTP://o.example/z", "http:", "//o.example",
    "//o.example/p", "//", "///x", ":", "a:b", "1:2", "mailto:x", "foo+bar:z", "\t", "\n", "\x00",
    "[", "]", "http://[::2]/x", "?#", "#?", "&", "=", "~", "..//", "/./", "/../", "http://h;p/x",
    "http://h/a;", "http://h/a;p", "x#", "x?", "x?#", "x?#f", "x#?q",
]


def test_fast_urljoin_differential():
    import random
    from urllib.parse import urljoin

    from engine.kernels import _base_ctx, _fast_urljoin

    bases = ["http://s.example/d/e/f", "https://s.example/d/", "http://s.example",
             "http://u@h.example:8080/p?q=0", "https://h.example/a/b;p/c?x=1#frag",
             "http://h.example/;p", "ftp://h.example/x", "relative/base", "",
             "http://[::1]:8080/p", "http://h.example/a/./../b/"]
    rng = random.Random(31337)
    for _ in range(8000):
        base = rng.choice(bases)
        h = "".join(rng.choice(_URLJOIN_ATOMS) for _ in range(rng.randrange(1, 6)))
        if rng.random() < 0.3:
            h = rng.choice(["/", "./", "../", "//", ""]) + h
        ctx = _base_ctx(base)
        try:
            want, werr = urljoin(base, h), False
        except ValueError:
            want, werr = None, True
        try:
            got, gerr = _fast_urljoin(ctx, base, h), False
        except ValueError:
            got, gerr = None, True
        assert (want, werr) == (got, gerr), (base, h)


def test_selfclosing_skip_tag_does_not_leak_skip():
    """A self-closing skip tag (<script/>) has no body: text after it
    must be kept, matching the separate extractors."""
    from engine.kernels import extract_page

    html = '<p>before</p><script/><p>after</p><template/><a href="/x">l</a>'
    t, links = extract_page(html, "http://h.example/")
    assert t == "before\nafter\nl"
    assert t == extract_text(html)
    assert [u for u, _, _ in links] == ["http://h.example/x"]
    assert links == extract_links(html, "http://h.example/")
