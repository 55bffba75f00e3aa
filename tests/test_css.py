"""CSS-selector extraction (engine/css.py — the Fizzler analog,
SURVEY.md §1.1/A31): grammar coverage, SAX-matching semantics over
tolerant real-world markup, attr/text extraction, and the Arrow batch
kernel. Pure-python (no Ray session needed except the kernel test)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from engine.css import (
    compile_selector,
    make_css_batch_kernel,
    select,
    select_attr,
    select_text,
    selector_collect_links,
)

DOC = b"""
<html><body id="top">
  <div class="forum">
    <ul>
      <li class="row odd"><a class="thread-title" href="/t/1">First <b>one</b></a></li>
      <li class="row"><a class="thread-title hot" href="/t/2">Second</a></li>
      <li class="row odd"><a class="other" href="/t/3">Third</a></li>
    </ul>
    <a class="thread-title" href="/t/outside">Outside list</a>
  </div>
  <div class="sidebar">
    <a class="thread-title" href="/promo">Promo</a>
    <a rel="next" href="/page/2">Next</a>
    <img src="/logo.png" class="logo">
  </div>
</body></html>
"""


def test_tag_selector():
    assert select_attr(DOC, "a", "href") == [
        "/t/1", "/t/2", "/t/3", "/t/outside", "/promo", "/page/2"
    ]


def test_class_selector():
    assert select_attr(DOC, "a.thread-title", "href") == [
        "/t/1", "/t/2", "/t/outside", "/promo"
    ]


def test_multi_class_compound():
    assert select_attr(DOC, "a.thread-title.hot", "href") == ["/t/2"]


def test_id_selector():
    # matches close inner-first; #top (body) closes after its children
    assert [m[0] for m in select(DOC, "#top")] == ["body"]


def test_attr_presence_and_value():
    assert select_attr(DOC, "a[rel]", "href") == ["/page/2"]
    assert select_attr(DOC, "a[rel=next]", "href") == ["/page/2"]
    assert select_attr(DOC, 'a[rel="next"]', "href") == ["/page/2"]
    assert select_attr(DOC, "a[rel=prev]", "href") == []


def test_descendant_combinator():
    # .forum scopes out the sidebar promo
    assert select_attr(DOC, ".forum a.thread-title", "href") == [
        "/t/1", "/t/2", "/t/outside"
    ]
    # deeper scope: only list rows
    assert select_attr(DOC, "ul a.thread-title", "href") == ["/t/1", "/t/2"]


def test_child_combinator():
    # li > a excludes the outside-list and sidebar anchors
    assert select_attr(DOC, "li > a.thread-title", "href") == ["/t/1", "/t/2"]
    # .forum > a only the direct child
    assert select_attr(DOC, ".forum > a", "href") == ["/t/outside"]


def test_selector_list():
    assert select_attr(DOC, "a.other, a[rel=next]", "href") == [
        "/t/3", "/page/2"
    ]


def test_text_capture_collapses_whitespace():
    texts = select_text(DOC, "li.odd")
    assert texts == ["First one", "Third"]


def test_void_element_matches_without_endtag():
    assert select_attr(DOC, "img.logo", "src") == ["/logo.png"]


def test_tolerant_unclosed_and_stray_tags():
    messy = b"<div class=x><p>alpha<p>beta</div></p><span>tail</span>"
    # unclosed <p> elements close at EOF/outer close without wedging
    texts = select_text(messy, "div.x")
    assert texts == ["alphabeta"]
    assert select_text(messy, "span") == ["tail"]


def test_unquoted_attr_and_first_occurrence_wins():
    doc = b'<a href=/a href=/dup class=one>x</a>'
    assert select_attr(doc, "a.one", "href") == ["/a"]


def test_compile_errors():
    with pytest.raises(ValueError):
        compile_selector("a >")
    with pytest.raises(ValueError):
        compile_selector("a:hover")  # pseudo-classes unsupported
    with pytest.raises(ValueError):
        compile_selector("")


def test_compiled_selector_reusable():
    sel = compile_selector("a.thread-title")
    assert select_attr(DOC, sel, "href") == select_attr(
        DOC, "a.thread-title", "href"
    )


def test_batch_kernel(ray_session):
    import ray.data as rd

    t = pa.table({
        "url": ["u1", "u2"],
        "html": [DOC, b"<p>no links</p>"],
    })
    kern = make_css_batch_kernel("a.thread-title", attr="href")
    out = rd.from_arrow(t).map_batches(kern, batch_format="pyarrow").to_pandas()
    assert [list(x) for x in out["selected"]] == [
        ["/t/1", "/t/2", "/t/outside", "/promo"], []
    ]
    kern_t = make_css_batch_kernel("li.odd", html_col="html", out="rows")
    out2 = rd.from_arrow(t).map_batches(kern_t, batch_format="pyarrow").to_pandas()
    assert [list(x) for x in out2["rows"]] == [["First one", "Third"], []]


# ---------------------------------------------------------------------------
# Differential fuzz: SAX stack-matcher vs an independent brute-force
# tree matcher over generated well-formed trees and random selectors
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_TAGS = ["div", "p", "span", "li", "a"]
_CLASSES = ["x", "y", "z"]
_IDS = ["i1", "i2"]


@st.composite
def _node(draw, depth, parent=None):
    # valid-HTML nesting only: no li directly under li, no block tag
    # (div/p) directly under p — those are exactly the nestings the
    # matcher's implied-end-tag rules rewrite, so a "well-formed" tree
    # using them would not round-trip through any HTML5 parser either.
    allowed = list(_TAGS)
    if parent == "li":
        allowed.remove("li")
    elif parent == "p":
        allowed.remove("p")
        allowed.remove("div")
    tag = draw(st.sampled_from(allowed))
    classes = draw(st.sets(st.sampled_from(_CLASSES), max_size=2))
    nid = draw(st.one_of(st.none(), st.sampled_from(_IDS)))
    rel = draw(st.one_of(st.none(), st.sampled_from(["next", "prev"])))
    kids = []
    if depth < 3:
        kids = draw(st.lists(_node(depth=depth + 1, parent=tag), max_size=3))
    return {"tag": tag, "classes": frozenset(classes), "id": nid,
            "rel": rel, "kids": kids}


def _render(n) -> str:
    attrs = ""
    if n["classes"]:
        attrs += f' class="{" ".join(sorted(n["classes"]))}"'
    if n["id"]:
        attrs += f' id="{n["id"]}"'
    if n["rel"]:
        attrs += f' rel="{n["rel"]}"'
    inner = "".join(_render(k) for k in n["kids"])
    return f'<{n["tag"]}{attrs}>t{inner}</{n["tag"]}>'


def _brute_matches(n, steps, combos, path=(), sibs=None, idx=0):
    """Independent reference: recursive tree walk; per node, dynamic
    check of the compound chain against the full ancestor path with
    sibling context (entry = (node, siblings_list, index0))."""
    from engine.css import _nth_matches

    if sibs is None:
        sibs = [n]
    out = []
    path = path + ((n, sibs, idx),)

    def attr_ok(name, op, val, m):
        got = {"class": " ".join(sorted(m["classes"])) or None,
               "id": m["id"], "rel": m["rel"]}.get(name)
        if got is None:
            return False
        if val is None:
            return True
        if op == "=":
            return got == val
        if op == "~=":
            return bool(val) and val in got.split()
        if op == "^=":
            return bool(val) and got.startswith(val)
        if op == "$=":
            return bool(val) and got.endswith(val)
        if op == "*=":
            return bool(val) and val in got
        if op == "|=":
            return got == val or got.startswith(val + "-")
        raise AssertionError(op)

    def node_ok(c, ent):
        m, _sibs, i0 = ent
        if c.tag is not None and m["tag"] != c.tag:
            return False
        if c.id is not None and m["id"] != c.id:
            return False
        if c.classes and not (c.classes <= m["classes"]):
            return False
        for name, op, val in c.attrs:
            if not attr_ok(name, op, val, m):
                return False
        if c.nth is not None and not _nth_matches(*c.nth, i0 + 1):
            return False
        return True

    def chain_ok(si, pi, ent):
        if not node_ok(steps[si], ent):
            return False
        if si == 0:
            return True
        c = combos[si - 1]
        _m, esibs, ei = ent
        if c == ">":
            return pi > 0 and chain_ok(si - 1, pi - 1, path[pi - 1])
        if c == "+":
            return ei >= 1 and chain_ok(si - 1, pi, (esibs[ei - 1], esibs, ei - 1))
        if c == "~":
            return any(
                chain_ok(si - 1, pi, (esibs[j], esibs, j))
                for j in range(ei - 1, -1, -1)
            )
        return any(chain_ok(si - 1, q, path[q]) for q in range(pi - 1, -1, -1))

    if chain_ok(len(steps) - 1, len(path) - 1, path[-1]):
        out.append(n)
    for i, k in enumerate(n["kids"]):
        out.extend(_brute_matches(k, steps, combos, path, n["kids"], i))
    return out


@st.composite
def _selector(draw):
    def compound():
        parts = []
        t = draw(st.one_of(st.none(), st.sampled_from(_TAGS)))
        if t:
            parts.append(t)
        if draw(st.booleans()):
            parts.append("." + draw(st.sampled_from(_CLASSES)))
        if draw(st.booleans()):
            parts.append("#" + draw(st.sampled_from(_IDS)))
        if draw(st.booleans()):
            op = draw(st.sampled_from(["=", "^=", "$=", "*=", "~=", "|="]))
            parts.append("[rel" + op + draw(st.sampled_from(["next", "prev", "ne", "xt"])) + "]")
        if draw(st.booleans()):
            parts.append(draw(st.sampled_from([
                ":first-child", ":nth-child(2)", ":nth-child(odd)",
                ":nth-child(even)", ":nth-child(3n+1)", ":nth-child(2n)",
            ])))
        if not parts:
            parts.append(draw(st.sampled_from(_TAGS)))
        return "".join(parts)

    n_steps = draw(st.integers(1, 3))
    s = compound()
    for _ in range(n_steps - 1):
        s += draw(st.sampled_from([" ", " > ", " + ", " ~ "])) + compound()
    return s


@settings(max_examples=300, deadline=None)
@given(tree=_node(depth=0), sel=_selector())
def test_css_matches_brute_force_tree(tree, sel):
    from engine.css import compile_selector, select

    compiled = compile_selector(sel)
    html = _render(tree)
    got = sorted(
        (m[0], m[1].get("id") or "", m[1].get("class", ""))
        for m in select(html, compiled)
    )
    want = []
    for steps, combos in compiled.alternatives:
        want.extend(_brute_matches(tree, steps, combos))
    want_keys = sorted(
        (w["tag"], w["id"] or "", " ".join(sorted(w["classes"])))
        for w in want
    )
    assert got == want_keys, (sel, html)


def test_selector_collect_links_hook():
    # hits resolve against the page url (the collect hooks' contract
    # is absolute raw urls)
    hook = selector_collect_links("ul a.thread-title")
    assert hook("https://x.example/l", DOC) == [
        "https://x.example/t/1", "https://x.example/t/2"
    ]

# ---------------------------------------------------------------------------
# r5 grammar extensions: sibling combinators, positional pseudo-classes,
# attribute operators, implied end tags, script/style text skipping
# ---------------------------------------------------------------------------

PAGED = b"""
<ul class="pagination">
  <li class="page current"><a href="/p/1">1</a></li>
  <li class="page"><a href="/p/2">2</a></li>
  <li class="page"><a href="/p/3">3</a></li>
  <li class="next"><a href="/p/2" rel="next">Next</a></li>
</ul>
"""


def test_adjacent_sibling_combinator():
    # li.page + li.page > a: pages 2 and 3 (each directly follows a
    # .page), never page 1 (no preceding sibling) or Next (not .page)
    assert select_attr(PAGED, "li.page + li.page > a", "href") == [
        "/p/2", "/p/3"
    ]
    assert select_attr(PAGED, "li.current + li > a", "href") == ["/p/2"]


def test_general_sibling_combinator():
    assert select_attr(PAGED, "li.current ~ li > a", "href") == [
        "/p/2", "/p/3", "/p/2"
    ]
    # ~ requires a PRECEDING sibling: nothing precedes li.current
    assert select_attr(PAGED, "li.next ~ li > a", "href") == []


def test_first_child_and_nth_child():
    assert select_attr(PAGED, "li:first-child > a", "href") == ["/p/1"]
    assert select_attr(PAGED, "li:nth-child(2) > a", "href") == ["/p/2"]
    assert select_attr(PAGED, "li:nth-child(odd) > a", "href") == [
        "/p/1", "/p/3"
    ]
    assert select_attr(PAGED, "li:nth-child(even) > a", "href") == [
        "/p/2", "/p/2"
    ]
    assert select_attr(PAGED, "li:nth-child(2n+1) > a", "href") == [
        "/p/1", "/p/3"
    ]
    # a is each li's only (hence first) child
    assert select_attr(PAGED, "a:first-child", "href") == [
        "/p/1", "/p/2", "/p/3", "/p/2"
    ]


def test_attr_operators():
    doc = b'<a href="/thread/42?page=2">x</a><a href="/user/7">y</a>'
    assert select_attr(doc, 'a[href^="/thread/"]', "href") == [
        "/thread/42?page=2"
    ]
    assert select_attr(doc, 'a[href$="page=2"]', "href") == [
        "/thread/42?page=2"
    ]
    assert select_attr(doc, 'a[href*="user"]', "href") == ["/user/7"]
    cls = b'<div class="alpha beta">t</div>'
    assert select_text(cls, 'div[class~="beta"]') == ["t"]
    assert select_text(cls, 'div[class~="bet"]') == []
    lang = b'<div lang="en-US">t</div>'
    assert select_text(lang, 'div[lang|="en"]') == ["t"]
    assert select_text(lang, 'div[lang|="e"]') == []


def test_implied_end_tags_li():
    # real-world unclosed list items: each new <li> closes the open one,
    # so li + li works without </li> in the markup
    messy = b'<ul><li class=a>one<li class=b>two<li class=c>three</ul>'
    assert select_text(messy, "li.a + li") == ["two"]
    assert select_text(messy, "li:nth-child(3)") == ["three"]
    # NESTED list still nests (implied close only pops the stack top)
    nested = b"<ul><li>outer<ul><li>inner</li></ul></li></ul>"
    assert select_text(nested, "li li") == ["inner"]


def test_implied_end_tags_p_and_table():
    messy = b"<p>alpha<p>beta<div>gamma</div>"
    assert select_text(messy, "p + p") == ["beta"]
    assert select_text(messy, "p:first-child") == ["alpha"]
    rows = b"<table><tr><td>a<td>b<tr><td>c</table>"
    assert select_text(rows, "td + td") == ["b"]
    assert select_text(rows, "tr + tr td") == ["c"]


def test_script_style_text_not_captured():
    doc = (b"<div class=x>visible<script>var hidden = 1;</script>"
           b"<style>.x{color:red}</style>tail</div>")
    assert select_text(doc, "div.x") == ["visibletail"]
    # the elements themselves still match selectors
    assert [m[0] for m in select(doc, "script")] == ["script"]


def test_unsupported_pseudo_fails_fast():
    import pytest as _pt

    with _pt.raises(ValueError):
        compile_selector("li:last-child")
    with _pt.raises(ValueError):
        compile_selector("li:nth-child(x)")
    with _pt.raises(ValueError):
        compile_selector("li +")


def test_not_pseudo_class():
    html = (b'<ul><li class="ad">spam</li><li>one</li>'
            b'<li class="x y">two</li></ul>'
            b'<div><a href="/a" rel="nofollow">n</a><a href="/b">y</a></div>')
    assert select_text(html, "li:not(.ad)") == ["one", "two"]
    assert select_attr(html, "a:not([rel=nofollow])", "href") == ["/b"]
    assert select_text(html, "li:not(:first-child)") == ["one", "two"]
    # stacked negations AND a positional pseudo on the same compound
    assert select_text(html, "ul > li:not(.ad):not(.y)") == ["one"]
    assert select_text(html, "li:not(.ad):nth-child(3)") == ["two"]
    # negated tag (CSS3 type selector inside :not)
    assert select_text(html, "ul :not(li)") == []
    # :not in a non-rightmost step
    assert select_attr(html, "div:not(.ad) > a", "href") == ["/a", "/b"]


def test_not_pseudo_fails_fast():
    import pytest as _pt

    for bad in (":not()", "li:not(:nth-child(2))", "li:not(:not(.x))",
                "li:not(.a .b)"):
        with _pt.raises(ValueError):
            compile_selector(bad)


def test_nth_of_type():
    rows = b"<table><tr><td>a<td>b<tr><td>c<td>d<tr><td>e</table>"
    assert select_text(rows, "tr:nth-of-type(odd) td") == ["a", "b", "e"]
    mixed = (b"<div><h2>t</h2><p>one</p><span>x</span>"
             b"<p>two</p><p>three</p></div>")
    # the first <p> is the SECOND child — of-type vs child indexing
    assert select_text(mixed, "p:first-of-type") == ["one"]
    assert select_text(mixed, "p:first-child") == []
    assert select_text(mixed, "p:nth-of-type(2)") == ["two"]
    assert select_text(mixed, "p:not(:first-of-type)") == ["two", "three"]
    import pytest as _pt

    with _pt.raises(ValueError):
        compile_selector("p:first-of-type(1)")
    with _pt.raises(ValueError):
        compile_selector("p:nth-of-type")
