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
def _node(draw, depth):
    tag = draw(st.sampled_from(_TAGS))
    classes = draw(st.sets(st.sampled_from(_CLASSES), max_size=2))
    nid = draw(st.one_of(st.none(), st.sampled_from(_IDS)))
    rel = draw(st.one_of(st.none(), st.sampled_from(["next", "prev"])))
    kids = []
    if depth < 3:
        kids = draw(st.lists(_node(depth=depth + 1), max_size=3))
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


def _brute_matches(n, steps, combos, path=()):
    """Independent reference: recursive tree walk; per node, dynamic
    check of the compound chain against the full ancestor path."""
    out = []
    path = path + (n,)

    def node_ok(c, m):
        if c.tag is not None and m["tag"] != c.tag:
            return False
        if c.id is not None and m["id"] != c.id:
            return False
        if c.classes and not (c.classes <= m["classes"]):
            return False
        for name, val in c.attrs:
            got = {"class": " ".join(sorted(m["classes"])) or None,
                   "id": m["id"], "rel": m["rel"]}.get(name)
            if got is None:
                return False
            if val is not None and got != val:
                return False
        return True

    def chain_ok(si, pi):
        if not node_ok(steps[si], path[pi]):
            return False
        if si == 0:
            return True
        if combos[si - 1] == ">":
            return pi > 0 and chain_ok(si - 1, pi - 1)
        return any(chain_ok(si - 1, q) for q in range(pi - 1, -1, -1))

    if chain_ok(len(steps) - 1, len(path) - 1):
        out.append(n)
    for k in n["kids"]:
        out.extend(_brute_matches(k, steps, combos, path))
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
            parts.append("[rel=" + draw(st.sampled_from(["next", "prev"])) + "]")
        if not parts:
            parts.append(draw(st.sampled_from(_TAGS)))
        return "".join(parts)

    n_steps = draw(st.integers(1, 3))
    s = compound()
    for _ in range(n_steps - 1):
        s += draw(st.sampled_from([" ", " > "])) + compound()
    return s


@settings(max_examples=150, deadline=None)
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
