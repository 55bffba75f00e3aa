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


def test_selector_collect_links_hook():
    # hits resolve against the page url (the collect hooks' contract
    # is absolute raw urls)
    hook = selector_collect_links("ul a.thread-title")
    assert hook("https://x.example/l", DOC) == [
        "https://x.example/t/1", "https://x.example/t/2"
    ]
