"""Minimal CSS-selector extraction over streaming HTML events — the
Fizzler analog (SURVEY.md §1.1: the reference's site scrapers are
CSS-selector-driven via [pub:Shaman.FizzlerCssSelectors]; A31).

Supported grammar (the working subset a site scraper actually uses):
  compound:     tag, *, #id, .class, [attr], [attr=value] (value bare
                or quoted), any combination (a.thread-title[rel=next])
  combinators:  descendant (whitespace) and child (>)
  lists:        comma-separated alternatives

Matching is SAX-style over the same event stream the crawl's
extractors use (stdlib HTMLParser events, engine/kernels.py:357+): an
open-element stack carries (tag, id, classes, attrs) and each start
tag is tested right-to-left against the compiled selector — the
rightmost compound against the element itself, ancestors scanned
upward for descendant steps, the immediate parent pinned for child
steps. No DOM is built: memory is O(depth + matches), so the kernel
is safe inside map_batches over arbitrarily large pages.

Element text is captured while a matched element is open (same
whitespace collapsing as kernels.extract_text's joiner) and HTML void
elements (br, img, …) are treated as self-closing so real-world
unclosed markup can't wedge the stack.

Compile once (module-level or actor __init__), match per batch:
`compile_selector` is the expensive step; `CssMatcher.feed_html` is a
single pass per page.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

__all__ = [
    "compile_selector",
    "select",
    "select_attr",
    "select_text",
    "make_css_batch_kernel",
    "selector_collect_links",
]

# HTML void elements: never receive an end tag; treated as startend so
# tolerant real-world markup can't grow the open stack unboundedly.
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_WS = re.compile(r"\s+")

_TOKEN = re.compile(
    r"""
    (?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)
  | \#(?P<id>[^\s#.\[>,]+)
  | \.(?P<cls>[^\s#.\[>,]+)
  | \[(?P<attr>[a-zA-Z][a-zA-Z0-9_:-]*)
      (?:=(?P<q>["']?)(?P<val>[^\]]*?)(?P=q))?\]
    """,
    re.X,
)


class _Compound:
    """One compound selector: all conditions must hold on ONE element."""

    __slots__ = ("tag", "id", "classes", "attrs")

    def __init__(self, tag, id_, classes, attrs):
        self.tag = tag          # str | None (None = '*')
        self.id = id_           # str | None
        self.classes = classes  # frozenset[str]
        self.attrs = attrs      # tuple[(name, value|None), ...]

    def matches(self, el) -> bool:
        tag, eid, classes, attrs = el
        if self.tag is not None and tag != self.tag:
            return False
        if self.id is not None and eid != self.id:
            return False
        if self.classes and not self.classes <= classes:
            return False
        for name, val in self.attrs:
            if name not in attrs:
                return False
            if val is not None and attrs[name] != val:
                return False
        return True


class CompiledSelector:
    """A parsed selector list: [(steps, combinators)] per alternative,
    where steps is a tuple of _Compound (leftmost first) and
    combinators[i] is the combinator BETWEEN steps[i] and steps[i+1]
    (' ' descendant or '>' child)."""

    __slots__ = ("alternatives", "source")

    def __init__(self, alternatives, source):
        self.alternatives = alternatives
        self.source = source

    def matches_path(self, stack) -> bool:
        """True if the TOP element of `stack` (list of element tuples,
        root first) is matched by any alternative."""
        for steps, combos in self.alternatives:
            if self._match_alt(steps, combos, stack):
                return True
        return False

    @staticmethod
    def _match_alt(steps, combos, stack) -> bool:
        # right-to-left: rightmost compound against stack[-1]
        if not stack or not steps[-1].matches(stack[-1]):
            return False

        def up(step_i: int, pos: int) -> bool:
            # steps[step_i] already matched at stack[pos]; try to match
            # steps[:step_i] against stack[:pos]
            if step_i == 0:
                return True
            combo = combos[step_i - 1]
            want = steps[step_i - 1]
            if combo == ">":
                return (
                    pos > 0
                    and want.matches(stack[pos - 1])
                    and up(step_i - 1, pos - 1)
                )
            for anc in range(pos - 1, -1, -1):
                if want.matches(stack[anc]) and up(step_i - 1, anc):
                    return True
            return False

        return up(len(steps) - 1, len(stack) - 1)


def _parse_compound(s: str) -> _Compound:
    if not s:
        raise ValueError("empty compound selector")
    tag = None
    id_ = None
    classes = set()
    attrs = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None:
            raise ValueError(f"unsupported selector syntax at {s[pos:]!r}")
        if m.group("tag"):
            if pos != 0:
                raise ValueError(f"tag must lead the compound: {s!r}")
            if m.group("tag") != "*":
                tag = m.group("tag").lower()
        elif m.group("id"):
            id_ = m.group("id")
        elif m.group("cls"):
            classes.add(m.group("cls"))
        elif m.group("attr"):
            attrs.append((m.group("attr").lower(), m.group("val")))
        pos = m.end()
    return _Compound(tag, id_, frozenset(classes), tuple(attrs))


def compile_selector(selector: str) -> CompiledSelector:
    """Parse a selector list into a CompiledSelector. Raises ValueError
    on syntax outside the supported subset (fail fast at pipeline
    construction, not inside a worker)."""
    alternatives = []
    for alt in selector.split(","):
        alt = alt.strip()
        if not alt:
            raise ValueError(f"empty alternative in selector {selector!r}")
        # normalize child combinator spacing, then split on whitespace
        alt_n = re.sub(r"\s*>\s*", " > ", alt).strip()
        parts = _WS.split(alt_n)
        steps = []
        combos = []
        expect_compound = True
        for p in parts:
            if p == ">":
                if expect_compound or not steps:
                    raise ValueError(f"dangling '>' in selector {selector!r}")
                combos[-1] = ">"
                expect_compound = True
                continue
            steps.append(_parse_compound(p))
            combos.append(" ")  # combinator to the NEXT step (default)
            expect_compound = False
        if expect_compound:
            raise ValueError(f"selector ends with combinator: {selector!r}")
        combos.pop()  # no combinator after the last step
        alternatives.append((tuple(steps), tuple(combos)))
    return CompiledSelector(alternatives, selector)


def _element_of(tag: str, attrs_list) -> tuple:
    attrs = {}
    for k, v in attrs_list:
        if k not in attrs:  # first occurrence wins (browser behavior)
            attrs[k] = v if v is not None else ""
    classes = frozenset(attrs.get("class", "").split())
    return (tag, attrs.get("id"), classes, attrs)


class CssMatcher(HTMLParser):
    """Single-pass selector matcher. Collects matched elements as
    (tag, attrs: dict, text: str) where text is the element's
    whitespace-collapsed descendant text."""

    def __init__(self, compiled: CompiledSelector) -> None:
        super().__init__(convert_charrefs=True)
        self._sel = compiled
        self._stack: list[tuple] = []
        self._tags: list[str] = []
        # active captures: (depth, tag, attrs, [text parts])
        self._open: list[list] = []
        self.matches: list[tuple[str, dict, str]] = []

    def _start(self, tag: str, attrs_list, self_closing: bool) -> None:
        el = _element_of(tag, attrs_list)
        self._stack.append(el)
        self._tags.append(tag)
        if self._sel.matches_path(self._stack):
            if self_closing:
                self.matches.append((tag, el[3], ""))
            else:
                self._open.append([len(self._stack), tag, el[3], []])
        if self_closing:
            self._stack.pop()
            self._tags.pop()

    def handle_starttag(self, tag: str, attrs) -> None:
        self._start(tag, attrs, self_closing=tag in _VOID_TAGS)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._start(tag, attrs, self_closing=True)

    def handle_endtag(self, tag: str) -> None:
        # tolerant close: pop to the nearest open element of this tag
        # (ignore stray end tags), closing any captures on the way
        if tag not in self._tags:
            return
        while self._tags:
            depth = len(self._stack)
            t = self._tags.pop()
            self._stack.pop()
            while self._open and self._open[-1][0] >= depth:
                d, mtag, mattrs, parts = self._open.pop()
                self.matches.append(
                    (mtag, mattrs, _WS.sub(" ", "".join(parts)).strip())
                )
            if t == tag:
                break

    def handle_data(self, data: str) -> None:
        if data:
            for cap in self._open:
                cap[3].append(data)

    def feed_html(self, html: bytes | str) -> list[tuple[str, dict, str]]:
        if isinstance(html, (bytes, bytearray, memoryview)):
            html = bytes(html).decode("utf-8", errors="replace")
        self.feed(html)
        self.close()
        # close any still-open captures at EOF (unclosed markup)
        while self._open:
            d, mtag, mattrs, parts = self._open.pop()
            self.matches.append(
                (mtag, mattrs, _WS.sub(" ", "".join(parts)).strip())
            )
        return self.matches


def select(html: bytes | str, selector: str | CompiledSelector):
    """All elements of `html` matching `selector`, in document order of
    their CLOSE (nested matches inner-first), as (tag, attrs, text)."""
    compiled = (
        selector
        if isinstance(selector, CompiledSelector)
        else compile_selector(selector)
    )
    return CssMatcher(compiled).feed_html(html)


def select_attr(html: bytes | str, selector: str | CompiledSelector,
                attr: str) -> list[str]:
    """Attribute values of matched elements (missing/empty skipped) —
    e.g. select_attr(html, 'a.thread-title', 'href')."""
    return [m[1][attr] for m in select(html, selector) if m[1].get(attr)]


def select_text(html: bytes | str, selector: str | CompiledSelector) -> list[str]:
    """Collapsed text content of matched elements."""
    return [m[2] for m in select(html, selector)]


def make_css_batch_kernel(selector: str, attr: str | None = None,
                          html_col: str = "html", out: str = "selected"):
    """Arrow batch kernel factory for the A32 registry: returns a
    `pa.Table -> pa.Table` callable appending a list<string> column of
    per-page selector hits (attribute values when `attr` is given,
    element text otherwise). The selector compiles HERE — once at
    pipeline construction — and the compiled object rides the closure
    into every worker."""
    import pyarrow as pa

    compiled = compile_selector(selector)

    def kernel(t: pa.Table) -> pa.Table:
        vals = []
        for h in t[html_col].to_pylist():
            if attr is None:
                vals.append(select_text(h, compiled))
            else:
                vals.append(select_attr(h, compiled, attr))
        return t.append_column(out, pa.array(vals, pa.list_(pa.string())))

    return kernel


def selector_collect_links(selector: str, attr: str = "href"):
    """Build a CrawlPolicy.collect_links_html hook from a CSS selector:
    per fetched page, the matched elements' `attr` values — resolved
    against the page url like real hrefs (the collect hooks' contract
    is ABSOLUTE raw urls) — enter the normal rewrite→canonicalize→
    filter→seen chain as kind='extra' candidates — the reference's
    selector-driven link collection re-expressed on the engine's hook
    surface."""
    from urllib.parse import urljoin

    compiled = compile_selector(selector)

    def hook(url: str, html: bytes | str) -> list[str]:
        return [urljoin(url, v) for v in select_attr(html, compiled, attr)]

    return hook
