"""Minimal CSS-selector extraction over streaming HTML events — the
Fizzler analog (SURVEY.md §1.1: the reference's site scrapers are
CSS-selector-driven via [pub:Shaman.FizzlerCssSelectors]; A31).

Supported grammar (the working subset a site scraper actually uses):
  compound:     tag, *, #id, .class, [attr], [attr=value] (value bare
                or quoted), [attr^=v] [attr$=v] [attr*=v] [attr~=v]
                [attr|=v], :first-child, :nth-child(An+B|n|odd|even),
                :first-of-type, :nth-of-type(An+B|n|odd|even),
                :not(compound) (CSS3 scope: the argument is a compound
                without its own parenthesized pseudo-class, so
                :not(.ad), :not([rel=nofollow]), :not(:first-child)
                compile; :not(:nth-child(2)) does not),
                any combination (a.thread-title[rel=next]:nth-child(2))
  combinators:  descendant (whitespace), child (>), adjacent sibling
                (+), general sibling (~)
  lists:        comma-separated alternatives

Matching is SAX-style over the same event stream the crawl's
extractors use (stdlib HTMLParser events, engine/kernels.py:357+): an
open-element stack carries (tag, id, classes, attrs, child-index,
type-index) and each start tag is tested right-to-left against the
compiled selector —
the rightmost compound against the element itself, ancestors scanned
upward for descendant steps, the immediate parent pinned for child
steps, PRECEDING siblings (records kept per open level) for +/~ steps.
No DOM is built: memory is O(depth + matches) for selectors without
sibling combinators; +/~ additionally keep the already-seen sibling
records of each OPEN level (O(fan-out per open ancestor), bounded by
page width — still never the whole tree).

Real-world-markup tolerance:
  - HTML void elements (br, img, …) are treated as self-closing so
    unclosed markup can't wedge the stack.
  - Minimal implied-end-tag rules (HTML5 subset): a new <li> closes an
    open <li> at the stack top, <td>/<th>/<tr> close open cell/row,
    <dt>/<dd> and <option> likewise, and block-level start tags close
    an open <p> — so sibling/child combinators behave on the unclosed
    markup real sites emit. Only the STACK TOP is implied-closed
    (never a scan down the stack), which naturally scopes nested
    lists/tables.
  - Descendant text inside <script>/<style>/<template> is NOT captured
    (mirrors kernels.extract_text).

Element text is captured while a matched element is open (same
whitespace collapsing as kernels.extract_text's joiner).

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

# implied-end-tag rules (HTML5 subset): starting tag X closes a STACK
# TOP element in _IMPLIED_CLOSERS[X]; block starters close an open <p>
_IMPLIED_CLOSERS = {
    "li": frozenset(("li",)),
    "dt": frozenset(("dt", "dd")),
    "dd": frozenset(("dt", "dd")),
    "tr": frozenset(("tr", "td", "th")),
    "td": frozenset(("td", "th")),
    "th": frozenset(("td", "th")),
    "option": frozenset(("option",)),
}
_BLOCK_CLOSES_P = frozenset(
    "address article aside blockquote div dl fieldset figure footer form "
    "h1 h2 h3 h4 h5 h6 header hr main nav ol p pre section table ul".split()
)

# text inside these is never captured (kernels.extract_text parity)
_SKIP_TEXT_TAGS = frozenset(("script", "style", "template"))

_WS = re.compile(r"\s+")

_TOKEN = re.compile(
    r"""
    (?P<tag>[a-zA-Z][a-zA-Z0-9-]*|\*)
  | \#(?P<id>[^\s#.\[>,:+~]+)
  | \.(?P<cls>[^\s#.\[>,:+~]+)
  | \[(?P<attr>[a-zA-Z][a-zA-Z0-9_:-]*)
      (?:(?P<op>[~^$*|]?=)(?P<q>["']?)(?P<val>[^\]]*?)(?P=q))?\]
  | :(?P<pseudo>[a-zA-Z-]+)(?:\((?P<parg>[^)]*)\))?
    """,
    re.X,
)

_NTH = re.compile(
    r"^\s*(?:(?P<a>[+-]?\d*)n\s*(?P<b>[+-]\s*\d+)?|(?P<c>[+-]?\d+)"
    r"|(?P<word>odd|even))\s*$"
)


def _parse_nth(arg: str) -> tuple[int, int]:
    """:nth-child microsyntax → (a, b) of An+B. odd=(2,1), even=(2,0),
    bare integer n=(0,n)."""
    m = _NTH.match(arg)
    if m is None:
        raise ValueError(f"unsupported :nth-child argument {arg!r}")
    if m.group("word"):
        return (2, 1) if m.group("word") == "odd" else (2, 0)
    if m.group("c") is not None:
        return (0, int(m.group("c")))
    a_txt = m.group("a")
    a = 1 if a_txt in ("", "+") else (-1 if a_txt == "-" else int(a_txt))
    b = int(m.group("b").replace(" ", "")) if m.group("b") else 0
    return (a, b)


def _nth_matches(a: int, b: int, i: int) -> bool:
    """i (1-based child index) == a*k + b for some integer k >= 0."""
    if a == 0:
        return i == b
    return (i - b) % a == 0 and (i - b) // a >= 0


class _Compound:
    """One compound selector: all conditions must hold on ONE element.
    Element record: (tag, id, classes, attrs, child_index,
    type_index) — type_index is the 1-based position among same-tag
    siblings (:nth-of-type)."""

    __slots__ = ("tag", "id", "classes", "attrs", "nth", "nth_type", "nots")

    def __init__(self, tag, id_, classes, attrs, nth, nots=(), nth_type=None):
        self.tag = tag          # str | None (None = '*')
        self.id = id_           # str | None
        self.classes = classes  # frozenset[str]
        self.attrs = attrs      # tuple[(name, op, value|None), ...]
        self.nth = nth          # (a, b) | None  (:first-child = (0,1))
        self.nth_type = nth_type  # (a, b) | None (:first-of-type = (0,1))
        self.nots = nots        # tuple[_Compound, ...] (:not args)

    def matches(self, el) -> bool:
        tag, eid, classes, attrs, idx, tidx = el
        if self.tag is not None and tag != self.tag:
            return False
        if self.id is not None and eid != self.id:
            return False
        if self.classes and not self.classes <= classes:
            return False
        for name, op, val in self.attrs:
            if name not in attrs:
                return False
            if val is None:
                continue
            v = attrs[name]
            if op == "=":
                if v != val:
                    return False
            elif op == "~=":
                if not val or val not in v.split():
                    return False
            elif op == "^=":
                if not val or not v.startswith(val):
                    return False
            elif op == "$=":
                if not val or not v.endswith(val):
                    return False
            elif op == "*=":
                if not val or val not in v:
                    return False
            elif op == "|=":
                if v != val and not v.startswith(val + "-"):
                    return False
        if self.nth is not None and not _nth_matches(*self.nth, idx):
            return False
        if self.nth_type is not None and not _nth_matches(*self.nth_type, tidx):
            return False
        for neg in self.nots:
            if neg.matches(el):
                return False
        return True


class CompiledSelector:
    """A parsed selector list: [(steps, combinators)] per alternative,
    where steps is a tuple of _Compound (leftmost first) and
    combinators[i] is the combinator BETWEEN steps[i] and steps[i+1]
    (' ' descendant, '>' child, '+' adjacent sibling, '~' general
    sibling)."""

    __slots__ = ("alternatives", "source", "needs_siblings", "needs_index")

    def __init__(self, alternatives, source):
        self.alternatives = alternatives
        self.source = source
        self.needs_siblings = any(
            c in ("+", "~") for _, combos in alternatives for c in combos
        )
        self.needs_index = self.needs_siblings or any(
            s.nth is not None or s.nth_type is not None
            or any(n.nth is not None or n.nth_type is not None
                   for n in s.nots)
            for steps, _ in alternatives
            for s in steps
        )

    def matches_path(self, stack, levels=None) -> bool:
        """True if the TOP element of `stack` (list of element records,
        root first) is matched by any alternative. `levels[i]` is the
        list of already-seen sibling records at stack depth i (the
        children so far of stack[i-1]); required only when the selector
        uses +/~ combinators."""
        for steps, combos in self.alternatives:
            if self._match_alt(steps, combos, stack, levels):
                return True
        return False

    @staticmethod
    def _match_alt(steps, combos, stack, levels) -> bool:
        # right-to-left: rightmost compound against stack[-1]
        if not stack or not steps[-1].matches(stack[-1]):
            return False

        def up(step_i: int, pos: int, node) -> bool:
            # steps[step_i] already matched `node` at stack depth pos;
            # try to match steps[:step_i] leftward. A sibling move
            # substitutes a CLOSED sibling record for stack[pos] —
            # valid because siblings share every ancestor.
            if step_i == 0:
                return True
            combo = combos[step_i - 1]
            want = steps[step_i - 1]
            if combo == ">":
                return (
                    pos > 0
                    and want.matches(stack[pos - 1])
                    and up(step_i - 1, pos - 1, stack[pos - 1])
                )
            if combo in ("+", "~"):
                if levels is None or pos >= len(levels):
                    return False
                sibs = levels[pos]
                idx = node[4]  # 1-based; sibs[idx-1] is node itself
                if combo == "+":
                    if idx >= 2 and want.matches(sibs[idx - 2]):
                        return up(step_i - 1, pos, sibs[idx - 2])
                    return False
                for j in range(idx - 2, -1, -1):
                    if want.matches(sibs[j]) and up(step_i - 1, pos, sibs[j]):
                        return True
                return False
            for anc in range(pos - 1, -1, -1):
                if want.matches(stack[anc]) and up(step_i - 1, anc, stack[anc]):
                    return True
            return False

        return up(len(steps) - 1, len(stack) - 1, stack[-1])


def _parse_compound(s: str) -> _Compound:
    if not s:
        raise ValueError("empty compound selector")
    tag = None
    id_ = None
    classes = set()
    attrs = []
    nth = None
    nth_type = None
    nots: list[_Compound] = []
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
            attrs.append((m.group("attr").lower(), m.group("op"), m.group("val")))
        elif m.group("pseudo"):
            name = m.group("pseudo").lower()
            if name == "first-child":
                if m.group("parg") is not None:
                    raise ValueError(":first-child takes no argument")
                nth = (0, 1)
            elif name == "nth-child":
                if m.group("parg") is None:
                    raise ValueError(":nth-child requires an argument")
                nth = _parse_nth(m.group("parg"))
            elif name == "first-of-type":
                if m.group("parg") is not None:
                    raise ValueError(":first-of-type takes no argument")
                nth_type = (0, 1)
            elif name == "nth-of-type":
                if m.group("parg") is None:
                    raise ValueError(":nth-of-type requires an argument")
                nth_type = _parse_nth(m.group("parg"))
            elif name == "not":
                if not m.group("parg") or not m.group("parg").strip():
                    raise ValueError(":not requires an argument")
                neg = _parse_compound(m.group("parg").strip())
                if neg.nots:
                    raise ValueError(":not cannot nest")
                nots.append(neg)
            else:
                # :last-child & friends need the parent CLOSED before
                # the index is known — impossible at start-tag time in
                # a single streaming pass; fail fast at compile.
                raise ValueError(f"unsupported pseudo-class :{name}")
        pos = m.end()
    return _Compound(tag, id_, frozenset(classes), tuple(attrs), nth,
                     tuple(nots), nth_type)


def _split_alt(alt: str) -> list[str]:
    """Split one alternative into compound strings and combinator
    symbols, honoring bracket/paren nesting — '~' in [rel~=v] and '+'
    in :nth-child(2n+1) are NOT combinators."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in alt:
        if ch in "[(":
            depth += 1
            buf.append(ch)
        elif ch in "])":
            depth -= 1
            buf.append(ch)
        elif depth == 0 and ch in ">+~":
            if buf:
                parts.append("".join(buf))
                buf = []
            parts.append(ch)
        elif depth == 0 and ch.isspace():
            if buf:
                parts.append("".join(buf))
                buf = []
        else:
            buf.append(ch)
    if buf:
        parts.append("".join(buf))
    return parts


def compile_selector(selector: str) -> CompiledSelector:
    """Parse a selector list into a CompiledSelector. Raises ValueError
    on syntax outside the supported subset (fail fast at pipeline
    construction, not inside a worker)."""
    alternatives = []
    for alt in selector.split(","):
        alt = alt.strip()
        if not alt:
            raise ValueError(f"empty alternative in selector {selector!r}")
        parts = _split_alt(alt)
        steps = []
        combos = []
        expect_compound = True
        for p in parts:
            if p in (">", "+", "~"):
                if expect_compound or not steps:
                    raise ValueError(f"dangling {p!r} in selector {selector!r}")
                combos[-1] = p
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


def _element_of(tag: str, attrs_list, idx: int, tidx: int) -> tuple:
    attrs = {}
    for k, v in attrs_list:
        if k not in attrs:  # first occurrence wins (browser behavior)
            attrs[k] = v if v is not None else ""
    classes = frozenset(attrs.get("class", "").split())
    return (tag, attrs.get("id"), classes, attrs, idx, tidx)


class CssMatcher(HTMLParser):
    """Single-pass selector matcher. Collects matched elements as
    (tag, attrs: dict, text: str) where text is the element's
    whitespace-collapsed descendant text (script/style text excluded)."""

    def __init__(self, compiled: CompiledSelector) -> None:
        super().__init__(convert_charrefs=True)
        self._sel = compiled
        self._stack: list[tuple] = []
        self._tags: list[str] = []
        # _levels[i]: sibling records already seen at stack depth i
        # (children so far of stack[i-1]; _levels[0] = root elements).
        # Record lists are kept only for +/~ selectors; otherwise just
        # per-level child COUNTS (for :nth-child) — O(depth) ints.
        self._keep_sibs = compiled.needs_siblings
        self._levels: list[list] = [[]]
        self._counts: list[int] = [0]
        # per-level tag -> count of same-tag siblings so far (the
        # 1-based :nth-of-type index) — O(depth × distinct tags/level)
        self._type_counts: list[dict] = [{}]
        self._skip_text = 0  # >0 while inside script/style/template
        # active captures: (depth, tag, attrs, [text parts])
        self._open: list[list] = []
        self.matches: list[tuple[str, dict, str]] = []

    def _pop_one(self) -> None:
        """Close the top open element: pop stacks, discard its child
        level, and finalize any captures anchored at this depth."""
        depth = len(self._stack)
        t = self._tags.pop()
        self._stack.pop()
        if len(self._levels) > depth:
            self._levels.pop()
            self._counts.pop()
            self._type_counts.pop()
        if t in _SKIP_TEXT_TAGS and self._skip_text:
            self._skip_text -= 1
        while self._open and self._open[-1][0] >= depth:
            d, mtag, mattrs, parts = self._open.pop()
            self.matches.append(
                (mtag, mattrs, _WS.sub(" ", "".join(parts)).strip())
            )

    def _implied_close(self, tag: str) -> None:
        closers = _IMPLIED_CLOSERS.get(tag)
        while self._tags:
            top = self._tags[-1]
            if closers is not None and top in closers:
                self._pop_one()
                continue
            if top == "p" and tag in _BLOCK_CLOSES_P:
                self._pop_one()
                continue
            break

    def _start(self, tag: str, attrs_list, self_closing: bool) -> None:
        self._implied_close(tag)
        self._counts[-1] += 1
        tc = self._type_counts[-1]
        tc[tag] = tc.get(tag, 0) + 1
        el = _element_of(tag, attrs_list, self._counts[-1], tc[tag])
        if self._keep_sibs:
            self._levels[-1].append(el)
        self._stack.append(el)
        self._tags.append(tag)
        self._levels.append([])
        self._counts.append(0)
        self._type_counts.append({})
        if tag in _SKIP_TEXT_TAGS:
            self._skip_text += 1
        if self._sel.matches_path(
            self._stack, self._levels if self._keep_sibs else None
        ):
            if self_closing:
                self.matches.append((tag, el[3], ""))
            else:
                self._open.append([len(self._stack), tag, el[3], []])
        if self_closing:
            self._pop_one()

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
            t = self._tags[-1]
            self._pop_one()
            if t == tag:
                break

    def handle_data(self, data: str) -> None:
        if data and not self._skip_text:
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
