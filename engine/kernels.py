"""Deterministic scalar/batch kernels (SURVEY.md §2A A6-A12, §2B B13-B16).

Everything here is pure Python + stdlib + pyarrow/numpy so outputs are
byte-stable across machines, Python processes and Ray workers — the
"byte-identical extracted text per url" invariant (BASELINE.json:15) is
enforced against golden fixtures in tests/fixtures/extract/ and must
never drift: changing `extract_text` output for ANY input is a breaking
change that invalidates the fixtures.

Reference behavior being re-expressed (all [pub], see SURVEY.md §0 —
the snapshot at /root/reference is empty, so no file:line citations are
possible):
  - URL canonicalization ~ Shaman.Http LazyUri semantics: lowercase
    scheme+host, strip fragment, drop default port, resolve dot
    segments, keep query order (SURVEY.md §2A A6).
  - Link extraction ~ WebsiteScraper's page-link vs prerequisite
    distinction: a[href] are links; img/src, script/src, link/href are
    prerequisites (SURVEY.md §2A A8).
  - Text extraction ~ Shaman.Dom InnerText-style visible text with
    block-element newlines (SURVEY.md §2A A9).
"""

from __future__ import annotations

import hashlib
import re
from html import parser as _hp
from html import unescape as _unescape
from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# URL canonicalization (A6) + keys (A7)
# ---------------------------------------------------------------------------

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # re-add trailing slash semantics for /a/. and /a/..
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    if not res.startswith("/"):
        res = "/" + res
    return res


# "Already canonical" fast-path detector: a url matching this AND
# containing no "/." in its path is a FIXED POINT of the full
# canonicalization below (lowercase scheme+host, no port/userinfo/
# fragment, non-empty path, no dot segments, query verbatim), so it
# can be returned as-is. Anything unusual (uppercase host, port,
# "@", "[", "#", missing path, "."-ish segment — incl. harmless
# "/.hidden" false positives) takes the slow path. Equality with the
# full path is locked by a differential property test. This check is
# ~4x cheaper than urlsplit and link canonicalization runs per
# extracted link in the crawl's hot path.
_CANON_FAST = re.compile(
    # query group requires >=1 char: a trailing bare "?" (empty query)
    # is NOT a fixed point — urlsplit drops it — so it must fall
    # through to _canonicalize_slow (regression: "http://h.example/a?")
    r"https?://[a-z0-9.\-]+/[^\x00-\x20\x7f?#]*(?:\?[^\x00-\x20\x7f#]+)?\Z"
)


def canonicalize_url(url: str) -> str:
    """Canonical form: lowercase scheme+host, no fragment, no default
    port, dot segments resolved, empty path -> "/", query kept verbatim
    (order preserved), userinfo kept. Non-http(s) URLs are returned
    stripped-of-fragment only. Idempotent (property-tested)."""
    u = url.strip()
    if not u:
        return u
    if _CANON_FAST.match(u) and "/." not in u.split("?", 1)[0]:
        # fixed point of _canonicalize_slow (differential-tested):
        # the classes exclude every char urlsplit would strip or
        # remove (C0 controls, space, DEL, tab/cr/lf)
        return u
    return _canonicalize_slow(u)


def _canonicalize_slow(u: str) -> str:
    try:
        parts = urlsplit(u)
    except ValueError:
        return u
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        # strip again: dropping the fragment can expose trailing
        # whitespace (e.g. "0\r#") — idempotence is property-tested
        return u.split("#", 1)[0].strip()
    netloc = parts.netloc
    userinfo = ""
    hostport = netloc
    if "@" in netloc:
        userinfo, hostport = netloc.rsplit("@", 1)
        userinfo += "@"
    host, port = hostport, ""
    if hostport.startswith("["):  # ipv6 literal
        m = re.match(r"^(\[[^\]]*\])(?::(\d*))?$", hostport)
        if m:
            host, port = m.group(1), m.group(2) or ""
    elif ":" in hostport:
        host, port = hostport.rsplit(":", 1)
    host = host.lower()
    if port and port != _DEFAULT_PORTS.get(scheme):
        hostport = f"{host}:{port}"
    else:
        hostport = host
    path = _remove_dot_segments(parts.path) if parts.path else "/"
    q = f"?{parts.query}" if parts.query else ""
    return f"{scheme}://{userinfo}{hostport}{path}{q}"


def host_of(url: str) -> str:
    try:
        netloc = urlsplit(url).netloc
    except ValueError:
        return ""
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    if netloc.startswith("["):
        m = re.match(r"^(\[[^\]]*\])", netloc)
        return m.group(1).lower() if m else netloc.lower()
    return netloc.rsplit(":", 1)[0].lower() if ":" in netloc else netloc.lower()


def sha1_key(url: str) -> bytes:
    """20-byte URL identity key: sha1 of the canonical url bytes
    (north_star, BASELINE.json:6). Callers pass already-canonical urls."""
    return hashlib.sha1(url.encode("utf-8", "surrogatepass")).digest()


def key64(url_key: bytes) -> int:
    """First 8 bytes of the sha1 key as an unsigned 64-bit int — used
    for shard routing and as the deterministic ordering component of
    discovery_seq."""
    return int.from_bytes(url_key[:8], "big")


def host_hash64(host: str) -> int:
    """Stable 64-bit host hash (frontier shuffle key, SURVEY.md §4.2).
    sha1-based instead of xxhash (no external deps; determinism wins)."""
    return int.from_bytes(hashlib.sha1(host.encode("utf-8", "surrogatepass")).digest()[:8], "big")


def discovery_seq(depth: int, url_key: bytes) -> int:
    """Deterministic scalar ordering key: breadth-first by depth, then
    by a 48-bit prefix of the url key. A pure function of (depth, url),
    so identical at any parallelism (SURVEY.md §4.2 design 2); sorts
    that use it also tie-break on url_key."""
    return (int(depth) << 48) | int.from_bytes(url_key[:6], "big")


# ---------------------------------------------------------------------------
# HTML -> visible text (A9) — BYTE-STABLE, fixture-locked
# ---------------------------------------------------------------------------

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
_BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "body", "br",
        "caption", "dd", "div", "dl", "dt", "fieldset", "figcaption",
        "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
        "head", "header", "hr", "html", "legend", "li", "main", "nav",
        "ol", "option", "p", "pre", "section", "select", "table",
        "tbody", "td", "textarea", "tfoot", "th", "thead", "title",
        "tr", "ul",
    }
)
_BREAK = "\x00"
_WS_RUN = re.compile(r"[ \t\r\n\f\v\x00\u00a0]+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS:
            self.parts.append(_BREAK)

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self._skip:
                self._skip -= 1
        elif tag in _BLOCK_TAGS:
            self.parts.append(_BREAK)

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self.parts.append(_BREAK)

    def handle_data(self, data: str) -> None:
        if not self._skip and data:
            self.parts.append(data.replace(_BREAK, ""))


def _collapse(m: re.Match) -> str:
    return "\n" if _BREAK in m.group(0) else " "


# Callback-free equivalent of _WS_RUN.sub(_collapse, s).strip(): by
# construction every \x00 in the joined parts is a break marker (data
# parts had literal \x00 stripped by handle_data), so a run containing
# one collapses to "\n" (NUL pass + final replace) and any other
# whitespace run to " ". Equality with the callback form is fixture-
# and fuzz-locked (tests/test_kernels.py).
#
# The plain pass is memchr-gated str.replace chains instead of one
# regex sub: on clean single-spaced body text (the common page body)
# every gate misses and the whole pass is a few C scans; the regex-sub
# form measured 3.0 ms per 75 KB page and was 98% of extract_page.
# Equivalence: the NUL pass (gated on a literal \x00 presence - its
# pattern cannot match without one) absorbs whitespace around break
# markers exactly as before; mapping each remaining non-space
# whitespace char to " " and collapsing "  +" runs is the same fixed
# point as replacing every maximal whitespace run with " ".
_WS_ALL = " \t\r\n\f\v\u00a0"
_WS_CHARS_PLAIN = "\t\r\n\f\v\u00a0"
_SPACE_RUN = re.compile(" {2,}")


def _absorb_breaks(joined: str) -> str:
    """Replace every maximal [whitespace|\x00]-run containing a break
    marker with a single \x00 — via C-speed split/strip/join instead
    of a regex whose leading [ws]* class forces a per-position scan
    (measured ~1 ms per 75 KB page). Middle segments that strip to
    nothing merge their surrounding markers, exactly like the regex."""
    segs = joined.split("\x00")
    mid = [t for t in (s.strip(_WS_ALL) for s in segs[1:-1]) if t]
    return "\x00".join([segs[0].rstrip(_WS_ALL)] + mid + [segs[-1].lstrip(_WS_ALL)])


def _collapse_text(joined: str) -> str:
    if "\x00" in joined:
        joined = _absorb_breaks(joined)
    for c in _WS_CHARS_PLAIN:
        if c in joined:
            joined = joined.replace(c, " ")
    if "  " in joined:
        joined = _SPACE_RUN.sub(" ", joined)
    return joined.replace("\x00", "\n").strip()


def extract_text(html: bytes | str) -> str:
    """Visible-text extraction (InnerText-style, block-element newlines).

    Rules (frozen; golden fixtures in tests/fixtures/extract/):
      - script/style/noscript/template content dropped;
      - entities decoded (&amp; -> &, numeric charrefs too);
      - any whitespace run that crosses a block-element boundary
        collapses to one "\\n"; other whitespace runs (incl. NBSP)
        collapse to one " ";
      - leading/trailing whitespace stripped;
      - input bytes decoded utf-8 with replacement (deterministic).
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    parts, _ = _page_events(html)
    return _collapse_text("".join(parts))


# ---------------------------------------------------------------------------
# Link extraction (A8)
# ---------------------------------------------------------------------------

_PREREQ_ATTRS = {"img": "src", "script": "src", "link": "href"}
_BAD_SCHEMES = ("javascript:", "mailto:", "data:", "tel:", "about:")


class _LinkExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []  # (raw_href, kind)

    def _take(self, tag: str, attrs) -> None:
        d = dict(attrs)
        if tag == "a":
            href = d.get("href")
            if href:
                self.links.append((href, "link"))
        elif tag in _PREREQ_ATTRS:
            v = d.get(_PREREQ_ATTRS[tag])
            if v:
                self.links.append((v, "prereq"))

    handle_starttag = _take

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._take(tag, attrs)


def extract_links(html: bytes | str, base_url: str) -> list[tuple[str, str, int]]:
    """All out-links of a page in document order.

    Returns [(absolute_url, kind, link_index)] where kind is "link"
    (a[href]) or "prereq" (img/src, script/src, link/href) — the
    reference's isPrerequisite distinction. hrefs with non-fetchable
    schemes and bare fragments are dropped; the rest resolve against
    base_url (RFC 3986 join) and are NOT yet canonicalized (A11 rewrite
    runs before A6 canonicalize in the pipeline)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    _, links = _page_events(html)
    return _resolve_links(links, base_url)


def _resolve_links(links: list[tuple[str, str]], base_url: str) -> list[tuple[str, str, int]]:
    ctx = _base_ctx(base_url)
    out: list[tuple[str, str, int]] = []
    for raw, kind in links:
        h = raw.strip()
        if not h or h.startswith("#") or h.lower().startswith(_BAD_SCHEMES):
            continue
        try:
            absu = _fast_urljoin(ctx, base_url, h)
        except ValueError:
            continue
        out.append((absu, kind, len(out)))
    return out


# ---------------------------------------------------------------------------
# Arrow batch wrappers (used from map_batches, batch_format="pyarrow")
# ---------------------------------------------------------------------------

def canonicalize_batch(t: pa.Table, col: str = "url", out: str = "url") -> pa.Table:
    urls = [canonicalize_url(u) if u is not None else None for u in t[col].to_pylist()]
    arr = pa.array(urls, type=pa.string())
    if out in t.column_names:
        return t.set_column(t.column_names.index(out), out, arr)
    return t.append_column(out, arr)


def key_batch(t: pa.Table, col: str = "url") -> pa.Table:
    """Append url_key (sha1/20B), host, host_hash, key64 columns."""
    urls = t[col].to_pylist()
    keys = [sha1_key(u) for u in urls]
    hosts = [host_of(u) for u in urls]
    t = t.append_column("url_key", pa.array(keys, type=pa.binary(20)))
    t = t.append_column("host", pa.array(hosts, type=pa.string()))
    t = t.append_column(
        "host_hash", pa.array([host_hash64(h) for h in hosts], type=pa.uint64())
    )
    return t


def extract_text_batch(t: pa.Table, html_col: str = "html", out: str = "text") -> pa.Table:
    texts = [extract_text(h) if h is not None else "" for h in t[html_col].to_pylist()]
    arr = pa.array(texts, type=pa.string())
    if out in t.column_names:
        return t.set_column(t.column_names.index(out), out, arr)
    return t.append_column(out, arr)


def extract_links_batch(t: pa.Table, html_col: str = "html", url_col: str = "url",
                        depth_col: str | None = "depth") -> pa.Table:
    """One output row per (page, out-link): schema engine.schemas.LINKS."""
    urls = t[url_col].to_pylist()
    htmls = t[html_col].to_pylist()
    depths = t[depth_col].to_pylist() if depth_col and depth_col in t.column_names else [0] * len(urls)
    o_url: list[str] = []
    o_kind: list[str] = []
    o_parent: list[str] = []
    o_pdepth: list[int] = []
    o_idx: list[int] = []
    for u, h, d in zip(urls, htmls, depths):
        if h is None:
            continue
        for absu, kind, idx in extract_links(h, u):
            o_url.append(absu)
            o_kind.append(kind)
            o_parent.append(u)
            o_pdepth.append(d if d is not None else 0)
            o_idx.append(idx)
    return pa.table(
        {
            "url": pa.array(o_url, type=pa.string()),
            "kind": pa.array(o_kind, type=pa.string()),
            "parent_url": pa.array(o_parent, type=pa.string()),
            "parent_depth": pa.array(o_pdepth, type=pa.int32()),
            "link_index": pa.array(o_idx, type=pa.int32()),
        }
    )


# ---------------------------------------------------------------------------
# Combined single-pass text + links extraction (perf path)
# ---------------------------------------------------------------------------

class _PageExtractor(HTMLParser):
    """One-pass combination of _TextExtractor and _LinkExtractor with
    IDENTICAL semantics (locked by test_combined_equals_separate and
    the extract fixtures) — halves HTML parse cost in the crawl's
    fetch stage."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip = 0
        self.links: list[tuple[str, str]] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS:
            self.parts.append(_BREAK)
        if tag == "a" or tag in _PREREQ_ATTRS:
            d = dict(attrs)
            if tag == "a":
                href = d.get("href")
                if href:
                    self.links.append((href, "link"))
            else:
                v = d.get(_PREREQ_ATTRS[tag])
                if v:
                    self.links.append((v, "prereq"))

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self._skip:
                self._skip -= 1
        elif tag in _BLOCK_TAGS:
            self.parts.append(_BREAK)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # Mirrors the SEPARATE extractors' semantics exactly: a
        # self-closing tag emits a block break / collects links but
        # never touches the skip counter (a `<script/>` has no body to
        # skip — routing through handle_starttag here would leak a
        # permanent _skip increment and drop the rest of the page).
        if tag in _BLOCK_TAGS:
            self.parts.append(_BREAK)
        if tag == "a" or tag in _PREREQ_ATTRS:
            d = dict(attrs)
            if tag == "a":
                href = d.get("href")
                if href:
                    self.links.append((href, "link"))
            else:
                v = d.get(_PREREQ_ATTRS[tag])
                if v:
                    self.links.append((v, "prereq"))

    def handle_data(self, data: str) -> None:
        if not self._skip and data:
            self.parts.append(data.replace(_BREAK, ""))


# ---------------------------------------------------------------------------
# Fast single-pass page scanner — EXACT HTMLParser(feed+close) equivalent
# ---------------------------------------------------------------------------
# The crawl's fused fetch stage spends ~54% of its parse time inside
# stdlib HTMLParser's per-event Python dispatch. This scanner produces
# the identical (text parts, raw links) event stream in one pass with a
# "clean tag" fast regex for well-formed markup and STDLIB-VERBATIM
# branch logic (reusing html.parser's own compiled regexes) for
# everything else. The only construct it refuses is `<![` marked
# sections, where it returns None and the caller re-runs the page
# through the reference _PageExtractor. Equality with the stdlib-based
# classes is locked by the extract fixtures, test_fast_scan_* and a
# hypothesis differential fuzzer in tests/test_kernels.py.

_COMMENT_CLOSE = re.compile(r"--\s*>")
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}
# Subset grammar of html.parser's tolerant tag regexes: whenever this
# matches, the stdlib parse is guaranteed to (a) match the same span and
# (b) produce the same (tag, attrs, start/startend) event. Anything
# trickier (odd attr separators, '==', quotes mid-value, '/' between
# attrs, exotic tag-name chars) falls through to the verbatim slow path.
_CLEAN_TAG = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[^\s/=>]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|(?!=)[^>\s'\"]*))?)*)"
    r"\s*(/?)>"
)
_CLEAN_ATTR = re.compile(
    r"\s+([^\s/=>]+)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|(?!=)[^>\s'\"]*))?"
)
_NEED_ATTRS = frozenset(("a", "img", "script", "link"))
_LETTERS_EQ_SLASH = "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _scan_page(s: str) -> tuple[list[str], list[tuple[str, str]]] | None:
    """(text parts, [(raw_href, kind)]) with byte-identical semantics to
    _PageExtractor().feed(s); close(). Returns None on `<![` marked
    sections (caller falls back to the stdlib-based class)."""
    n = len(s)
    i = 0
    parts: list[str] = []
    links: list[tuple[str, str]] = []
    skip = 0
    find = s.find
    startswith = s.startswith
    clean_match = _CLEAN_TAG.match

    def recover(k0: int) -> int:
        # goahead's k<0 recovery with end=1 (we always see the full doc)
        k = find(">", k0 + 1)
        if k < 0:
            k = find("<", k0 + 1)
            if k < 0:
                k = k0 + 1
        else:
            k += 1
        if not skip:
            seg = s[k0:k]
            if "&" in seg:
                seg = _unescape(seg)
            parts.append(seg.replace(_BREAK, "") if _BREAK in seg else seg)
        return k

    while i < n:
        j = find("<", i)
        if j < 0:
            j = n
        if j > i and not skip:
            seg = s[i:j]
            if "&" in seg:
                seg = _unescape(seg)
            parts.append(seg.replace(_BREAK, "") if _BREAK in seg else seg)
        i = j
        if i == n:
            break
        m = clean_match(s, i)
        if m is not None:
            tag = m.group(1)
            if not tag.islower():
                tag = tag.lower()
            selfclose = m.group(3) == "/"
            if selfclose:
                if tag in _BLOCK_TAGS:
                    parts.append(_BREAK)
            elif tag in _SKIP_TAGS:
                skip += 1
            elif tag in _BLOCK_TAGS:
                parts.append(_BREAK)
            if tag in _NEED_ATTRS:
                want = "src" if (tag == "img" or tag == "script") else "href"
                val = None
                attrs_src = m.group(2)
                if attrs_src:
                    for am in _CLEAN_ATTR.finditer(attrs_src):
                        if am.group(1).lower() == want:
                            v = am.group(2)
                            if v is not None and v[:1] in "\"'":
                                v = v[1:-1]  # clean grammar: quotes always paired
                            if v and "&" in v:
                                v = _unescape(v)
                            val = v  # dict(attrs): last occurrence wins
                if val:
                    links.append((val, "link" if tag == "a" else "prereq"))
            i = m.end()
            if not selfclose and (tag == "script" or tag == "style"):
                cm = _CDATA_CLOSE[tag].search(s, i)
                if cm is None:
                    break  # unterminated cdata: rest is dropped (stdlib too)
                if skip:
                    skip -= 1  # the </script> endtag event
                i = cm.end()
            continue
        c = s[i + 1 : i + 2]
        if c and (("a" <= c <= "z") or ("A" <= c <= "Z")):
            # --- verbatim parse_starttag + check_for_whole_start_tag ---
            lm = _hp.locatestarttagend_tolerant.match(s, i)
            jj = lm.end()
            nxt = s[jj : jj + 1]
            if nxt == ">":
                endpos = jj + 1
            elif nxt == "/":
                endpos = jj + 2 if startswith("/>", jj) else -1
            elif nxt == "":
                endpos = -1
            elif nxt in _LETTERS_EQ_SLASH:
                endpos = -1
            else:
                endpos = jj if jj > i else i + 1
            if endpos < 0:
                i = recover(i)
                continue
            tm = _hp.tagfind_tolerant.match(s, i + 1)
            k = tm.end()
            tag = tm.group(1).lower()
            attrs: list[tuple[str, str | None]] = []
            while k < endpos:
                am = _hp.attrfind_tolerant.match(s, k)
                if not am:
                    break
                attrname, rest, attrvalue = am.group(1, 2, 3)
                if not rest:
                    attrvalue = None
                elif attrvalue[:1] == "'" == attrvalue[-1:] or attrvalue[:1] == '"' == attrvalue[-1:]:
                    attrvalue = attrvalue[1:-1]
                if attrvalue:
                    attrvalue = _unescape(attrvalue)
                attrs.append((attrname.lower(), attrvalue))
                k = am.end()
            end = s[k:endpos].strip()
            if end not in (">", "/>"):
                if not skip:  # handle_data of the RAW tag text (no unescape)
                    seg = s[i:endpos]
                    parts.append(seg.replace(_BREAK, "") if _BREAK in seg else seg)
                i = endpos
                continue
            selfclose = end == "/>"
            if selfclose:
                if tag in _BLOCK_TAGS:
                    parts.append(_BREAK)
            elif tag in _SKIP_TAGS:
                skip += 1
            elif tag in _BLOCK_TAGS:
                parts.append(_BREAK)
            if tag in _NEED_ATTRS:
                d = dict(attrs)
                want = "src" if (tag == "img" or tag == "script") else "href"
                v = d.get(want)
                if v:
                    links.append((v, "link" if tag == "a" else "prereq"))
            i = endpos
            if not selfclose and (tag == "script" or tag == "style"):
                cm = _CDATA_CLOSE[tag].search(s, i)
                if cm is None:
                    break
                if skip:
                    skip -= 1
                i = cm.end()
        elif c == "/":
            # --- verbatim parse_endtag (never in cdata mode here) ---
            gt = find(">", i + 1)
            if gt < 0:
                i = recover(i)
                continue
            em = _hp.endtagfind.match(s, i)
            if em:
                tag = em.group(1).lower()
                if tag in _SKIP_TAGS:
                    if skip:
                        skip -= 1
                elif tag in _BLOCK_TAGS:
                    parts.append(_BREAK)
                i = gt + 1
                continue
            nm = _hp.tagfind_tolerant.match(s, i + 2)
            if not nm:
                if s[i : i + 3] == "</>":
                    i += 3
                else:  # bogus comment: skip to '>' (exists: gt >= i+2)
                    i = find(">", i + 2) + 1
                continue
            tag = nm.group(1).lower()
            if tag in _SKIP_TAGS:
                if skip:
                    skip -= 1
            elif tag in _BLOCK_TAGS:
                parts.append(_BREAK)
            i = find(">", nm.end()) + 1  # '>' exists: tag name can't span one
        elif startswith("<!--", i):
            cm2 = _COMMENT_CLOSE.search(s, i + 4)
            i = recover(i) if cm2 is None else cm2.end()
        elif c == "?":
            p = find(">", i + 2)
            i = recover(i) if p < 0 else p + 1
        elif c == "!":
            if startswith("<![", i):
                return None  # marked section: stdlib fallback
            if s[i : i + 9].lower() == "<!doctype":
                p = find(">", i + 9)
                i = recover(i) if p < 0 else p + 1
            else:  # bogus comment
                p = find(">", i + 2)
                i = recover(i) if p < 0 else p + 1
        else:
            # lone '<' is data ('<' at EOF lands here too via end=1 tail)
            if not skip:
                parts.append("<")
            i += 1
    return parts, links


def _page_events(html: str) -> tuple[list[str], list[tuple[str, str]]]:
    try:
        r = _scan_page(html)
    except Exception:
        r = None
    if r is None:
        p = _PageExtractor()
        try:
            p.feed(html)
            p.close()
        except Exception:
            pass  # malformed input: keep whatever was parsed (deterministic)
        return p.parts, p.links
    return r


# ---------------------------------------------------------------------------
# Fast urljoin — exact stdlib-equivalent with a per-page pre-split base
# ---------------------------------------------------------------------------
# urljoin() re-parses the base for every link (~32% of page parse time).
# _BaseCtx caches the split ONCE per page; _fast_urljoin replicates the
# stdlib algorithm for the common href shapes and delegates anything
# subtle (params ';', exotic schemes, empty query/fragment quirks,
# bracketed netlocs, embedded tab/CR/LF) to the real urljoin. Equality
# is locked by a hypothesis differential test.

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")


class _BaseCtx:
    __slots__ = ("scheme", "netloc", "path", "query", "prefix", "dhead", "dtail")

    def __init__(self, scheme: str, netloc: str, path: str, query: str) -> None:
        self.scheme = scheme
        self.netloc = netloc
        self.path = path
        self.query = query
        self.prefix = scheme + "://" + netloc
        d = path.split("/")
        if d[-1] != "":
            del d[-1]
        if not d:
            d = [""]
        self.dhead = d[0]
        self.dtail = [x for x in d[1:] if x]


# Common crawl base shape: lowercase http(s), bracket-free netloc, no
# embedded tab/CR/LF (urlsplit would remove them) — parsed with one
# anchored regex instead of a full urlsplit.
_BASE_FAST = re.compile(
    r"(https?)://([^/?#\[\]\t\r\n]+)([^?#\t\r\n]*)(?:\?([^#\t\r\n]*))?(?:#[^\t\r\n]*)?\Z"
)


def _base_ctx(base_url: str) -> _BaseCtx | None:
    m = _BASE_FAST.match(base_url)
    if m is not None:
        return _BaseCtx(m.group(1), m.group(2), m.group(3), m.group(4) or "")
    try:
        sp = urlsplit(base_url)
    except ValueError:
        return None
    if sp.scheme not in ("http", "https") or not sp.netloc:
        return None
    return _BaseCtx(sp.scheme, sp.netloc, sp.path, sp.query)


def _fast_urljoin(ctx: _BaseCtx | None, base: str, h: str) -> str:
    if ctx is None or not h or h[0] <= " " or "\t" in h or "\r" in h or "\n" in h:
        # leading C0-control/space is lstripped by urlsplit (WHATWG);
        # embedded tab/CR/LF removed everywhere — let stdlib do those
        return urljoin(base, h)
    c0 = h[0]
    if c0 in "hH" and (h.startswith("http://") or h.startswith("https://")):
        sch, rest = ("http", h[7:]) if h[4] == ":" else ("https", h[8:])
        e = len(rest)
        for d in "/?#":
            p = rest.find(d)
            if 0 <= p < e:
                e = p
        netloc = rest[:e]
        if not netloc or "[" in netloc or "]" in netloc:
            return urljoin(base, h)
        if sch != ctx.scheme:
            return h  # stdlib: scheme mismatch returns the href verbatim
        t = rest[e:]
        f = t.find("#")
        frag = t[f + 1 :] if f >= 0 else None
        t2 = t[:f] if f >= 0 else t
        q = t2.find("?")
        query = t2[q + 1 :] if q >= 0 else None
        if frag == "" or query == "" or ";" in t2:
            return urljoin(base, h)  # empty-component drop / params quirks
        return h
    if ":" in h and _SCHEME_RE.match(h):
        return urljoin(base, h)
    f = h.find("#")
    if f >= 0:
        frag = h[f + 1 :]
        hq = h[:f]
    else:
        frag = ""
        hq = h
    q = hq.find("?")
    if q >= 0:
        query = hq[q + 1 :]
        p = hq[:q]
    else:
        query = ""
        p = hq
    if ";" in p:
        return urljoin(base, h)
    if p.startswith("//"):
        sl = p.find("/", 2)
        netloc = p[2:sl] if sl >= 0 else p[2:]
        if not netloc or "[" in netloc or "]" in netloc:
            return urljoin(base, h)
        out = ctx.scheme + "://" + netloc + (p[sl:] if sl >= 0 else "")
        if query:
            out += "?" + query
        if frag:
            out += "#" + frag
        return out
    if not p:
        out = ctx.prefix + ctx.path
        qq = query if query else ctx.query  # stdlib: empty query inherits base's
        if qq:
            out += "?" + qq
        if frag:
            out += "#" + frag
        return out
    if c0 == "/":
        segs = p.split("/")
    else:
        ps = p.split("/")
        if len(ps) > 1:
            segs = [ctx.dhead] + ctx.dtail + [x for x in ps[:-1] if x] + [ps[-1]]
        else:
            segs = [ctx.dhead] + ctx.dtail + ps
    res: list[str] = []
    for sg in segs:
        if sg == "..":
            if res:
                res.pop()
        elif sg != ".":
            res.append(sg)
    if segs[-1] in (".", ".."):
        res.append("")
    path = "/".join(res) or "/"
    if path[0] != "/":
        path = "/" + path
    out = ctx.prefix + path
    if query:
        out += "?" + query
    if frag:
        out += "#" + frag
    return out


LINKS_TYPE = pa.list_(
    pa.struct([("url", pa.string()), ("kind", pa.string()), ("idx", pa.int32())])
)


def extract_page(html: bytes | str, base_url: str) -> tuple[str, list[tuple[str, str, int]]]:
    """(extract_text(html), extract_links(html, base_url)) in ONE parse."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    parts, links = _page_events(html)
    text = _collapse_text("".join(parts))
    return text, _resolve_links(links, base_url)


def extract_page_batch(t: pa.Table, html_col: str = "html",
                       url_col: str = "url") -> pa.Table:
    """Set/replace `text` and append `links` (list<struct>) in one
    HTML pass per row. The links column is assembled from FLAT
    columns + offsets (ListArray.from_arrays over a StructArray)
    instead of per-link Python dicts — pa.array over list-of-dicts
    was ~40% of the batch cost at 8 links/page."""
    urls = t[url_col].to_pylist()
    texts: list[str] = []
    offsets = np.empty(t.num_rows + 1, np.int32)
    offsets[0] = 0
    l_urls: list[str] = []
    l_kinds: list[str] = []
    l_idx: list[int] = []
    for row, (u, h) in enumerate(zip(urls, t[html_col].to_pylist())):
        if h is None:
            texts.append("")
        else:
            txt, ls = extract_page(h, u)
            texts.append(txt)
            for a, k, i in ls:
                l_urls.append(a)
                l_kinds.append(k)
                l_idx.append(i)
        offsets[row + 1] = len(l_urls)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(l_urls, pa.string()),
            pa.array(l_kinds, pa.string()),
            pa.array(l_idx, pa.int32()),
        ],
        names=["url", "kind", "idx"],
    )
    links_arr = pa.ListArray.from_arrays(pa.array(offsets), struct)
    arr = pa.array(texts, type=pa.string())
    if "text" in t.column_names:
        t = t.set_column(t.column_names.index("text"), "text", arr)
    else:
        t = t.append_column("text", arr)
    return t.append_column("links", links_arr.cast(LINKS_TYPE))


def keys_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """FixedSizeBinary(20) column -> (n, 20) uint8 matrix, zero-copy
    per chunk. Vectorized base for shard routing / key64 extraction."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    mats = []
    for c in chunks:
        if len(c) == 0:
            continue
        buf = c.buffers()[1]
        a = np.frombuffer(buf, dtype=np.uint8,
                          count=(c.offset + len(c)) * 20)[c.offset * 20:]
        mats.append(a.reshape(-1, 20))
    if not mats:
        return np.zeros((0, 20), dtype=np.uint8)
    return np.vstack(mats) if len(mats) > 1 else mats[0]


def key64s_of_matrix(mat: np.ndarray) -> np.ndarray:
    """(n,20) uint8 -> n uint64 (big-endian first 8 bytes), vectorized."""
    if mat.shape[0] == 0:
        return np.zeros(0, dtype=np.uint64)
    return np.ascontiguousarray(mat[:, :8]).view(np.dtype(">u8")).ravel().astype(np.uint64)
