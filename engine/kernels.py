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


def canonicalize_url(url: str) -> str:
    """Canonical form: lowercase scheme+host, no fragment, no default
    port, dot segments resolved, empty path -> "/", query kept verbatim
    (order preserved), userinfo kept. Non-http(s) URLs are returned
    stripped-of-fragment only. Idempotent (property-tested)."""
    u = url.strip()
    if not u:
        return u
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
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # malformed input: keep whatever was parsed (deterministic)
    return _WS_RUN.sub(_collapse, "".join(p.parts)).strip()


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
    p = _LinkExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    out: list[tuple[str, str, int]] = []
    for raw, kind in p.links:
        h = raw.strip()
        if not h or h.startswith("#") or h.lower().startswith(_BAD_SCHEMES):
            continue
        try:
            absu = urljoin(base_url, h)
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
        self.handle_starttag(tag, attrs)

    def handle_data(self, data: str) -> None:
        if not self._skip and data:
            self.parts.append(data.replace(_BREAK, ""))


LINKS_TYPE = pa.list_(
    pa.struct([("url", pa.string()), ("kind", pa.string()), ("idx", pa.int32())])
)


def extract_page(html: bytes | str, base_url: str) -> tuple[str, list[tuple[str, str, int]]]:
    """(extract_text(html), extract_links(html, base_url)) in ONE parse."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", "replace")
    p = _PageExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    text = _WS_RUN.sub(_collapse, "".join(p.parts)).strip()
    out: list[tuple[str, str, int]] = []
    for raw, kind in p.links:
        h = raw.strip()
        if not h or h.startswith("#") or h.lower().startswith(_BAD_SCHEMES):
            continue
        try:
            absu = urljoin(base_url, h)
        except ValueError:
            continue
        out.append((absu, kind, len(out)))
    return text, out


def extract_page_batch(t: pa.Table, html_col: str = "html",
                       url_col: str = "url") -> pa.Table:
    """Set/replace `text` and append `links` (list<struct>) in one
    HTML pass per row."""
    urls = t[url_col].to_pylist()
    texts: list[str] = []
    links: list[list[dict]] = []
    for u, h in zip(urls, t[html_col].to_pylist()):
        if h is None:
            texts.append("")
            links.append([])
            continue
        txt, ls = extract_page(h, u)
        texts.append(txt)
        links.append([{"url": a, "kind": k, "idx": i} for a, k, i in ls])
    arr = pa.array(texts, type=pa.string())
    if "text" in t.column_names:
        t = t.set_column(t.column_names.index("text"), "text", arr)
    else:
        t = t.append_column("text", arr)
    return t.append_column("links", pa.array(links, type=LINKS_TYPE))


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
