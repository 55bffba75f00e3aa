"""Deterministic synthetic pages table + pure-python crawl oracle.

FIXTURES.md §2. Everything is a pure function of (SynthConfig, page
coordinates) — no wall clock, no global RNG — so:
  * Ray workers can generate any slice of the table independently
    (bench-scale generation parallelizes over ray.data.range), and
  * the oracle BFS / schedule simulator recomputes the exact link
    graph driver-side in plain Python without parsing HTML.

The html generator embeds exactly `page_links()` as <a href> (plus one
<img> prerequisite), so parsing the html recovers the same graph the
oracle uses.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import pyarrow as pa

from engine.kernels import canonicalize_url, extract_text

_EPOCH = datetime(2024, 1, 1)

_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "amber", "basalt",
    "cobalt", "dune", "ember", "flint", "garnet", "harbor", "isle",
    "jade", "krait", "lagoon", "mesa", "nectar", "onyx", "prism",
    "quartz", "ridge", "slate", "topaz", "umbra", "vale", "willow",
    "zephyr",
]


@dataclass(frozen=True)
class SynthConfig:
    n_hosts: int = 8
    n_pages: int = 400
    seed: int = 42
    mega_share: float = 0.30     # host 0's share of all pages (skew knob, SURVEY.md §4.2)
    links_per_page: int = 6
    cross_host_prob: float = 0.15
    dead_link_prob: float = 0.05
    noncanon_prob: float = 0.25  # emit a non-canonical variant of the href
    body_words: int = 40

    def pages_per_host(self) -> list[int]:
        mega = max(1, int(self.n_pages * self.mega_share))
        rest = self.n_pages - mega
        others = self.n_hosts - 1
        base, extra = divmod(rest, others) if others else (0, 0)
        return [mega] + [base + (1 if i < extra else 0) for i in range(others)]

    def offsets(self) -> list[int]:
        offs, acc = [], 0
        for c in self.pages_per_host():
            offs.append(acc)
            acc += c
        return offs


def host_name(h: int) -> str:
    return f"host-{h}.example"


def page_url(h: int, i: int) -> str:
    return f"https://host-{h}.example/p/{i}"


def _rng(cfg: SynthConfig, h: int, i: int, salt: int = 0) -> random.Random:
    return random.Random((cfg.seed << 34) ^ (h << 22) ^ (i << 2) ^ salt)


def page_links(cfg: SynthConfig, h: int, i: int) -> list[str]:
    """Raw hrefs of page (h, i) in document order — the ground-truth
    graph. Mostly same-host /p/{j}; some cross-host; occasional dead
    targets and NON-canonical forms (uppercase host, :443, #fragment,
    /a/../ path) to exercise A6."""
    rng = _rng(cfg, h, i, 1)
    sizes = cfg.pages_per_host()
    out: list[str] = []
    for _ in range(cfg.links_per_page):
        th = h
        if cfg.n_hosts > 1 and rng.random() < cfg.cross_host_prob:
            th = rng.randrange(cfg.n_hosts)
        if rng.random() < cfg.dead_link_prob:
            tj = sizes[th] + rng.randrange(50)  # nonexistent page
        else:
            tj = rng.randrange(sizes[th])
        r = rng.random()
        if r < cfg.noncanon_prob / 4:
            href = f"https://HOST-{th}.example/p/{tj}"
        elif r < cfg.noncanon_prob / 2:
            href = f"https://host-{th}.example:443/p/{tj}"
        elif r < 3 * cfg.noncanon_prob / 4:
            href = f"https://host-{th}.example/p/{tj}#sec{rng.randrange(5)}"
        elif r < cfg.noncanon_prob:
            href = f"https://host-{th}.example/x/../p/{tj}"
        elif th == h:
            href = f"/p/{tj}"  # relative same-host
        else:
            href = page_url(th, tj)
        out.append(href)
    return out


def page_body_words(cfg: SynthConfig, h: int, i: int, override_text: str | None = None) -> str:
    if override_text is not None:
        return override_text
    rng = _rng(cfg, h, i, 2)
    return " ".join(rng.choice(_VOCAB) for _ in range(cfg.body_words))


def page_html(cfg: SynthConfig, h: int, i: int, override_text: str | None = None) -> bytes:
    body = page_body_words(cfg, h, i, override_text)
    links = page_links(cfg, h, i)
    anchors = "".join(f'<a href="{u}">l{k}</a> ' for k, u in enumerate(links))
    html = (
        f"<html><head><title>h{h} p{i}</title></head><body>\n"
        f"<h1>Page {i} of host {h}</h1>\n"
        f"<p>{body}</p>\n"
        f"{anchors}\n"
        f'<img src="/static/img{i % 7}.png">\n'
        f"</body></html>"
    )
    return html.encode("utf-8")


_LANGS = ["en", "es", "de", "zh", "fr"]


def page_row(cfg: SynthConfig, global_idx: int, h: int, i: int,
             override_text: str | None = None, lang: str | None = None) -> dict:
    html = page_html(cfg, h, i, override_text)
    return {
        "url": page_url(h, i),
        "warc_ts": _EPOCH + timedelta(seconds=global_idx),
        "html": html,
        "text": extract_text(html),  # ground truth per input_hint
        "lang": lang if lang is not None else _LANGS[global_idx % len(_LANGS)],
    }


def coords(cfg: SynthConfig) -> list[tuple[int, int, int]]:
    """[(global_idx, host, page_idx)] for the whole table."""
    out = []
    g = 0
    for h, c in enumerate(cfg.pages_per_host()):
        for i in range(c):
            out.append((g, h, i))
            g += 1
    return out


def build_pages_table(cfg: SynthConfig, texts: list[str] | None = None,
                      langs: list[str] | None = None) -> pa.Table:
    """Whole pages table as one Arrow table (test scale). For bench
    scale use pages_dataset() which generates slices in parallel."""
    rows = [
        page_row(cfg, g, h, i,
                 texts[g] if texts is not None and g < len(texts) else None,
                 langs[g] if langs is not None and g < len(langs) else None)
        for g, h, i in coords(cfg)
    ]
    from engine.schemas import PAGES

    return pa.Table.from_pylist(rows, schema=PAGES)


def pages_dataset(cfg: SynthConfig, parallelism: int = 32):
    """Distributed generation: ray.data.range over global indices →
    map_batches that mints page rows. Pure per-index function, so any
    partitioning yields the same table."""
    import ray.data as rd

    from engine.schemas import PAGES

    sizes = cfg.pages_per_host()
    offs = cfg.offsets()

    def locate(g: int) -> tuple[int, int]:
        # binary search over offsets
        lo, hi = 0, len(offs) - 1
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if offs[mid] <= g:
                lo = mid
            else:
                hi = mid - 1
        return lo, g - offs[lo]

    def gen(batch: pa.Table) -> pa.Table:
        rows = []
        for g in batch["id"].to_pylist():
            h, i = locate(g)
            rows.append(page_row(cfg, g, h, i))
        return pa.Table.from_pylist(rows, schema=PAGES)

    return rd.range(cfg.n_pages, override_num_blocks=parallelism).map_batches(
        gen, batch_format="pyarrow"
    )


def pages_table_from_documents(sf_dir: str, cfg: SynthConfig | None = None) -> pa.Table:
    """entry()-scale pages derived from the driver's documents table:
    urls minted from doc coordinates, body text = documents.text,
    lang = documents.lang (FIXTURES.md §2; no external data)."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    n = docs.num_rows
    if cfg is None:
        cfg = SynthConfig(n_hosts=8, n_pages=n)
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    return build_pages_table(cfg, texts=texts, langs=langs)


# ---------------------------------------------------------------------------
# Pure-python oracle: canonical link graph
# ---------------------------------------------------------------------------

def oracle_graph(cfg: SynthConfig) -> dict[str, list[str]]:
    """canonical url -> canonical out-link urls (a[href] only, document
    order, fragments/ports/dot-segments resolved exactly as A6 does)."""
    g: dict[str, list[str]] = {}
    for _, h, i in coords(cfg):
        base = page_url(h, i)
        outs = []
        for raw in page_links(cfg, h, i):
            # mirror extract_links: resolve against base then canonicalize
            from urllib.parse import urljoin

            outs.append(canonicalize_url(urljoin(base, raw)))
        g[base] = outs
    return g


def oracle_reachable(cfg: SynthConfig, seeds: list[str]) -> set[str]:
    """BFS reachable-set over the canonical graph from canonicalized
    seeds (ignores budget/robots — pure graph reachability; pages that
    don't exist are still 'discovered' but have no out-links)."""
    g = oracle_graph(cfg)
    seen: set[str] = set()
    frontier = [canonicalize_url(s) for s in seeds]
    seen.update(frontier)
    while frontier:
        nxt: list[str] = []
        for u in frontier:
            for v in g.get(u, []):
                if v not in seen and v.startswith(("http://", "https://")):
                    seen.add(v)
                    nxt.append(v)
        frontier = nxt
    return seen
