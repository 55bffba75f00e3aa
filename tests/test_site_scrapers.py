"""Site-specific traversal (SURVEY.md A31) + the full policy-hook
surface (A30): a hermetic forum-shaped site driven by a scraper policy
using rewrite (session-id stripping), should_scrape (offsite veto),
priority (list pages before threads before pagination) and
collect_links (pagination urls synthesized from page text — the
CollectAdditionalLinks delegate). Engine trace must equal the
pure-python simulator trace with every hook active."""

from __future__ import annotations

import re
import shutil
from datetime import datetime

import pyarrow as pa
import pytest

from engine.crawl import run_crawl
from engine.kernels import extract_text
from engine.oracle import CrawlConfig, simulate
from engine.policy import CrawlPolicy
from engine.schemas import PAGES
from engine.seen import SeenPool

HOST = "https://forum.example"
N_LISTS = 4
THREADS_PER_LIST = 3
THREAD_PAGES = 3  # each thread has ?page=2..THREAD_PAGES


def _html(title: str, body: str, links: list[str]) -> bytes:
    anchors = "".join(f'<a href="{u}">x</a> ' for u in links)
    return (
        f"<html><head><title>{title}</title></head><body>"
        f"<p>{body}</p>\n{anchors}</body></html>"
    ).encode()


def _forum_pages() -> list[tuple[str, bytes]]:
    pages = []
    for li in range(N_LISTS):
        links = [f"/thread/{li * THREADS_PER_LIST + t}?sid=abc{t}"
                 for t in range(THREADS_PER_LIST)]
        if li + 1 < N_LISTS:
            links.append(f"/list/{li + 1}?sid=next")
        links.append("https://offsite.example/ad")  # vetoed by should_scrape
        pages.append((f"{HOST}/list/{li}", _html(f"list {li}", f"board page {li}", links)))
    for t in range(N_LISTS * THREADS_PER_LIST):
        pages.append(
            (f"{HOST}/thread/{t}",
             _html(f"thread {t}", f"topic {t} pages={THREAD_PAGES}", []))
        )
        for p in range(2, THREAD_PAGES + 1):
            pages.append(
                (f"{HOST}/thread/{t}?page={p}",
                 _html(f"thread {t} p{p}", f"replies {t}.{p}", []))
            )
    return pages


def _pages_tbl(pages: list[tuple[str, bytes]]) -> pa.Table:
    rows = [
        {"url": u, "warc_ts": datetime(2024, 1, 1, 0, 0, i), "html": h,
         "text": extract_text(h), "lang": "en"}
        for i, (u, h) in enumerate(pages)
    ]
    return pa.Table.from_pylist(rows, schema=PAGES)


def _make_policy(with_priority: bool = True) -> CrawlPolicy:
    """Hooks as CLOSURES (not module-level test functions): Ray workers
    cannot import the test module, and cloudpickle ships closures by
    value — the same constraint real callers of CrawlPolicy have."""

    def rewrite(u: str) -> str:
        return re.sub(
            r"([?&])sid=[^&]*&?",
            lambda m: m.group(1) if "&" in m.group(0) else "", u,
        ).rstrip("?&")

    def should_scrape(u: str, is_prereq: bool):
        if "offsite.example" in u:
            return False
        return None

    def priority(u: str, depth: int) -> int:
        if "/list/" in u:
            return 0
        if "?page=" in u:
            return 2
        if "/thread/" in u:
            return 1
        return 0

    def collect_links(url: str, text: str) -> list[str]:
        if "/thread/" in url and "?page=" not in url:
            m = re.search(r"pages=(\d+)", text)
            if m:
                return [f"{url}?page={p}" for p in range(2, int(m.group(1)) + 1)]
        return []

    return CrawlPolicy(
        rewrite=rewrite,
        should_scrape=should_scrape,
        priority=priority if with_priority else None,
        collect_links=collect_links,
    )


FORUM_POLICY = _make_policy()


def _trace_key(rows):
    return [(r["round"], r["host"], r["url"], r["discovery_seq"], r["status"]) for r in rows]


def _run(tmp, pages_tbl, crawl, **kw):
    out = str(tmp / "crawl")
    shutil.rmtree(out, ignore_errors=True)
    pool = SeenPool(crawl.num_shards)
    res = run_crawl(pages_tbl, crawl, out, pool=pool, **kw)
    return res, pool


@pytest.fixture(scope="module")
def forum():
    pages = _forum_pages()
    return _pages_tbl(pages), dict(pages)


def test_forum_traversal_matches_oracle(ray_session, forum, tmp_path):
    tbl, pages = forum
    crawl = CrawlConfig(seeds=(f"{HOST}/list/0",), budget_per_host=3,
                        max_rounds=30, policy=FORUM_POLICY)
    sim = simulate(pages, crawl)
    res, _ = _run(tmp_path, tbl, crawl)
    assert _trace_key(res.trace()) == _trace_key(sim.trace)
    urls = {r["url"] for r in res.trace()}
    # collect_links discovered pagination never present as <a href>
    assert f"{HOST}/thread/0?page=2" in urls
    # rewrite stripped session ids; should_scrape vetoed offsite
    assert not any("sid=" in u for u in urls)
    assert not any("offsite" in u for u in urls)
    # the whole forum was eventually crawled
    assert urls == set(pages)


def test_forum_priority_reorders_schedule(ray_session, forum, tmp_path):
    """Priority provably changes WHAT gets fetched early under budget
    pressure, and the engine agrees with the simulator in both
    configurations."""
    tbl, pages = forum
    flat = _make_policy(with_priority=False)
    with_prio = CrawlConfig(seeds=(f"{HOST}/list/0",), budget_per_host=2,
                            max_rounds=40, policy=FORUM_POLICY)
    without = CrawlConfig(seeds=(f"{HOST}/list/0",), budget_per_host=2,
                          max_rounds=40, policy=flat)
    for crawl in (with_prio, without):
        sim = simulate(pages, crawl)
        res, _ = _run(tmp_path / ("p" if crawl is with_prio else "f"), tbl, crawl)
        assert _trace_key(res.trace()) == _trace_key(sim.trace)
    t_p = simulate(pages, with_prio).trace
    t_f = simulate(pages, without).trace
    assert _trace_key(t_p) != _trace_key(t_f)
    # under priority, round-1 schedule prefers the list page over
    # threads (both compete for budget_per_host=2 slots)
    r1_p = [r["url"] for r in t_p if r["round"] == 1]
    assert f"{HOST}/list/1" in r1_p
