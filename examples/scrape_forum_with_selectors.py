"""Example: a selector-driven site scraper (the Shaman.Scraping-style
workflow re-expressed on this engine).

A user of the reference writes a site scraper by composing CSS
selectors and policy delegates; here the same program is a
CrawlPolicy over a hermetic pages table. Swap the synthetic table for
`ray.data.read_parquet(<your pages dump>)` — or wire
engine.fetcher.FetcherActor with a real transport — and the policy is
unchanged.

Run: python examples/scrape_forum_with_selectors.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import ray

from engine.crawl import run_crawl
from engine.css import selector_collect_links
from engine.oracle import CrawlConfig
from engine.policy import CrawlPolicy
from engine.seen import SeenPool


HOST = "https://forum.example"


def build_pages():
    """A tiny hermetic forum: list pages link threads as
    a.thread-title; pagination hides in data-next attributes that only
    the selector hook can see."""
    from datetime import datetime

    import pyarrow as pa

    from engine.kernels import extract_text
    from engine.schemas import PAGES

    rows = []
    for li in range(3):
        threads = "".join(
            f'<a class="thread-title" href="/t/{li * 2 + t}">thread</a>'
            for t in range(2)
        )
        pager = (
            f'<a class="pager" data-next="/list/{li + 1}">older</a>'
            if li + 1 < 3 else ""
        )
        html = f'<html><body><div class="forum">{threads}{pager}</div></body></html>'.encode()
        rows.append((f"{HOST}/list/{li}", html))
    for t in range(6):
        rows.append(
            (f"{HOST}/t/{t}",
             f"<html><body><p>content of thread {t}</p></body></html>".encode())
        )
    return pa.Table.from_pylist(
        [{"url": u, "warc_ts": datetime(2024, 1, 1), "html": h,
          "text": extract_text(h), "lang": "en"} for u, h in rows],
        schema=PAGES,
    )


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    policy = CrawlPolicy(
        # pagination only reachable through the CSS selector hook
        collect_links_html=selector_collect_links("a.pager", attr="data-next"),
        # crawl lists before threads under budget pressure
        priority=lambda url, depth: 0 if "/list/" in url else 1,
    )
    crawl = CrawlConfig(seeds=(f"{HOST}/list/0",), budget_per_host=4,
                        max_rounds=10, policy=policy)
    out = tempfile.mkdtemp(prefix="forum_scrape_")
    res = run_crawl(build_pages(), crawl, out, pool=SeenPool(crawl.num_shards))
    print(f"crawled {res.total_fetched} pages in {res.rounds} rounds -> {out}/fetched")
    for row in res.trace():
        print(f"  round {row['round']}: {row['url']} ({row['status']})")
    ray.shutdown()


if __name__ == "__main__":
    main()
