"""Example: a selector-driven site scraper (the Shaman.Scraping-style
workflow re-expressed on this engine), end to end: crawl a forum with
CSS-selector pagination, then extract a STRUCTURED RECORDS TABLE
(thread title, post author, post text — three selectors) from the
fetched pages and write it as parquet.

A user of the reference writes a site scraper by composing CSS
selectors and policy delegates; here the same program is a
CrawlPolicy over a hermetic pages table. Swap the synthetic table for
`ray.data.read_parquet(<your pages dump>)` — or wire
engine.fetcher.FetcherActor with a real transport — and the policy and
extraction stages are unchanged.

Run: python examples/scrape_forum_with_selectors.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import pyarrow as pa

from engine.crawl import run_crawl
from engine.css import compile_selector, select_text, selector_collect_links
from engine.oracle import CrawlConfig
from engine.policy import CrawlPolicy
from engine.seen import SeenPool

HOST = "https://forum.example"
N_LISTS = 3
THREADS_PER_LIST = 2
POSTS_PER_THREAD = 2

# pagination via the r5 sibling-combinator grammar: every page entry
# after the first in the <ul class=pagination> strip (the current page
# needs no link; li.page + li.page skips exactly it)
PAGINATION_SELECTOR = "ul.pagination li.page + li.page > a"
TITLE_SELECTOR = "h1.title"
AUTHOR_SELECTOR = "div.post > span.author"
BODY_SELECTOR = "div.post > p.body"


def build_pages():
    """A tiny hermetic forum: list pages link threads as
    a.thread-title and paginate through a <ul class=pagination> strip;
    thread pages carry structured title/author/post markup."""
    from datetime import datetime

    from engine.kernels import extract_text
    from engine.schemas import PAGES

    rows = []
    for li in range(N_LISTS):
        threads = "".join(
            f'<a class="thread-title" href="/t/{li * THREADS_PER_LIST + t}">thread</a>'
            for t in range(THREADS_PER_LIST)
        )
        pager_items = "".join(
            f'<li class="page{" current" if p == li else ""}">'
            + (f'<a href="/list/{p}">{p}</a>' if p != li else f"{p}")
            + "</li>"
            for p in range(N_LISTS)
        )
        html = (
            f'<html><body><div class="forum">{threads}'
            f'<ul class="pagination">{pager_items}</ul>'
            f"</div></body></html>"
        ).encode()
        rows.append((f"{HOST}/list/{li}", html))
    for t in range(N_LISTS * THREADS_PER_LIST):
        posts = "".join(
            f'<div class="post"><span class="author">user{t}-{p}</span>'
            f'<p class="body">post {p} of thread {t}</p></div>'
            for p in range(POSTS_PER_THREAD)
        )
        html = (
            f'<html><body><h1 class="title">Thread {t}</h1>{posts}</body></html>'
        ).encode()
        rows.append((f"{HOST}/t/{t}", html))
    return pa.Table.from_pylist(
        [{"url": u, "warc_ts": datetime(2024, 1, 1), "html": h,
          "text": extract_text(h), "lang": "en"} for u, h in rows],
        schema=PAGES,
    )


def crawl_forum(out_dir: str):
    """Crawl the forum: thread links come from the normal extractor,
    pagination ONLY through the sibling-combinator selector hook."""
    policy = CrawlPolicy(
        collect_links_html=selector_collect_links(PAGINATION_SELECTOR),
        # crawl lists before threads under budget pressure
        priority=lambda url, depth: 0 if "/list/" in url else 1,
    )
    crawl = CrawlConfig(seeds=(f"{HOST}/list/0",), budget_per_host=4,
                        max_rounds=10, policy=policy)
    return run_crawl(build_pages(), crawl, out_dir,
                     pool=SeenPool(crawl.num_shards))


def extract_records(fetched_dir: str):
    """fetched pages → one row per post: (url, title, author, post) —
    the three-selector structured extraction, as a streaming
    map_batches over the crawl's parquet output. Selectors compile
    once here and ride the closure."""
    import ray.data as rd

    title_sel = compile_selector(TITLE_SELECTOR)
    author_sel = compile_selector(AUTHOR_SELECTOR)
    body_sel = compile_selector(BODY_SELECTOR)

    def records(t: pa.Table) -> pa.Table:
        urls, titles, authors, bodies = [], [], [], []
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            page_titles = select_text(html, title_sel)
            if not page_titles:  # not a thread page
                continue
            for a, b in zip(select_text(html, author_sel),
                            select_text(html, body_sel)):
                urls.append(url)
                titles.append(page_titles[0])
                authors.append(a)
                bodies.append(b)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "title": pa.array(titles, pa.string()),
                "author": pa.array(authors, pa.string()),
                "post": pa.array(bodies, pa.string()),
            }
        )

    return (
        rd.read_parquet(fetched_dir, columns=["url", "html"])
        .map_batches(records, batch_format="pyarrow")
    )


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    out = tempfile.mkdtemp(prefix="forum_scrape_")
    res = run_crawl_out = crawl_forum(out)
    print(f"crawled {res.total_fetched} pages in {res.rounds} rounds")
    for row in res.trace():
        print(f"  round {row['round']}: {row['url']} ({row['status']})")

    records = extract_records(f"{out}/fetched")
    rec_dir = os.path.join(out, "records")
    records.write_parquet(rec_dir)
    import pyarrow.dataset as pads

    tbl = pads.dataset(rec_dir).to_table().sort_by("url")
    print(f"{tbl.num_rows} structured post records -> {rec_dir}")
    for r in tbl.to_pylist()[:4]:
        print(" ", r)
    ray.shutdown()


if __name__ == "__main__":
    main()
