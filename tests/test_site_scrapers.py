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


# ---------------------------------------------------------------------------
# Redirect semantics (A13 3xx): engine == simulator, target fetched once
# ---------------------------------------------------------------------------

def _redirect_site():
    """Seed links to /old (301 -> /new) AND directly to /new: the
    target is discovered twice in one round and must be fetched exactly
    once. /lone (301 -> /island) is the only path to /island."""
    root = _html("root", "start", ["/old", "/new", "/lone"])
    new = _html("new", "destination", [])
    island = _html("island", "only via redirect", [])
    rows = [
        {"url": f"{HOST}/", "html": root, "status": 200, "location": None},
        {"url": f"{HOST}/old", "html": b"", "status": 301,
         "location": f"{HOST}/new"},
        {"url": f"{HOST}/lone", "html": b"", "status": 301,
         "location": f"{HOST}/island"},
        {"url": f"{HOST}/new", "html": new, "status": 200, "location": None},
        {"url": f"{HOST}/island", "html": island, "status": 200, "location": None},
    ]
    schema = pa.schema(list(PAGES) + [("status", pa.int32()),
                                      ("location", pa.string())])
    tbl = pa.Table.from_pylist(
        [{"url": r["url"], "warc_ts": datetime(2024, 1, 1), "html": r["html"],
          "text": extract_text(r["html"]), "lang": "en",
          "status": r["status"], "location": r["location"]} for r in rows],
        schema=schema,
    )
    pages = {r["url"]: r["html"] for r in rows}
    redirects = {r["url"]: r["location"] for r in rows if r["location"]}
    return tbl, pages, redirects


@pytest.mark.parametrize("mode", ["broadcast", "join"])
def test_redirects_match_oracle(ray_session, tmp_path, mode):
    tbl, pages, redirects = _redirect_site()
    crawl = CrawlConfig(seeds=(f"{HOST}/",), budget_per_host=8, max_rounds=10)
    sim = simulate(pages, crawl, redirects=redirects)
    res, _ = _run(tmp_path / mode, tbl, crawl, fetch_mode=mode)
    assert _trace_key(res.trace()) == _trace_key(sim.trace)
    trace = res.trace()
    by_url = {}
    for r in trace:
        by_url.setdefault(r["url"], []).append(r["status"])
    # redirected urls traced with their 3xx status
    assert by_url[f"{HOST}/old"] == [301]
    assert by_url[f"{HOST}/lone"] == [301]
    # target reachable twice (link + redirect) fetched exactly once
    assert by_url[f"{HOST}/new"] == [200]
    # target reachable ONLY via redirect is crawled
    assert by_url[f"{HOST}/island"] == [200]


# ---------------------------------------------------------------------------
# Robots discovered from the crawl itself (A18 discover_robots)
# ---------------------------------------------------------------------------

ROB_A = "https://site-a.example"
ROB_B = "https://site-b.example"


def _robots_site():
    a_root = _html("a", "seed", ["/next", f"{ROB_B}/open", f"{ROB_B}/secret"])
    a_next = _html("a2", "more", [])
    b_open = _html("open", "public", [f"{ROB_B}/secret2"])
    rows = [
        (f"{ROB_A}/", a_root),
        (f"{ROB_A}/next", a_next),
        (f"{ROB_B}/open", b_open),
        (f"{ROB_B}/secret", _html("s", "hidden", [])),
        (f"{ROB_B}/secret2", _html("s2", "hidden2", [])),
        (f"{ROB_B}/robots.txt", b"User-agent: *\nDisallow: /secret\n"),
    ]
    return _pages_tbl(rows), dict(rows)


@pytest.mark.parametrize("cutoff", [2_000_000, 0])
def test_robots_discovered_from_crawl(ray_session, tmp_path, cutoff):
    """host-b first appears in the round-1 frontier; its robots.txt is
    fetched from the pages table at round-1 start (out-of-band,
    unbudgeted) and gates that same round — in the hybrid AND the
    fully distributed scheduler path, matching the simulator."""
    tbl, pages = _robots_site()
    crawl = CrawlConfig(seeds=(f"{ROB_A}/",), budget_per_host=4, max_rounds=8,
                        discover_robots=True)
    sim = simulate(pages, crawl)
    res, _ = _run(tmp_path / str(cutoff), tbl, crawl, schedule_cutoff_rows=cutoff)
    assert _trace_key(res.trace()) == _trace_key(sim.trace)
    urls = {r["url"] for r in res.trace()}
    assert f"{ROB_B}/open" in urls
    assert f"{ROB_B}/secret" not in urls and f"{ROB_B}/secret2" not in urls
    assert f"{ROB_B}/robots.txt" not in urls  # out-of-band, never scheduled
    assert any(m["robots_blocked"] > 0 for m in res.metrics)
    # §4.3 layout: per-round robots subset checkpointed as parquet,
    # and the round that gated host-b recorded its discovered rules
    import pathlib

    import pyarrow.parquet as pq

    rob_parts = sorted(
        pathlib.Path(res.out_dir).glob("robots/round=*/robots.parquet")
    )
    assert rob_parts
    hosts_seen = set()
    for p in rob_parts:
        hosts_seen |= set(pq.read_table(p, columns=["host"])["host"].to_pylist())
    assert "site-b.example" in hosts_seen


# ---------------------------------------------------------------------------
# CSS-selector-driven link collection (A31 Fizzler analog, engine/css.py)
# ---------------------------------------------------------------------------

def _selector_site():
    """Pager urls live in data-next attributes (href-less anchors the
    html link extractor can NOT see) — only the CSS-selector hook can
    discover them, proving the selector path does real work."""
    rows = []
    for li in range(3):
        threads = "".join(
            f'<a class="thread-title" href="/t/{li * 2 + t}">t</a>'
            for t in range(2)
        )
        pager = (
            f'<a class="pager" data-next="/list/{li + 1}">next</a>'
            if li + 1 < 3 else ""
        )
        html = (
            f'<html><body><div class="forum">{threads}{pager}'
            f"</div></body></html>"
        ).encode()
        rows.append((f"{HOST}/list/{li}", html))
    for t in range(6):
        rows.append((f"{HOST}/t/{t}", _html(f"t{t}", f"topic {t}", [])))
    return _pages_tbl(rows), dict(rows)


def test_selector_link_collection_matches_oracle(ray_session, tmp_path):
    from engine.css import selector_collect_links

    tbl, pages = _selector_site()
    policy = CrawlPolicy(
        collect_links_html=selector_collect_links("a.pager", attr="data-next")
    )
    crawl = CrawlConfig(seeds=(f"{HOST}/list/0",), budget_per_host=4,
                        max_rounds=10, policy=policy)
    sim = simulate(pages, crawl)
    res, _ = _run(tmp_path, tbl, crawl)
    assert _trace_key(res.trace()) == _trace_key(sim.trace)
    urls = {r["url"] for r in res.trace()}
    # pagination reachable ONLY via the selector hook was crawled
    assert urls == set(pages)


# ---------------------------------------------------------------------------
# PerformInitialization (SURVEY.md §3.1): login before round 0
# ---------------------------------------------------------------------------

GATE = "https://gated.example"


def _gated_site():
    """The dashboard url embeds a token that only /login reveals; no
    page links to /login or the dashboard — without the initialize
    hook the crawl has no reachable seed at all."""
    login = b'<html><body>token=SECRET123; use /dash?token=</body></html>'
    dash = _html("dash", "members", ["/t/0", "/t/1"])
    rows = [
        (f"{GATE}/login", login),
        (f"{GATE}/dash?token=SECRET123", dash),
        (f"{GATE}/t/0", _html("t0", "m0", [])),
        (f"{GATE}/t/1", _html("t1", "m1", [])),
    ]
    return _pages_tbl(rows), dict(rows)


def _login_policy() -> CrawlPolicy:
    def initialize(ctx):
        status, body = ctx.fetch(f"{GATE}/login")
        assert status == 200
        m = re.search(rb"token=(\w+)", body)
        tok = m.group(1).decode()
        ctx.cookies.set_from_header("gated.example", f"session={tok}")
        return [f"{GATE}/dash?token={tok}"]

    return CrawlPolicy(initialize=initialize)


def test_initialize_hook_matches_oracle(ray_session, tmp_path):
    tbl, pages = _gated_site()
    crawl = CrawlConfig(seeds=(), budget_per_host=4, max_rounds=6,
                        policy=_login_policy())
    sim = simulate(pages, crawl)
    res, _ = _run(tmp_path, tbl, crawl)
    assert _trace_key(res.trace()) == _trace_key(sim.trace)
    urls = {r["url"] for r in res.trace()}
    # gated content reachable ONLY through the hook's seed expansion
    assert f"{GATE}/dash?token=SECRET123" in urls
    assert f"{GATE}/t/0" in urls and f"{GATE}/t/1" in urls
    assert f"{GATE}/login" not in urls  # fetched out-of-band, not crawled
    # login session state surfaced for FetcherActor pre-seeding
    assert res.init_cookies.cookies == {
        "gated.example": {"session": "SECRET123"}
    }
    # without the hook there is nothing to crawl
    bare = simulate(pages, CrawlConfig(seeds=(), max_rounds=6))
    assert bare.trace == []


def test_initialize_hook_resume_consistent(ray_session, tmp_path):
    """initialize re-runs on resume, but the config hash is pinned to
    the PRISTINE (pre-extension) config — a partial crawl + resume
    must equal one full run (and not raise a config-mismatch)."""
    tbl, pages = _gated_site()
    out = str(tmp_path / "crawl")
    full_c = CrawlConfig(seeds=(), budget_per_host=1, max_rounds=6,
                         policy=_login_policy())
    res_full, _ = _run(tmp_path / "full", tbl, full_c)
    part_c = CrawlConfig(seeds=(), budget_per_host=1, max_rounds=2,
                         policy=_login_policy())
    run_crawl(tbl, part_c, out, pool=SeenPool(part_c.num_shards))
    res2 = run_crawl(tbl, full_c, out, pool=SeenPool(full_c.num_shards),
                     resume=True)
    assert _trace_key(res2.trace()) == _trace_key(res_full.trace())


def test_initialize_preseeded_hash_consistent(ray_session, tmp_path):
    """Regression (r5, ADVICE 2): a pre-seeded first run (initialize
    extras dropped with a warning) must write the SAME config hash a
    later non-pre-seeded resume computes — no spurious 'resume config
    mismatch'."""
    import warnings

    import ray.data as rd

    from engine.crawl import prepare_seed_frontier

    tbl, pages = _gated_site()
    crawl = CrawlConfig(seeds=(), budget_per_host=1, max_rounds=2,
                        policy=_login_policy())
    pool = SeenPool(crawl.num_shards)
    out = str(tmp_path / "crawl")
    # pre-seed with the url initialize would have contributed
    prepare_seed_frontier(
        rd.from_items([{"url": f"{GATE}/dash?token=SECRET123"}]),
        crawl, pool, out,
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        run_crawl(tbl, crawl, out, pool=pool, seeded_on_disk=True)
    assert any("pre-seeded" in str(w.message) for w in caught)
    # resume via the normal path: initialize extends seeds, but the
    # hash is pinned to the pristine config — must not raise
    full_c = CrawlConfig(seeds=(), budget_per_host=1, max_rounds=6,
                         policy=_login_policy())
    res = run_crawl(tbl, full_c, out, pool=SeenPool(full_c.num_shards),
                    resume=True)
    urls = {r["url"] for r in res.trace()}
    assert f"{GATE}/dash?token=SECRET123" in urls


# ---------------------------------------------------------------------------
# Sitemap seeding via the initialize hook (sitemap index -> sitemaps
# -> page urls; the sitemaps themselves are never crawled)
# ---------------------------------------------------------------------------

SMAP = "https://mapped.example"


def _sitemap_site():
    index = (
        "<?xml version='1.0'?><sitemapindex>"
        f"<sitemap><loc>{SMAP}/maps/a.xml</loc></sitemap>"
        f"<sitemap><loc> {SMAP}/maps/b.xml </loc></sitemap>"
        "</sitemapindex>"
    ).encode()
    smap_a = (
        "<?xml version='1.0'?><urlset>"
        f"<url><loc>{SMAP}/p/0</loc></url>"
        f"<url><loc>{SMAP}/p/1</loc></url></urlset>"
    ).encode()
    smap_b = (
        f"<urlset><url><loc>{SMAP}/p/2</loc></url>"
        f"<url><loc>{SMAP}/p/0</loc></url></urlset>"  # duplicate loc
    ).encode()
    rows = [
        (f"{SMAP}/sitemap.xml", index),
        (f"{SMAP}/maps/a.xml", smap_a),
        (f"{SMAP}/maps/b.xml", smap_b),
    ]
    # p/0 links to an extra page so the e2e exercises the normal
    # link-extraction path (link_allowed etc.) alongside the seeding
    rows.append((f"{SMAP}/p/0", _html("p0", "page 0", ["/p/linked"])))
    for i in range(1, 3):
        rows.append((f"{SMAP}/p/{i}", _html(f"p{i}", f"page {i}", [])))
    rows.append((f"{SMAP}/p/linked", _html("pl", "linked page", [])))
    return _pages_tbl(rows), dict(rows)


def test_sitemap_seeding_matches_oracle(ray_session, tmp_path):
    from engine.policy import sitemap_initialize

    tbl, pages = _sitemap_site()
    crawl = CrawlConfig(
        seeds=(), budget_per_host=8, max_rounds=4,
        policy=CrawlPolicy(
            initialize=sitemap_initialize(f"{SMAP}/sitemap.xml")
        ),
    )
    sim = simulate(pages, crawl)
    res, _ = _run(tmp_path, tbl, crawl)
    assert _trace_key(res.trace()) == _trace_key(sim.trace)
    urls = {r["url"] for r in res.trace()}
    # sitemap-listed pages crawled, plus the page found by normal
    # link extraction from p/0
    assert urls == {f"{SMAP}/p/{i}" for i in range(3)} | {f"{SMAP}/p/linked"}
    # the xml files themselves were fetched out-of-band, never crawled
    assert not any(u.endswith(".xml") for u in urls)


# ---------------------------------------------------------------------------
# JSON-cursor pagination (the FacebookScraper shape, SURVEY.md §3.1):
# a JSON feed whose next url comes from the body's cursor field
# ---------------------------------------------------------------------------

FEED = "https://feed.example"


def _json_feed_site():
    import json as _json

    rows = []
    n_pages = 3
    for c in range(n_pages):
        body = {
            "items": [f"/item/{c * 2}", f"/item/{c * 2 + 1}"],
            "next_cursor": c + 1 if c + 1 < n_pages else None,
        }
        rows.append(
            (f"{FEED}/api/feed?cursor={c}", _json.dumps(body).encode())
        )
    for i in range(n_pages * 2):
        rows.append((f"{FEED}/item/{i}", _html(f"i{i}", f"item {i}", [])))
    return _pages_tbl(rows), dict(rows)


def test_json_cursor_pagination_matches_oracle(ray_session, tmp_path):
    import json as _json

    def collect_json(url: str, html) -> list[str]:
        # the collect hooks' contract is ABSOLUTE raw urls — resolve
        # the feed's relative item paths against the page url
        from urllib.parse import urljoin

        if "/api/feed" not in url:
            return []
        d = _json.loads(bytes(html).decode("utf-8"))
        links = [urljoin(url, it) for it in d["items"]]
        if d.get("next_cursor") is not None:
            links.append(f"{FEED}/api/feed?cursor={d['next_cursor']}")
        return links

    tbl, pages = _json_feed_site()
    crawl = CrawlConfig(
        seeds=(f"{FEED}/api/feed?cursor=0",), budget_per_host=3,
        max_rounds=12, policy=CrawlPolicy(collect_links_html=collect_json),
    )
    sim = simulate(pages, crawl)
    res, _ = _run(tmp_path, tbl, crawl)
    assert _trace_key(res.trace()) == _trace_key(sim.trace)
    urls = {r["url"] for r in res.trace()}
    # every cursor page and every item reached through the JSON bodies
    assert urls == set(pages)


def test_robots_discovery_survives_resume(ray_session, tmp_path):
    """Discovered robots are checkpointed state: a resume after the
    discovery round must keep blocking without re-discovery."""
    tbl, pages = _robots_site()
    full_c = CrawlConfig(seeds=(f"{ROB_A}/",), budget_per_host=4, max_rounds=8,
                         discover_robots=True)
    res_full, _ = _run(tmp_path / "full", tbl, full_c)
    out = str(tmp_path / "part" / "crawl")
    part_c = CrawlConfig(seeds=(f"{ROB_A}/",), budget_per_host=4, max_rounds=2,
                         discover_robots=True)
    run_crawl(tbl, part_c, out, pool=SeenPool(part_c.num_shards))
    res2 = run_crawl(tbl, full_c, out, pool=SeenPool(full_c.num_shards),
                     resume=True)
    assert _trace_key(res2.trace()) == _trace_key(res_full.trace())
