"""End-to-end hermetic crawl tests (SURVEY.md §5.3-5.5).

The distributed engine's per-round fetch trace and final URL-seen set
must equal the pure-python oracle simulator's, at any parallelism, and
resume-from-checkpoint must be invisible in the final state.
"""

from __future__ import annotations

import shutil

import pytest

from engine.crawl import run_crawl
from engine.kernels import canonicalize_url, sha1_key
from engine.oracle import CrawlConfig, simulate
from engine.policy import CrawlPolicy
from engine.seen import SeenPool
from engine.synth import SynthConfig, build_pages_table, oracle_reachable, page_url

SYNTH = SynthConfig(n_hosts=6, n_pages=150, links_per_page=5)
SEEDS = (page_url(0, 0), page_url(1, 0), page_url(2, 0))
ROBOTS = (
    ("host-3.example", "User-agent: *\nDisallow: /\n"),            # fully blocked
    ("host-1.example", "User-agent: *\nDisallow: /p/1\nAllow: /p/10\nCrawl-delay: 2\n"),
)


def _pages_dict(cfg: SynthConfig) -> dict[str, bytes]:
    t = build_pages_table(cfg)
    return dict(zip(t["url"].to_pylist(), (bytes(b) for b in t["html"].to_pylist())))


def _trace_key(rows):
    return [(r["round"], r["host"], r["url"], r["discovery_seq"], r["status"]) for r in rows]


@pytest.fixture(scope="module")
def pages_tbl():
    return build_pages_table(SYNTH)


def _run(tmp, pages, crawl, **kw):
    out = str(tmp / "crawl")
    shutil.rmtree(out, ignore_errors=True)
    pool = SeenPool(crawl.num_shards, mode=crawl.seen_mode)
    res = run_crawl(pages, crawl, out, pool=pool, **kw)
    return res, pool


def test_crawl_matches_oracle_no_robots(ray_session, pages_tbl, tmp_path):
    crawl = CrawlConfig(seeds=SEEDS, budget_per_host=4, max_rounds=40)
    sim = simulate(_pages_dict(SYNTH), crawl)
    res, pool = _run(tmp_path, pages_tbl, crawl)
    assert _trace_key(res.trace()) == _trace_key(sim.trace)
    assert pool.all_keys() == {sha1_key(u) for u in sim.seen_urls}
    # with no robots and crawl-to-completion, seen set == BFS reachable
    assert sim.seen_urls == oracle_reachable(SYNTH, list(SEEDS))
    assert res.total_fetched > 0 and res.rounds == sim.rounds


def test_crawl_matches_oracle_with_robots_and_budget(ray_session, pages_tbl, tmp_path):
    crawl = CrawlConfig(
        seeds=SEEDS, budget_per_host=2, max_rounds=60,
        robots_raw=ROBOTS, round_time_budget_ms=6000,  # host-1: delay 2s -> Bh=2... min(2,3)=2
    )
    sim = simulate(_pages_dict(SYNTH), crawl)
    res, pool = _run(tmp_path, pages_tbl, crawl)
    assert _trace_key(res.trace()) == _trace_key(sim.trace)
    assert pool.all_keys() == {sha1_key(u) for u in sim.seen_urls}
    # robots actually blocked something
    assert any(m["robots_blocked"] > 0 for m in res.metrics)
    # politeness: no host over its budget in any round
    per = {}
    for r in sim.trace:
        per[(r["round"], r["host"])] = per.get((r["round"], r["host"]), 0) + 1
    assert all(v <= 2 for v in per.values())


def test_crawl_deterministic_across_partitioning(ray_session, pages_tbl, tmp_path):
    """§5.4: different seen-shard counts, partition counts AND
    scheduler paths (driver-side vs distributed thresholds) -> same
    trace."""
    base = CrawlConfig(seeds=SEEDS, budget_per_host=3, max_rounds=40, num_shards=1)
    alt = CrawlConfig(seeds=SEEDS, budget_per_host=3, max_rounds=40,
                      num_shards=7, num_partitions=3)
    r1, p1 = _run(tmp_path / "a", pages_tbl, base)
    # schedule_cutoff_rows=0 forces the fully distributed path: the
    # threshold scheduler AND the left-outer join fetch with
    # task-written fetched/trace/counts parts (nothing O(scheduled)
    # on the driver)
    r2, p2 = _run(tmp_path / "b", pages_tbl, alt, schedule_cutoff_rows=0)
    assert _trace_key(r1.trace()) == _trace_key(r2.trace())
    assert p1.all_keys() == p2.all_keys()
    # per-round counts (from the distributed counts parts) also agree
    k = ("round", "scheduled", "fetched", "errors", "robots_blocked")
    m1 = [{x: m[x] for x in k} for m in r1.metrics]
    m2 = [{x: m[x] for x in k} for m in r2.metrics]
    assert m1 == m2


def test_crawl_join_fetch_mode(ray_session, pages_tbl, tmp_path):
    crawl = CrawlConfig(seeds=SEEDS, budget_per_host=3, max_rounds=6)
    sim = simulate(_pages_dict(SYNTH), crawl)
    res, _ = _run(tmp_path, pages_tbl, crawl, fetch_mode="join")
    sim_trace = [t for t in sim.trace if t["round"] < res.rounds]
    assert _trace_key(res.trace()) == _trace_key(sim_trace)


def test_crawl_resume(ray_session, pages_tbl, tmp_path):
    """§5.5: run 2 rounds, 'crash', resume with a FRESH pool -> final
    state identical to an uninterrupted run."""
    full_crawl = CrawlConfig(seeds=SEEDS, budget_per_host=4, max_rounds=40)
    res_full, pool_full = _run(tmp_path / "full", pages_tbl, full_crawl)

    out = str(tmp_path / "part" / "crawl")
    pool1 = SeenPool(full_crawl.num_shards)
    partial = CrawlConfig(seeds=SEEDS, budget_per_host=4, max_rounds=2)
    run_crawl(pages_tbl, partial, out, pool=pool1)
    # "crash": discard pool1; resume from checkpoint with a new pool
    pool2 = SeenPool(full_crawl.num_shards)
    res2 = run_crawl(pages_tbl, full_crawl, out, pool=pool2, resume=True)
    assert _trace_key(res2.trace()) == _trace_key(res_full.trace())
    assert pool2.all_keys() == pool_full.all_keys()


def test_crawl_policy_hooks(ray_session, pages_tbl, tmp_path):
    """A30: rewrite + should_scrape hooks flow through engine AND oracle."""

    def rewrite(u: str) -> str:
        return u.replace("#utm", "")

    def should_scrape(u: str, is_prereq: bool):
        if "host-5" in u:
            return False  # veto one host entirely
        return None       # else defer to built-ins

    pol = CrawlPolicy(rewrite=rewrite, should_scrape=should_scrape, max_depth=3)
    crawl = CrawlConfig(seeds=SEEDS, budget_per_host=4, max_rounds=40, policy=pol)
    sim = simulate(_pages_dict(SYNTH), crawl)
    res, pool = _run(tmp_path, pages_tbl, crawl)
    assert _trace_key(res.trace()) == _trace_key(sim.trace)
    assert not any("host-5" in u for u in sim.seen_urls if u not in
                   {canonicalize_url(s) for s in SEEDS})
    assert pool.all_keys() == {sha1_key(u) for u in sim.seen_urls}


def test_trace_matches_golden_fixture(ray_session, pages_tbl, tmp_path):
    """FIXTURES.md §4: the frozen trace fixture is the compat contract
    — simulator AND engine must reproduce it byte-for-byte (fixture
    config == the robots+budget scenario)."""
    import json
    import pathlib

    fix = pathlib.Path(__file__).parent / "fixtures" / "trace_sf0001.jsonl"
    golden = [json.loads(line) for line in fix.read_text().splitlines()]
    crawl = CrawlConfig(seeds=SEEDS, budget_per_host=2, max_rounds=60,
                        robots_raw=ROBOTS, round_time_budget_ms=6000)
    sim = simulate(_pages_dict(SYNTH), crawl)
    assert _trace_key(sim.trace) == _trace_key(golden)
    res, _ = _run(tmp_path, pages_tbl, crawl)
    assert _trace_key(res.trace()) == _trace_key(golden)


def test_crawl_cuckoo_seen_mode(ray_session, pages_tbl, tmp_path):
    """north_star: the cuckoo-filter seen backend end-to-end. The
    false-positive set is only STATISTICALLY stable (insert order
    across concurrent RPCs is scheduler-dependent — engine.seen module
    docstring); at this capacity/load the fp probability over the whole
    run is ≈ n·8/2^16 ≈ 2% — if this assert ever trips, that's the
    documented bound, not a regression. Capacity is sized so inserts
    never fail (checked explicitly)."""
    crawl = CrawlConfig(seeds=SEEDS, budget_per_host=4, max_rounds=40,
                        seen_mode="cuckoo")
    sim = simulate(_pages_dict(SYNTH), crawl)
    res, pool = _run(tmp_path, pages_tbl, crawl)
    assert _trace_key(res.trace()) == _trace_key(sim.trace)
    sizes = pool.sizes()
    assert sum(sizes) == len(sim.seen_urls)
    assert pool.insert_failures() == 0


def test_crawl_same_host_only(ray_session, pages_tbl, tmp_path):
    """same_host_only scoping: only seed-host urls are ever scheduled,
    and the engine (lazy seed_hosts path) matches the simulator."""
    pol = CrawlPolicy(same_host_only=True)
    crawl = CrawlConfig(seeds=(SEEDS[0],), budget_per_host=4, max_rounds=40,
                        policy=pol)
    sim = simulate(_pages_dict(SYNTH), crawl)
    res, _ = _run(tmp_path, pages_tbl, crawl)
    assert _trace_key(res.trace()) == _trace_key(sim.trace)
    hosts = {r["host"] for r in res.trace()}
    assert hosts == {"host-0.example"}
    assert res.total_fetched > 0
