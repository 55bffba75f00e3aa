"""Benchmark runner (driver contract + BASELINE.md protocol).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "urls_per_sec": ...}

Headline = the flagship hermetic crawl (frontier-schedule + fetch +
parse, SURVEY.md §3.2) over a deterministic synthetic pages table
sized from $GRAFT_SF_DIR's documents table; plus per-query seconds for
a representative operator set at $GRAFT_SF_DIR.

--scaling: runs the headline crawl twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and reports both rates +
efficiency = (rate32/rate8)/4 (sandbox evidence for the N vs 4N-node
criterion, SURVEY.md §4.4).

This script OWNS its Ray session (the only places allowed to:
bench.py, CLI entry points, test fixtures).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time


BENCH_QUERIES = (
    "filter_project", "agg_global", "groupby_agg", "join_hash",
    "topk", "sort", "dedup_exact", "json_extract", "date_math",
    "token_count", "quality_score", "lang_id", "dedup_minhash",
    "vector_topk", "window_lag", "pivot_events", "ngram_topk",
    "tfidf_topk", "repetition_filter", "pii_scrub", "histogram",
    "gopher_quality_filter", "paragraph_dedup", "pack_sequences",
    "join_range", "css_extract", "multimodal_frame_sample",
    "unigram_logprob", "knn_join", "dedup_incremental", "feed_extract",
)


def _bench_once(num_cpus: int, sf_dir: str, crawl_only: bool,
                skip_crawl: bool = False) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from engine.crawl import run_crawl
    from engine.oracle import CrawlConfig
    from engine.synth import SynthConfig, page_url, pages_dataset

    if skip_crawl:
        result = {"crawl_sec": None, "urls_per_sec": None,
                  "scheduled": 0, "fetched": 0, "rounds": 0}
        queries: dict[str, float] = {}
        import __ray_entry__ as em

        qs = em.queries()
        # untimed warm-up: the first pipeline of a fresh session pays
        # worker-pool spin-up (~2s) that would otherwise be billed to
        # whichever query happens to run first
        qs["agg_global"](sf_dir).to_pandas()
        for name in BENCH_QUERIES:
            t0 = time.monotonic()
            r = qs[name](sf_dir)
            if hasattr(r, "to_pandas"):
                r.to_pandas()
            queries[name] = round(time.monotonic() - t0, 3)
        result["queries"] = queries
        ray.shutdown()
        return result

    n_pages = int(os.environ.get("BENCH_PAGES", "800000"))
    n_hosts = max(8, n_pages // 1200)
    # BENCH_BODY_WORDS sizes the synthetic pages (default 40 words ≈
    # 1-2 KB html; 12000 ≈ 90 KB — the Common-Crawl-scale page regime
    # for bandwidth/soak runs)
    cfg = SynthConfig(
        n_hosts=n_hosts, n_pages=n_pages, links_per_page=8,
        body_words=int(os.environ.get("BENCH_BODY_WORDS", "40")),
    )
    # generate + pin the synthetic web once (setup, untimed). The
    # block layout is FIXED (64 blocks) regardless of num_cpus: the
    # scaling protocol compares levels on the SAME input, and a
    # num_cpus-derived parallelism hands the 2-CPU level 300 MB blocks
    # while the 32-CPU level gets 19 MB ones — a layout asymmetry that
    # contaminates the ratio (observed: superlinear 2v8 "efficiency").
    pages = pages_dataset(
        cfg, parallelism=int(os.environ.get("BENCH_INPUT_BLOCKS", "64"))
    ).materialize()

    # Seed the FULL page set: the metric is frontier-schedule+fetch+
    # parse throughput at a LARGE frontier (BASELINE.json:2), not BFS
    # ramp-up. The default budget clears the whole frontier in one
    # bulk round — the steady-state regime of a 10^10 frontier, where
    # each round is huge and per-round fixed costs amortize (at 60k
    # rows they cannot; multi-round politeness/skew behavior is
    # covered by the e2e tests and by BENCH_BUDGET=4000-style runs).
    from engine.synth import coords

    seeds = tuple(page_url(h, i) for _, h, i in coords(cfg))
    default_budget = max(cfg.pages_per_host()) + 1000  # >= mega host
    crawl = CrawlConfig(
        seeds=seeds,
        budget_per_host=int(os.environ.get("BENCH_BUDGET", str(default_budget))),
        max_rounds=int(os.environ.get("BENCH_ROUNDS", "1")),
        num_shards=max(2, num_cpus // 4),  # state pools scale with the cluster (north_star)
        num_partitions=num_cpus,
    )
    # seed ingestion is one-time setup (in production the frontier IS
    # the checkpointed state) — build it and register keys untimed,
    # then time the round loop = the metric
    from engine.crawl import _seed_frontier_distributed
    from engine.seen import SeenPool

    frontier0 = _seed_frontier_distributed(crawl)
    pool = SeenPool(crawl.num_shards, mode=crawl.seen_mode)
    pool.check_and_add(frontier0["url_key"].to_pylist(), -1)

    out = tempfile.mkdtemp(prefix="bench_crawl_")
    kw = {}
    if os.environ.get("BENCH_SCHEDULE_CUTOFF"):
        # e.g. 0 forces the fully distributed schedule+join-fetch path
        kw["schedule_cutoff_rows"] = int(os.environ["BENCH_SCHEDULE_CUTOFF"])
    t0 = time.monotonic()
    res = run_crawl(pages, crawl, out, pool=pool, initial_frontier=frontier0, **kw)
    crawl_sec = time.monotonic() - t0
    result = {
        "crawl_sec": round(crawl_sec, 3),
        "urls_per_sec": round(res.total_scheduled / crawl_sec, 1),
        "scheduled": res.total_scheduled,
        "fetched": res.total_fetched,
        "rounds": res.rounds,
    }

    queries: dict[str, float] = {}
    if not crawl_only:
        import __ray_entry__ as em

        qs = em.queries()
        for name in BENCH_QUERIES:
            t0 = time.monotonic()
            r = qs[name](sf_dir)
            if hasattr(r, "to_pandas"):
                r.to_pandas()  # consume the pipeline
            queries[name] = round(time.monotonic() - t0, 3)
    result["queries"] = queries
    ray.shutdown()
    return result


def _scaling(sf_dir: str) -> None:
    """BASELINE.md protocol: 3 repeats per level in FRESH processes,
    alternating order (hi,lo,hi,lo,hi,lo) to balance page-cache state;
    median rate per level; efficiency = (rate_hi/rate_lo)/(hi/lo).

    Levels default to 8 vs 32 (the headline N-vs-4N pair) and are
    overridable via BENCH_SCALE_LEVELS="2,8" — the low pair is the
    bandwidth-honest N-vs-4N evidence: at 2 and 8 CPUs this host can
    actually supply 4x the resources at both levels, whereas the
    32-CPU level is capped by intra-node memory bandwidth that a real
    4N-node cluster does not share (BASELINE.md single-node caveat)."""
    import statistics

    lo, hi = (int(x) for x in
              os.environ.get("BENCH_SCALE_LEVELS", "8,32").split(","))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    # one small untimed warm-up run (worker spinup, page cache, JIT)
    subprocess.run(
        [sys.executable, "bench.py"],
        env=dict(os.environ, RAY_GRAFT_CPUS="32", BENCH_CRAWL_ONLY="1",
                 BENCH_PAGES="50000", BENCH_INNER="1"),
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    rates: dict[int, list] = {lo: [], hi: []}
    times: dict[int, list] = {lo: [], hi: []}
    for _ in range(repeats):
        for ncpu in (hi, lo):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_CRAWL_ONLY="1",
                       BENCH_INNER="1")
            out = subprocess.run(
                [sys.executable, "bench.py"], env=env, capture_output=True,
                text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            j = json.loads(out.strip().splitlines()[-1])
            rates[ncpu].append(j["urls_per_sec"])
            times[ncpu].append(j["value"])
    r_lo, r_hi = statistics.median(rates[lo]), statistics.median(rates[hi])
    eff = (r_hi / r_lo) / (hi / lo)
    print(
        json.dumps(
            {
                f"sec_{lo}": statistics.median(times[lo]),
                f"sec_{hi}": statistics.median(times[hi]),
                f"urls_per_sec_{lo}": r_lo,
                f"urls_per_sec_{hi}": r_hi,
                f"all_rates_{lo}": rates[lo],
                f"all_rates_{hi}": rates[hi],
                "levels": [lo, hi],
                "scaling_efficiency": round(eff, 3),
                "repeats": repeats,
            }
        )
    )


def _print_record(r: dict, sf_dir: str, num_cpus: int, extra=None) -> None:
    rec = {
        "metric": "hermetic crawl (frontier-schedule+fetch+parse) wall sec; queries at GRAFT_SF_DIR",
        "value": r["crawl_sec"],
        "unit": "sec",
        "queries": r["queries"],
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "urls_per_sec": r["urls_per_sec"],
        "crawl_scheduled": r["scheduled"],
        "crawl_fetched": r["fetched"],
        "crawl_rounds": r["rounds"],
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        _scaling(sf_dir)
        return
    crawl_only = os.environ.get("BENCH_CRAWL_ONLY") == "1"
    # 5 fresh-process repeats for the recorded headline median: single
    # crawl runs swing ±30% with host-neighbor contention (BASELINE.md
    # round-4 notes); 5 samples make the median robust to one bad rep
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))
    if os.environ.get("BENCH_INNER") == "1" or repeats <= 1:
        r = _bench_once(num_cpus, sf_dir, crawl_only)
        _print_record(r, sf_dir, num_cpus)
        return
    # PROTOCOL MODE (the default): BASELINE.md's measurement rule —
    # one small untimed warm-up, then the crawl headline as the MEDIAN
    # of `repeats` fresh-process runs (single crawl runs swing ±15% on
    # this host; a one-sample record misreads round-over-round drift),
    # then the query timings once in this process.
    import statistics
    import subprocess

    cwd = os.path.dirname(os.path.abspath(__file__))
    base_env = dict(os.environ, BENCH_INNER="1", BENCH_CRAWL_ONLY="1")
    subprocess.run(
        [sys.executable, "bench.py"],
        env=dict(base_env, BENCH_PAGES="50000"),
        capture_output=True, text=True, check=True, cwd=cwd,
    )  # warm-up
    runs = []
    for _ in range(repeats):
        out = subprocess.run(
            [sys.executable, "bench.py"], env=base_env,
            capture_output=True, text=True, check=True, cwd=cwd,
        ).stdout
        runs.append(json.loads(out.strip().splitlines()[-1]))
    # Multi-round politeness regime (BASELINE.md secondary): budget-
    # bound mega-host draining across 6 BSP rounds exercises the
    # scheduling path (frontier carry-over, per-host budgets, seen
    # growth) that the single-bulk-round headline does not. Recorded
    # so round-over-round regressions in scheduling are machine-
    # visible (VERDICT r4 item 7), not prose-only.
    mr_out = subprocess.run(
        [sys.executable, "bench.py"],
        env=dict(base_env, BENCH_BUDGET="4000", BENCH_ROUNDS="6",
                 BENCH_PAGES="400000"),
        capture_output=True, text=True, check=True, cwd=cwd,
    ).stdout
    mr = json.loads(mr_out.strip().splitlines()[-1])
    med = {
        "crawl_sec": statistics.median(r["value"] for r in runs),
        "urls_per_sec": statistics.median(r["urls_per_sec"] for r in runs),
        "scheduled": runs[0]["crawl_scheduled"],
        "fetched": runs[0]["crawl_fetched"],
        "rounds": runs[0]["crawl_rounds"],
        "queries": {},
    }
    if not crawl_only:
        med["queries"] = _bench_once(num_cpus, sf_dir, False, skip_crawl=True)[
            "queries"
        ]
    _print_record(
        med, sf_dir, num_cpus,
        extra={
            "repeats": repeats,
            "all_crawl_rates": [r["urls_per_sec"] for r in runs],
            "multi_round_urls_per_sec": mr["urls_per_sec"],
            "multi_round_sec": mr["value"],
            "multi_round_rounds": mr["crawl_rounds"],
            "multi_round_scheduled": mr["crawl_scheduled"],
        },
    )


if __name__ == "__main__":
    main()
