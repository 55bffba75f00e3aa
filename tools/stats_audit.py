"""Per-query Ray Data execution audit: run selected queries() entries
at $GRAFT_SF_DIR, print wall seconds plus the Dataset.stats() operator
breakdown, so streaming-shape regressions (a stage materializing, a
shuffle that shouldn't exist, starved concurrency) are inspectable
rather than guessed from end-to-end timings.

Usage: python tools/stats_audit.py [query ...]
Defaults to the historically slowest entries. Owns its Ray session
(allowed: bench/CLI/test fixture).
"""

from __future__ import annotations

import os
import sys
import time

DEFAULT = [
    "groupby_agg", "dedup_minhash", "join_hash", "paragraph_dedup",
    "tfidf_topk", "agg_global",
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as em

    qs = em.queries()
    qs["agg_global"](sf_dir).to_pandas()  # untimed worker warm-up
    for name in names:
        t0 = time.monotonic()
        r = qs[name](sf_dir)
        if hasattr(r, "to_pandas"):
            out = r.to_pandas()
        wall = time.monotonic() - t0
        print(f"\n===== {name}: {wall:.2f}s, {len(out)} rows =====")
        if hasattr(r, "stats"):
            print(r.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
