"""Write the golden crawl-order trace fixture (FIXTURES.md §4) ONCE.

Produced by the pure-python oracle simulator on the standard test
graph/config (mirrors tests/test_crawl.py's robots+budget scenario).
Refuses to overwrite: the frozen trace is the executable form of
"matching the reference's crawl ordering" (BASELINE.json:14) — any
regeneration is a conscious compat break.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from engine.oracle import CrawlConfig, simulate  # noqa: E402
from engine.synth import SynthConfig, build_pages_table, page_url  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "trace_sf0001.jsonl"

SYNTH = SynthConfig(n_hosts=6, n_pages=150, links_per_page=5)
SEEDS = (page_url(0, 0), page_url(1, 0), page_url(2, 0))
ROBOTS = (
    ("host-3.example", "User-agent: *\nDisallow: /\n"),
    ("host-1.example", "User-agent: *\nDisallow: /p/1\nAllow: /p/10\nCrawl-delay: 2\n"),
)
CRAWL = CrawlConfig(seeds=SEEDS, budget_per_host=2, max_rounds=60,
                    robots_raw=ROBOTS, round_time_budget_ms=6000)


def main() -> None:
    if OUT.exists():
        print(f"frozen fixture exists, refusing to overwrite: {OUT}")
        return
    t = build_pages_table(SYNTH)
    pages = dict(zip(t["url"].to_pylist(), (bytes(b) for b in t["html"].to_pylist())))
    sim = simulate(pages, CRAWL)
    with OUT.open("w") as f:
        for row in sim.trace:
            f.write(json.dumps(row, sort_keys=True) + "\n")
    print(f"wrote {len(sim.trace)} trace lines to {OUT}")


if __name__ == "__main__":
    main()
