"""Command-line entry points — the app surface of the engine
(`python -m engine.cli <cmd>`). The reference is usable both as a
library and as a crawler app; this is the app half. Owns its Ray
session (allowed alongside bench.py / test fixtures — library modules
never call ray.init).

Commands:
  crawl   --pages <parquet> --seeds <file|url,url,...> --out <dir>
          hermetic crawl of a pages table (plus --budget, --rounds,
          --resume, --fetch-mode, --discover-robots)
  query   --name <queries() key> --sf-dir <dir> [--out <parquet dir>]
          run one operator pipeline; prints rows or writes parquet
  warc    --fetched <dir> --out <dir> [--mode capture]
          export a fetched/pages parquet dir as WARC/1.0 + CDX
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _cmd_crawl(args) -> int:
    _ray_init(args.num_cpus)
    import ray.data as rd

    from engine.crawl import run_crawl
    from engine.oracle import CrawlConfig

    if args.seeds_file:
        seeds = tuple(
            line.strip() for line in open(args.seeds_file) if line.strip()
        )
    else:
        seeds = tuple(s for s in (args.seeds or "").split(",") if s)
    if not seeds:
        print("no seeds given (--seeds or --seeds-file)", file=sys.stderr)
        return 2
    crawl = CrawlConfig(
        seeds=seeds,
        budget_per_host=args.budget,
        max_rounds=args.rounds,
        num_shards=args.shards,
        seen_mode=args.seen_mode,
        discover_robots=args.discover_robots,
    )
    pages = rd.read_parquet(args.pages)
    res = run_crawl(pages, crawl, args.out, resume=args.resume,
                    fetch_mode=args.fetch_mode)
    print(json.dumps({
        "rounds": res.rounds,
        "scheduled": res.total_scheduled,
        "fetched": res.total_fetched,
        "errors": res.total_errors,
        "out": res.out_dir,
    }))
    return 0


def _cmd_query(args) -> int:
    _ray_init(args.num_cpus)
    import __ray_entry__ as em

    qs = em.queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; known: {sorted(qs)}", file=sys.stderr)
        return 2
    res = qs[args.name](args.sf_dir)
    if args.out:
        if hasattr(res, "write_parquet"):
            res.write_parquet(args.out)
        else:
            import pyarrow as pa
            import pyarrow.parquet as pq

            t = res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
            pq.write_table(t, f"{args.out.rstrip('/')}/part-0.parquet")
        print(json.dumps({"written": args.out}))
    else:
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        print(df.head(args.limit).to_string())
        print(json.dumps({"rows": len(df)}))
    return 0


def _cmd_warc(args) -> int:
    _ray_init(args.num_cpus)
    import ray.data as rd

    from engine.warc import write_warc_datasink

    n = write_warc_datasink(rd.read_parquet(args.fetched), args.out,
                            mode=args.mode)
    print(json.dumps({"records_indexed": n, "out": args.out}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="engine.cli", description=__doc__)
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl")
    c.add_argument("--pages", required=True)
    c.add_argument("--seeds")
    c.add_argument("--seeds-file")
    c.add_argument("--out", required=True)
    c.add_argument("--budget", type=int, default=8)
    c.add_argument("--rounds", type=int, default=16)
    c.add_argument("--shards", type=int, default=4)
    c.add_argument("--seen-mode", default="exact", choices=["exact", "cuckoo"])
    c.add_argument("--fetch-mode", default="broadcast", choices=["broadcast", "join"])
    c.add_argument("--resume", action="store_true")
    c.add_argument("--discover-robots", action="store_true")
    c.set_defaults(fn=_cmd_crawl)

    q = sub.add_parser("query")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--out")
    q.add_argument("--limit", type=int, default=20)
    q.set_defaults(fn=_cmd_query)

    w = sub.add_parser("warc")
    w.add_argument("--fetched", required=True)
    w.add_argument("--out", required=True)
    w.add_argument("--mode", default="resource", choices=["resource", "capture"])
    w.set_defaults(fn=_cmd_warc)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
