"""Full-coverage oracle self-check (the driver records only the first
50 queries() entries into CORRECTNESS_r{N}.json; this tool runs EVERY
oracle-backed entry and writes CORRECTNESS_SELF.json with the same
row/schema/value verdict shape, so the ops past the driver's cap have
reproducible on-disk evidence too).

Usage: python tools/self_correctness.py [sf_dir] [out.json]
Defaults: /root/testdata/sf0.01, CORRECTNESS_SELF.json (repo root).

Comparison mirrors the driver: row count, column-name set, and an
order-insensitive value comparison over columns sorted by name —
strict equality (plus a str() fallback for timestamp formatting), no
float tolerance: every float-producing oracle in this repo is exact
fixed-point by construction.
"""

from __future__ import annotations

import json
import os
import sys


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, "CORRECTNESS_SELF.json"
    )

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as em

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = em.queries()
    oracles = em.oracle_sql()
    results: dict[str, dict] = {}
    for name in queries:
        if name not in oracles:
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "err": "no_oracle"}
            continue
        try:
            a = queries[name](sf_dir)
            a = a.to_pandas() if hasattr(a, "to_pandas") else a
            b = con.sql(oracles[name]).df()
            cols = sorted(a.columns)
            rows_match = len(a) == len(b)
            schema_match = cols == sorted(b.columns)
            value_match = False
            if rows_match and schema_match:
                aa = a[cols].sort_values(by=cols).reset_index(drop=True)
                bb = b[cols].sort_values(by=cols).reset_index(drop=True)
                value_match = all(
                    x == y or str(x) == str(y)
                    for c in cols
                    for x, y in zip(aa[c], bb[c])
                )
                # driver hashes values dtype-sensitively: int/float
                # drift fails there even when values compare equal
                for c in cols:
                    ka, kb = aa[c].dtype.kind, bb[c].dtype.kind
                    if {ka, kb} <= {"i", "u", "f"} and (
                        (ka in "iu") != (kb in "iu")
                    ):
                        value_match = False
            results[name] = {
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": value_match,
                "spark_rows": int(len(a)),
                "oracle_rows": int(len(b)),
                "err": None,
            }
        except Exception as e:  # keep going; record the failure
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "err": repr(e)[:200]}
        status = results[name]
        flag = ("PASS" if status.get("hash_match")
                else status.get("err") or "FAIL")
        print(f"{name}: {flag}", file=sys.stderr)

    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
    n_ok = sum(1 for r in results.values() if r.get("hash_match"))
    n_oracle = sum(1 for r in results.values() if r.get("err") != "no_oracle")
    print(json.dumps({"checked": n_oracle, "hash_pass": n_ok,
                      "total_entries": len(results), "out": out_path}))
    ray.shutdown()
    return 0 if n_ok == n_oracle else 1


if __name__ == "__main__":
    raise SystemExit(main())
