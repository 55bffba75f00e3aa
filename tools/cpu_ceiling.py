"""Measure this host's pure-CPU 8->32-process scaling ceiling.

The sandbox proxies "N vs 4N nodes" with 8 vs 32 CPUs on ONE node, so
shared memory controllers / SMT / host-neighbor contention cap the
efficiency ANY CPU-bound pipeline can show. The ceiling is NOT stable
across days (BASELINE.md) — run this alongside every scaling
measurement session and quote efficiency against the same-day number.

Method: P processes each sha1-hash a fixed byte volume; throughput =
P*work/wall; ceiling = (thr32/thr8)/4. Two interleaved reps per level,
median. Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import statistics
import time

N_UPDATES = 400_000
BLOCK = b"x" * 4096


def _spin(n: int) -> str:
    h = hashlib.sha1()
    for _ in range(n):
        h.update(BLOCK)
    return h.hexdigest()


def _throughput(procs: int) -> float:
    with mp.Pool(procs) as pool:
        pool.map(_spin, [1000] * procs)  # warm the pool
        t0 = time.monotonic()
        pool.map(_spin, [N_UPDATES] * procs)
        dt = time.monotonic() - t0
    return procs * N_UPDATES / dt


def main() -> None:
    import sys

    lo, hi = 8, 32
    if len(sys.argv) > 1:  # e.g. `cpu_ceiling.py 2 8` for the low pair
        lo, hi = int(sys.argv[1]), int(sys.argv[2])
    reps = {lo: [], hi: []}
    for _ in range(2):
        for p in (hi, lo):
            reps[p].append(_throughput(p))
    t_lo = statistics.median(reps[lo])
    t_hi = statistics.median(reps[hi])
    print(
        json.dumps(
            {
                f"thr_{lo}": round(t_lo),
                f"thr_{hi}": round(t_hi),
                "ceiling": round((t_hi / t_lo) / (hi / lo), 3),
                f"all_{lo}": [round(x) for x in reps[lo]],
                f"all_{hi}": [round(x) for x in reps[hi]],
            }
        )
    )


if __name__ == "__main__":
    main()
