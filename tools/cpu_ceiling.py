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
    reps = {8: [], 32: []}
    for _ in range(2):
        for p in (32, 8):
            reps[p].append(_throughput(p))
    t8 = statistics.median(reps[8])
    t32 = statistics.median(reps[32])
    print(
        json.dumps(
            {
                "thr_8": round(t8),
                "thr_32": round(t32),
                "ceiling": round((t32 / t8) / 4.0, 3),
                "all_8": [round(x) for x in reps[8]],
                "all_32": [round(x) for x in reps[32]],
            }
        )
    )


if __name__ == "__main__":
    main()
