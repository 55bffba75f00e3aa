"""Small shared utilities."""

from __future__ import annotations

import pathlib


_GET_CACHE: dict = {}


def cached_get(ref):
    """ray.get with a per-worker-process deserialization cache.

    Broadcast objects (robots table, threshold dict, scheduled-url map)
    are ray.put once per round and read by every task of a stateless
    map_batches stage; plain ray.get would re-deserialize per task.
    Caching by ObjectRef keeps stateless tasks (no actor-pool startup
    per round) while paying deserialization once per worker process.
    Bounded: keeps the 16 most recent refs (rounds retire old ones).
    """
    import ray

    if ref in _GET_CACHE:
        return _GET_CACHE[ref]
    val = ray.get(ref)
    if len(_GET_CACHE) >= 16:
        _GET_CACHE.pop(next(iter(_GET_CACHE)))
    _GET_CACHE[ref] = val
    return val


def cluster_cpus() -> int:
    """Total cluster CPUs (from the live Ray cluster when initialised,
    else this host's affinity mask). Callable from driver or worker;
    the lookup is cheap but callers that use it per batch should cache
    the result."""
    import os

    try:
        import ray

        if ray.is_initialized():
            n = int(ray.cluster_resources().get("CPU", 0))
            if n:
                return n
    except Exception:
        pass
    return len(os.sched_getaffinity(0))


def scaled_buckets(at32: int, n_rows_est: int | None = None,
                   target_rows_per_bucket: int = 20_000) -> int:
    """Fan-out width for coarse-bucket groupbys / bucketed joins.

    `at32` is the value tuned on the 32-CPU sandbox (few enough buckets
    that per-group map_groups overhead stays negligible); the rule
    scales it linearly with cluster CPUs so a 1024-CPU cluster gets
    32× the fan-out, and with the caller's input-row estimate when
    known — a FIXED bucket count means group size grows linearly with
    the corpus (10^10 rows / 512 buckets = 2·10^7-row map_groups
    invocations in one worker heap). Defaults reproduce the sandbox
    constants exactly at 32 CPUs."""
    per_cpu = max(1, at32 // 32)
    n = max(at32 // 8, cluster_cpus() * per_cpu)
    if n_rows_est:
        n = max(n, n_rows_est // target_rows_per_bucket)
    return n


def parquet_num_rows(dir_path: str | pathlib.Path) -> int:
    """Row count of a directory of parquet files from file metadata —
    no Ray job, no data read."""
    import pyarrow.parquet as pq

    p = pathlib.Path(dir_path)
    if not p.exists():
        return 0
    return sum(pq.ParquetFile(f).metadata.num_rows for f in p.glob("*.parquet"))
