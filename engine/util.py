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


def parquet_num_rows(dir_path: str | pathlib.Path) -> int:
    """Row count of a directory of parquet files from file metadata —
    no Ray job, no data read."""
    import pyarrow.parquet as pq

    p = pathlib.Path(dir_path)
    if not p.exists():
        return 0
    return sum(pq.ParquetFile(f).metadata.num_rows for f in p.glob("*.parquet"))
