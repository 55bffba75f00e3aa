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


def strip_schema_metadata(t):
    """Drop schema-level metadata from an Arrow batch (zero-copy).

    The driver-generated testdata parquet carries pandas metadata in
    its schema, and a pa.Schema whose metadata holds a dict is
    UNHASHABLE — every Ray schema-unification then logs 'Failed to
    hash the schemas (for deduplication)' and skips dedup. Applied as
    a fused map_batches right after read_parquet."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(path, columns=None):
    """read_parquet + schema-metadata strip (see strip_schema_metadata).

    The stripped schema is also passed to read_parquet itself
    (projected to `columns`) so schema unification INSIDE the read
    task — which runs before any fused map stage — never sees the
    unhashable metadata either."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    first = path[0] if isinstance(path, (list, tuple)) else path
    kw = {}
    try:
        fs = pq.read_schema(first).remove_metadata()
        if columns is not None:
            fs = pa.schema([fs.field(c) for c in columns])
        kw["schema"] = fs
    except Exception:
        pass  # odd layouts: fall back to the post-read strip alone
    return rd.read_parquet(path, columns=columns, **kw).map_batches(
        strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )


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
    if p.is_file():
        return pq.ParquetFile(p).metadata.num_rows
    return sum(pq.ParquetFile(f).metadata.num_rows for f in p.glob("*.parquet"))
