"""The crawl: iterative BSP rounds of streaming Ray Data stages
(SURVEY.md §3.2) with per-round, per-partition checkpoints (§4.3).

Round r, one streaming pipeline per stage group:

  frontier_r ──robots gate──► gated ──thresholds──► scheduled/deferred
  scheduled ──hermetic fetch (broadcast lookup or Dataset.join)──►
  fetched (status 200/404) ──extract_text──► write fetched/round=r/
  read back ──extract_links → rewrite → canonicalize → policy filter →
  key → intra-round dedup → SeenFilter (actor pool RPC)──► fresh
  frontier_{r+1} = deferred ∪ fresh  ──► write frontier/round=r+1/

State placement: seen in the SeenShard actor pool (checkpointed per
shard per round); robots + politeness as a broadcast RobotsTable;
metrics as crawl_log rows; nothing lives only in the driver. The
frontier is narrow (~100 B rows, html is never in it), so per-round
materialization of frontier/scheduled is bounded; page payloads stream
from parquet to parquet and are never held.

Fetch (A13/A23) is hermetic in this sandbox: a lookup of url →
(html, warc_ts) in the pages table. `fetch_mode="broadcast"` ray.puts
the scheduled url→metadata dict once and streams pages through one
map_batches (no shuffle; right for sched ≤ ~1e6); `fetch_mode="join"`
uses Dataset.join(sched, pages) — the all-to-all path for a 10^10
frontier where the scheduled set itself is huge.

Checkpoint layout (§4.3): out/{fetched,frontier,seen,lineage,trace}/
round=R/... + MANIFEST.json written LAST (commit point). Resume reads
MANIFEST, reloads seen shards, re-enters the loop at next_round.
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from engine import frontier as fr
from engine.kernels import (
    canonicalize_url,
    discovery_seq,
    extract_links_batch,
    extract_text_batch,
    host_hash64,
    host_of,
    key64,
    key_batch,
    sha1_key,
)
from engine.oracle import CrawlConfig
from engine.robots import RobotsTable
from engine.schemas import FRONTIER
from engine.seen import SeenPool
from engine.util import cached_get, parquet_num_rows


# ---------------------------------------------------------------------------
# batch stages
# ---------------------------------------------------------------------------

def robots_gate_fn(robots_ref):
    """Stage factory: filter frontier rows whose url robots disallows.
    The RobotsTable travels as one ray.put object, deserialized once
    per worker process (util.cached_get) — stateless tasks, no
    actor-pool startup per round."""

    def gate(t: pa.Table) -> pa.Table:
        robots: RobotsTable = cached_get(robots_ref)
        mask = robots.allowed_mask(t["host"].to_pylist(), t["url"].to_pylist())
        return t.filter(pa.array(mask, pa.bool_()))

    return gate


def seen_filter_fn(actors, num_shards: int, round_no: int):
    """A21: frontier ∖ seen via batched check_and_add RPCs to the shard
    actors (the scalable anti-join against a persistent accumulating
    set). Keeps rows whose url_key is NEW this round."""

    def seen_filter(t: pa.Table) -> pa.Table:
        import ray

        if t.num_rows == 0:
            return t
        keys = t["url_key"].to_pylist()
        shards = np.array([key64(k) % num_shards for k in keys])
        mask = np.zeros(len(keys), dtype=bool)
        futs = []
        for s in range(num_shards):
            idx = np.flatnonzero(shards == s)
            if len(idx):
                futs.append((idx, actors[s].check_and_add.remote(
                    [keys[i] for i in idx], round_no)))
        for idx, f in futs:
            mask[idx] = ray.get(f)
        return t.filter(pa.array(mask))

    return seen_filter


def _links_to_frontier(t: pa.Table, policy, seed_hosts: frozenset) -> pa.Table:
    """rewrite (A11) → canonicalize (A6) → policy filter (A10/A12/A28)
    → key (A7) → frontier-shaped rows for extracted-link batches."""
    urls = t["url"].to_pylist()
    kinds = t["kind"].to_pylist()
    pdepth = t["parent_depth"].to_pylist()
    parents = t["parent_url"].to_pylist()
    lidx = t["link_index"].to_pylist()
    rows: dict[str, list] = {k: [] for k in (
        "url", "url_key", "host", "host_hash", "depth", "priority",
        "discovery_seq", "parent_url", "link_index")}
    rw = policy.rewrite
    for u, kind, pd, par, li in zip(urls, kinds, pdepth, parents, lidx):
        if rw is not None:
            u = rw(u)
        cu = canonicalize_url(u)
        d = pd + 1
        if not policy.link_allowed(cu, kind, d, seed_hosts):
            continue
        k = sha1_key(cu)
        h = host_of(cu)
        rows["url"].append(cu)
        rows["url_key"].append(k)
        rows["host"].append(h)
        rows["host_hash"].append(host_hash64(h))
        rows["depth"].append(d)
        rows["priority"].append(0)
        rows["discovery_seq"].append(discovery_seq(d, k))
        rows["parent_url"].append(par)
        rows["link_index"].append(li)
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "url_key": pa.array(rows["url_key"], pa.binary(20)),
            "host": pa.array(rows["host"], pa.string()),
            "host_hash": pa.array(rows["host_hash"], pa.uint64()),
            "depth": pa.array(rows["depth"], pa.int32()),
            "priority": pa.array(rows["priority"], pa.int32()),
            "discovery_seq": pa.array(rows["discovery_seq"], pa.int64()),
            "parent_url": pa.array(rows["parent_url"], pa.string()),
            "link_index": pa.array(rows["link_index"], pa.int32()),
            "key64": pa.array([key64(k) for k in rows["url_key"]], pa.uint64()),
        }
    )


def _dedup_first(g: pa.Table) -> pa.Table:
    """A25 intra-round dedup: within a key64 group, one row per
    url_key — first by (discovery_seq, parent_url, link_index)."""
    if g.num_rows <= 1:
        return g
    import pandas as pd

    df = g.to_pandas()
    df = df.sort_values(["discovery_seq", "parent_url", "link_index"], kind="mergesort")
    df = df.drop_duplicates(subset=["url_key"], keep="first")
    return pa.Table.from_pandas(df, preserve_index=False).cast(g.schema)


# ---------------------------------------------------------------------------
# crawl driver
# ---------------------------------------------------------------------------

@dataclass
class CrawlResult:
    rounds: int = 0
    total_scheduled: int = 0
    total_fetched: int = 0
    total_errors: int = 0
    out_dir: str = ""
    metrics: list = field(default_factory=list)

    def trace(self) -> list[dict]:
        rows = []
        d = pathlib.Path(self.out_dir) / "trace"
        for p in sorted(d.glob("round=*/trace.parquet"),
                        key=lambda p: int(p.parent.name.split("=")[1])):
            rows.extend(pq.read_table(p).to_pylist())
        return rows

    def seen_keys(self, pool: SeenPool) -> set[bytes]:
        return pool.all_keys()


def _seed_frontier(crawl: CrawlConfig) -> pa.Table:
    rows: dict[str, list] = {k: [] for k in (
        "url", "url_key", "host", "host_hash", "depth", "priority",
        "discovery_seq", "parent_url")}
    seen_local = set()
    for s in crawl.seeds:
        cu = canonicalize_url(s)
        k = sha1_key(cu)
        if k in seen_local:
            continue
        seen_local.add(k)
        h = host_of(cu)
        rows["url"].append(cu)
        rows["url_key"].append(k)
        rows["host"].append(h)
        rows["host_hash"].append(host_hash64(h))
        rows["depth"].append(0)
        rows["priority"].append(0)
        rows["discovery_seq"].append(discovery_seq(0, k))
        rows["parent_url"].append("")
    return pa.Table.from_pydict(rows, schema=FRONTIER)


def _config_hash(crawl: CrawlConfig) -> str:
    blob = json.dumps(
        {
            "seeds": list(crawl.seeds),
            "budget": crawl.budget_per_host,
            "round_time": crawl.round_time_budget_ms,
            "max_rounds": crawl.max_rounds,
            "robots": list(crawl.robots_raw),
            "shards": crawl.num_shards,
            "mode": crawl.seen_mode,
        },
        sort_keys=True,
    ).encode()
    return hashlib.sha1(blob).hexdigest()[:12]


def run_crawl(pages_ds, crawl: CrawlConfig, out_dir: str,
              pool: SeenPool | None = None, resume: bool = False,
              fetch_mode: str = "broadcast") -> CrawlResult:
    """pages_ds: ray.data.Dataset of the pages table (or pa.Table).
    Returns after the frontier drains or max_rounds. The passed-in
    `pool` (or a fresh one) holds the final seen set."""
    import ray
    import ray.data as rd

    if isinstance(pages_ds, pa.Table):
        pages_tbl = pages_ds
        pages_ds = rd.from_arrow(pages_tbl)

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    robots = RobotsTable(dict(crawl.robots_raw))
    robots_ref = ray.put(robots)
    delays = {h: robots.crawl_delay_ms(h) for h, _ in crawl.robots_raw}
    policy = crawl.policy
    seed_hosts = frozenset(host_of(canonicalize_url(s)) for s in crawl.seeds)
    res = CrawlResult(out_dir=str(out))

    if pool is None:
        pool = SeenPool(crawl.num_shards, mode=crawl.seen_mode)
    res.pool = pool  # type: ignore[attr-defined]

    manifest_path = out / "MANIFEST.json"
    if resume and manifest_path.exists():
        man = json.loads(manifest_path.read_text())
        start_round = man["next_round"]
        blobs = [
            (out / "seen" / f"round={start_round}" / f"shard={s}.bin").read_bytes()
            for s in range(crawl.num_shards)
        ]
        pool.load_all(blobs)
        frontier_tbl = None  # read from parquet below
        res.metrics = man.get("metrics", [])
        res.total_scheduled = man.get("total_scheduled", 0)
        res.total_fetched = man.get("total_fetched", 0)
        res.total_errors = man.get("total_errors", 0)
    else:
        start_round = 0
        seed_tbl = _seed_frontier(crawl)
        pool.check_and_add(seed_tbl["url_key"].to_pylist(), -1)
        fdir = out / "frontier" / "round=0"
        fdir.mkdir(parents=True, exist_ok=True)
        pq.write_table(seed_tbl, fdir / "part-0.parquet")
        frontier_tbl = seed_tbl

    for rnd in range(start_round, crawl.max_rounds):
        t0 = time.monotonic()
        fdir = out / "frontier" / f"round={rnd}"
        urls_in = parquet_num_rows(fdir)
        if urls_in == 0:
            break
        frontier_ds = rd.read_parquet(str(fdir))
        res.rounds = rnd + 1

        # 1. robots gate (A14) — narrow rows, materialize is bounded;
        #    skipped entirely when there are no robots rules at all
        if robots.rules:
            gated = frontier_ds.map_batches(
                robots_gate_fn(robots_ref), batch_format="pyarrow"
            ).materialize()
            gated_count = gated.count()  # metadata-cheap on materialized
        else:
            gated = frontier_ds
            gated_count = urls_in
        robots_blocked = urls_in - gated_count

        # 2. per-host thresholds (A26) + schedule/defer split
        empty_frontier = _seed_frontier(CrawlConfig(seeds=()))
        if gated_count > 0:
            thresholds = fr.compute_thresholds(
                gated, crawl.budget_per_host, delays, crawl.round_time_budget_ms
            )
            thr_ref = ray.put(thresholds)

            def _mark(t: pa.Table) -> pa.Table:
                return fr.mark_scheduled(t, cached_get(thr_ref))

            marked = gated.map_batches(_mark, batch_format="pyarrow").materialize()
            sched_parts = [
                t.filter(t["scheduled"]).drop_columns(["scheduled"])
                for t in ray.get(marked.to_arrow_refs())
                if t.num_rows
            ]
            sched_parts = [t for t in sched_parts if t.num_rows]
            sched_tbl = (
                pa.concat_tables(sched_parts) if sched_parts else empty_frontier
            )
            deferred = marked.map_batches(
                lambda t: t.filter(pc.invert(t["scheduled"])).drop_columns(["scheduled"]),
                batch_format="pyarrow",
            )
        else:
            sched_tbl = empty_frontier
            deferred = rd.from_arrow(empty_frontier)

        # 3. hermetic fetch (A13/A23)
        fetched_dir = out / "fetched" / f"round={rnd}"
        n_sched = sched_tbl.num_rows
        if n_sched > 0:
            sched_meta = {
                u: (d, s)
                for u, d, s in zip(
                    sched_tbl["url"].to_pylist(),
                    sched_tbl["depth"].to_pylist(),
                    sched_tbl["discovery_seq"].to_pylist(),
                )
            }
            if fetch_mode == "broadcast":
                meta_ref = ray.put(sched_meta)

                def _fetch(t: pa.Table, _rnd=rnd) -> pa.Table:
                    meta = cached_get(meta_ref)
                    urls = t["url"].to_pylist()
                    mask = [u in meta for u in urls]
                    t = t.filter(pa.array(mask, pa.bool_()))
                    urls = t["url"].to_pylist()
                    n = len(urls)
                    t = t.append_column("status", pa.array([200] * n, pa.int32()))
                    t = t.append_column("fetch_round", pa.array([_rnd] * n, pa.int32()))
                    t = t.append_column("depth", pa.array([meta[u][0] for u in urls], pa.int32()))
                    t = t.append_column(
                        "discovery_seq", pa.array([meta[u][1] for u in urls], pa.int64())
                    )
                    return t

                hits = pages_ds.map_batches(_fetch, batch_format="pyarrow")
            else:  # join mode: all-to-all on url (scale path)
                sched_ds = rd.from_arrow(
                    sched_tbl.select(["url", "depth", "discovery_seq"])
                )
                nparts = max(2, crawl.num_partitions)
                hits = sched_ds.join(
                    pages_ds, "inner", num_partitions=nparts, on=("url",)
                ).map_batches(
                    lambda t, _rnd=rnd: t.append_column(
                        "status", pa.array([200] * t.num_rows, pa.int32())
                    ).append_column(
                        "fetch_round", pa.array([_rnd] * t.num_rows, pa.int32())
                    ),
                    batch_format="pyarrow",
                )
            # recompute text from html — A9, the byte-identity surface
            hits = hits.map_batches(extract_text_batch, batch_format="pyarrow")
            hits = hits.select_columns(
                ["url", "warc_ts", "html", "text", "lang",
                 "status", "fetch_round", "depth", "discovery_seq"]
            )
            fetched_dir.mkdir(parents=True, exist_ok=True)
            hits.write_parquet(str(fetched_dir))
            hit_urls = set()
            for p in fetched_dir.glob("*.parquet"):
                hit_urls.update(pq.read_table(p, columns=["url"])["url"].to_pylist())
            n_fetched = len(hit_urls)
            # 404s: scheduled urls with no page
            miss_urls = [u for u in sched_meta if u not in hit_urls]
            if miss_urls:
                miss_tbl = pa.table(
                    {
                        "url": pa.array(miss_urls, pa.string()),
                        "warc_ts": pa.array([None] * len(miss_urls), pa.timestamp("us")),
                        "html": pa.array([None] * len(miss_urls), pa.binary()),
                        "text": pa.array([""] * len(miss_urls), pa.string()),
                        "lang": pa.array([None] * len(miss_urls), pa.string()),
                        "status": pa.array([404] * len(miss_urls), pa.int32()),
                        "fetch_round": pa.array([rnd] * len(miss_urls), pa.int32()),
                        "depth": pa.array([sched_meta[u][0] for u in miss_urls], pa.int32()),
                        "discovery_seq": pa.array(
                            [sched_meta[u][1] for u in miss_urls], pa.int64()
                        ),
                    }
                )
                pq.write_table(miss_tbl, fetched_dir / "misses.parquet")
            n_errors = len(miss_urls)
        else:
            fetched_dir.mkdir(parents=True, exist_ok=True)
            n_fetched = n_errors = 0
            hit_urls = set()

        # trace (FIXTURES.md §4): scheduled rows, (seq, url) order
        tdir = out / "trace" / f"round={rnd}"
        tdir.mkdir(parents=True, exist_ok=True)
        if n_sched:
            order = pc.sort_indices(
                sched_tbl, sort_keys=[("discovery_seq", "ascending"), ("url", "ascending")]
            )
            st = sched_tbl.take(order)
            trace_tbl = pa.table(
                {
                    "round": pa.array([rnd] * n_sched, pa.int32()),
                    "host": st["host"],
                    "url": st["url"],
                    "discovery_seq": st["discovery_seq"],
                    "status": pa.array(
                        [200 if u in hit_urls else 404 for u in st["url"].to_pylist()],
                        pa.int32(),
                    ),
                }
            )
        else:
            trace_tbl = pa.table(
                {
                    "round": pa.array([], pa.int32()),
                    "host": pa.array([], pa.string()),
                    "url": pa.array([], pa.string()),
                    "discovery_seq": pa.array([], pa.int64()),
                    "status": pa.array([], pa.int32()),
                }
            )
        pq.write_table(trace_tbl, tdir / "trace.parquet")

        # 4. link discovery → fresh frontier (A8,A11,A6,A10,A25,A21)
        if n_fetched > 0:
            parsed = rd.read_parquet(str(fetched_dir), columns=["url", "html", "depth", "status"])
            links = (
                parsed.map_batches(
                    lambda t: t.filter(pc.equal(t["status"], 200)),
                    batch_format="pyarrow",
                )
                .map_batches(extract_links_batch, batch_format="pyarrow")
                .map_batches(
                    lambda t, _p=policy, _sh=seed_hosts: _links_to_frontier(t, _p, _sh),
                    batch_format="pyarrow",
                )
            )
            deduped = links.groupby("key64").map_groups(_dedup_first, batch_format="pyarrow")
            fresh = deduped.map_batches(
                seen_filter_fn(pool.actors, pool.num_shards, rnd),
                batch_format="pyarrow",
            ).drop_columns(["link_index", "key64"])
            nxt = deferred.union(fresh)
        else:
            nxt = deferred

        nfdir = out / "frontier" / f"round={rnd + 1}"
        nfdir.mkdir(parents=True, exist_ok=True)
        nxt.write_parquet(str(nfdir))
        n_next = parquet_num_rows(nfdir)
        n_deferred = gated_count - n_sched
        new_links = n_next - n_deferred

        # 5. checkpoint seen + lineage, then commit MANIFEST (§4.3)
        sdir = out / "seen" / f"round={rnd + 1}"
        sdir.mkdir(parents=True, exist_ok=True)
        for s, blob in enumerate(pool.serialize_all()):
            (sdir / f"shard={s}.bin").write_bytes(blob)
        res.total_scheduled += n_sched
        res.total_fetched += n_fetched
        res.total_errors += n_errors
        res.metrics.append(
            {
                "round": rnd,
                "urls_in": urls_in,
                "robots_blocked": robots_blocked,
                "scheduled": n_sched,
                "fetched": n_fetched,
                "errors": n_errors,
                "new_links": int(new_links),
                "wall_ms": int((time.monotonic() - t0) * 1000),
            }
        )
        ldir = out / "lineage" / f"round={rnd}"
        ldir.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.Table.from_pylist([res.metrics[-1]]), ldir / "crawl_log.parquet"
        )
        manifest_path.write_text(
            json.dumps(
                {
                    "next_round": rnd + 1,
                    "config_hash": _config_hash(crawl),
                    "metrics": res.metrics,
                    "total_scheduled": res.total_scheduled,
                    "total_fetched": res.total_fetched,
                    "total_errors": res.total_errors,
                },
                indent=1,
            )
        )
        if n_next == 0:
            break
    return res
