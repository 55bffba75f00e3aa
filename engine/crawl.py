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
(html, warc_ts) in the pages table. Two single-pass fetch paths:
`fetch_mode="broadcast"` (hybrid branch only, frontier ≤
schedule_cutoff_rows) ray.puts the scheduled metadata table once and
streams pages through one map_batches (no shuffle); the distributed
branch (and `fetch_mode="join"`) runs _join_fetch_round — a left_outer
Dataset.join sched ⋈ pages whose tasks write fetched/trace/counts
parts themselves and stream link candidates into the seen filter, so
nothing O(scheduled) ever lands on the driver.

Checkpoint layout (§4.3): out/{fetched,frontier,seen,lineage,trace}/
round=R/... + MANIFEST.json written LAST (commit point). Resume reads
MANIFEST, reloads seen shards, re-enters the loop at next_round.
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib
import time
from dataclasses import dataclass, field

_PROFILE = os.environ.get("CRAWL_PROFILE") == "1"


class _Prof:
    """Phase timer: active only with CRAWL_PROFILE=1 (prints one line
    per phase per round to stderr)."""

    def __init__(self, rnd: int):
        self.rnd = rnd
        self.t = time.monotonic()

    def mark(self, name: str) -> None:
        if _PROFILE:
            now = time.monotonic()
            import sys

            print(f"[prof] r{self.rnd} {name} {now - self.t:.2f}s", file=sys.stderr)
            self.t = now
        else:
            self.t = time.monotonic()

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from engine import frontier as fr
from engine.kernels import (
    LINKS_TYPE,
    canonicalize_url,
    discovery_seq,
    extract_page_batch,
    host_hash64,
    host_of,
    key64,
    key64s_of_matrix,
    keys_matrix,
    sha1_key,
)
from engine.oracle import CrawlConfig
from engine.robots import RobotsTable
from engine.schemas import FRONTIER
from engine.seen import SeenPool
from engine.util import cached_get, parquet_num_rows, scaled_buckets


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
        mat = keys_matrix(t["url_key"])
        shards = key64s_of_matrix(mat) % np.uint64(num_shards)
        mask = np.zeros(t.num_rows, dtype=bool)
        futs = []
        for s in range(num_shards):
            idx = np.flatnonzero(shards == s)
            if len(idx):
                # packed blob RPC: one bytes object instead of a list
                futs.append((idx, actors[s].check_and_add.remote(
                    mat[idx].tobytes(), round_no)))
        for idx, f in futs:
            mask[idx] = ray.get(f)
        return t.filter(pa.array(mask))

    return seen_filter


def _explode_links(t: pa.Table) -> pa.Table:
    """fetched rows (url, links:list<struct>, depth) → one row per
    out-link, LINKS-shaped. Fully arrow-native (list_flatten +
    list_parent_indices + take) — to_pylist on nested structs costs
    ~10µs/element and dominated this stage before."""
    t = t.combine_chunks()
    lcol = t["links"].chunk(0) if t["links"].num_chunks else pa.array([], type=t["links"].type)
    flat = pc.list_flatten(lcol)
    parent_idx = pc.list_parent_indices(lcol)
    return pa.table(
        {
            "url": flat.field("url"),
            "kind": flat.field("kind"),
            "parent_url": pc.take(t["url"], parent_idx),
            "parent_depth": pc.take(t["depth"], parent_idx),
            "link_index": flat.field("idx"),
        }
    )


EXTRA_LINK_IDX_BASE = 1_000_000
REDIRECT_LINK_IDX = 2_000_000
REDIRECT_STATUSES = (301, 302, 303, 307, 308)


def _redirect_links_table(t: pa.Table) -> "pa.Table | None":
    """3xx handling (A13): a fetched row with a redirect status and a
    location re-enqueues the TARGET through the normal
    rewrite→canonicalize→filter→seen chain, at the SAME depth as the
    redirected url (parent_depth = depth-1 compensates the +1 the link
    chain applies). The seen filter guarantees the target is fetched at
    most once even when links and redirects race to discover it.
    t: rows with url/depth/status/location columns."""
    if "location" not in t.column_names:
        return None
    is_redir = pc.and_(
        pc.is_in(t["status"], value_set=pa.array(list(REDIRECT_STATUSES), pa.int32())),
        pc.is_valid(t["location"]),
    )
    rt = t.filter(is_redir)
    n = rt.num_rows
    if n == 0:
        return None
    return pa.table(
        {
            "url": rt["location"].combine_chunks().cast(pa.string()),
            "kind": pa.array(["redirect"] * n, pa.string()),
            "parent_url": rt["url"],
            "parent_depth": pc.cast(
                pc.subtract(rt["depth"], pa.scalar(1, pa.int32())), pa.int32()
            ),
            "link_index": pa.array([REDIRECT_LINK_IDX] * n, pa.int32()),
        }
    )


def _extra_links_table(t: pa.Table, policy) -> "pa.Table | None":
    """A30 CollectAdditionalLinks: per fetched page, policy-yielded raw
    urls become link-candidate rows (kind="extra", link_index offset by
    EXTRA_LINK_IDX_BASE so html links win intra-round dedup ties).
    They then flow through the normal rewrite→canonicalize→filter→seen
    chain. Two hook forms share one link_index sequence (text-hook urls
    first, then raw-body-hook urls — the simulator enumerates the same
    concatenation): collect_links sees the extracted text,
    collect_links_html the raw body (JSON-cursor pagination,
    CSS-selector collection). t: hit rows with url/text/html/depth."""
    want_text = policy.collect_links is not None
    want_html = policy.collect_links_html is not None
    if not (want_text or want_html):
        return None
    urls, parents, pdepths, lidx = [], [], [], []
    texts = t["text"].to_pylist() if want_text else None
    htmls = t["html"].to_pylist() if want_html else None
    for j, (u, d) in enumerate(zip(t["url"].to_pylist(),
                                   t["depth"].to_pylist())):
        extras = []
        if want_text:
            extras.extend(policy.collect_links(u, texts[j]))
        if want_html:
            extras.extend(policy.collect_links_html(u, htmls[j]))
        for i, extra in enumerate(extras):
            urls.append(extra)
            parents.append(u)
            pdepths.append(d)
            lidx.append(EXTRA_LINK_IDX_BASE + i)
    if not urls:
        return None
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "kind": pa.array(["extra"] * len(urls), pa.string()),
            "parent_url": pa.array(parents, pa.string()),
            "parent_depth": pa.array(pdepths, pa.int32()),
            "link_index": pa.array(lidx, pa.int32()),
        }
    )


def _links_to_frontier(t: pa.Table, policy, seed_hosts: frozenset) -> pa.Table:
    """rewrite (A11) → canonicalize (A6) → policy filter (A10/A12/A28)
    → key (A7) → LOCALLY-deduped frontier-shaped rows.

    Per-batch canonicalization is memoized (link targets repeat a lot)
    and the batch's rows are deduped by url_key keeping the winner by
    (discovery_seq, parent_url, link_index) — the global winner always
    survives a local dedup, so the tiny global groupby after the seen
    filter sees orders of magnitude fewer rows (A25 two-level dedup)."""
    urls = t["url"].to_pylist()
    kinds = t["kind"].to_pylist()
    pdepth = t["parent_depth"].to_pylist()
    parents = t["parent_url"].to_pylist()
    lidx = t["link_index"].to_pylist()
    rw = policy.rewrite
    memo: dict[str, tuple] = {}  # raw url -> (canon, key, host, host_hash)
    winners: dict[bytes, tuple] = {}  # url_key -> (ordtup, rowtup)
    for u, kind, pd, par, li in zip(urls, kinds, pdepth, parents, lidx):
        if rw is not None:
            u = rw(u)
        got = memo.get(u)
        if got is None:
            cu = canonicalize_url(u)
            k = sha1_key(cu)
            got = (cu, k, host_of(cu), None)
            memo[u] = got
        cu, k, h, _ = got
        d = pd + 1
        if not policy.link_allowed(cu, kind, d, seed_hosts):
            continue
        seq = discovery_seq(d, k)
        ordtup = (seq, par, li)
        wk = k
        prev = winners.get(wk)
        if prev is None or ordtup < prev[0]:
            winners[wk] = (ordtup, (cu, k, h, d, seq, par, li))
    prio_fn = policy.priority  # None for the default-0 fast path
    ndb = _dedup_buckets()  # hoisted: never a per-row call
    host_hash_memo: dict[str, int] = {}
    rows: dict[str, list] = {k: [] for k in (
        "url", "url_key", "host", "host_hash", "depth", "priority",
        "discovery_seq", "parent_url", "link_index")}
    for _ord, (cu, k, h, d, seq, par, li) in winners.values():
        hh = host_hash_memo.get(h)
        if hh is None:
            hh = host_hash64(h)
            host_hash_memo[h] = hh
        rows["url"].append(cu)
        rows["url_key"].append(k)
        rows["host"].append(h)
        rows["host_hash"].append(hh)
        rows["depth"].append(d)
        rows["priority"].append(int(prio_fn(cu, d)) if prio_fn is not None else 0)
        rows["discovery_seq"].append(seq)
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
            "bucket": pa.array(
                [key64(k) % ndb for k in rows["url_key"]], pa.int32()
            ),
        }
    )


def _schedule_local(ftbl: pa.Table, robots: RobotsTable, budget: int,
                    round_time_ms: int) -> tuple[pa.Table, pa.Table, int]:
    """Driver-side schedule/defer split for SMALL frontiers (narrow
    rows; e.g. 2M rows ≈ 200 MB). Semantics are IDENTICAL to the
    distributed path (engine.frontier thresholds): per host, the Bh
    smallest (priority, discovery_seq, url_key) rows are scheduled,
    the rest deferred, robots-disallowed dropped. Used below a row
    cutoff to avoid per-round Ray-job fixed costs; the distributed
    path takes over beyond it (and is what a 10^10 frontier uses)."""
    import pandas as pd

    n0 = ftbl.num_rows
    if robots.rules:
        mask = robots.allowed_mask(ftbl["host"].to_pylist(), ftbl["url"].to_pylist())
        ftbl = ftbl.filter(pa.array(mask, pa.bool_()))
    robots_blocked = n0 - ftbl.num_rows
    if ftbl.num_rows == 0:
        return ftbl, ftbl, robots_blocked
    ftbl = ftbl.combine_chunks()
    if not robots.rules:
        # Fast path: no crawl-delay hosts possible and NO host over
        # budget → the schedule is the identity (defer set empty), so
        # the whole lexsort/rank machinery is skipped. Host counts via
        # np.unique on the uint64 host_hash (~15× cheaper than string
        # factorize); a hash collision can only MERGE two hosts and
        # overstate a count, i.e. skip the fast path unnecessarily —
        # never take it incorrectly. This is the steady-state shape of
        # a generously budgeted round, and the driver-serial term the
        # raw scaling efficiency is most sensitive to.
        hh = np.asarray(ftbl["host_hash"])
        _, counts = np.unique(hh, return_counts=True)
        if int(counts.max()) <= budget:
            return ftbl, ftbl.slice(0, 0), robots_blocked
    # vectorized rank-within-host on (priority, discovery_seq, url_key):
    # the 20-byte key is split into 3 big-endian ints so the whole
    # total order is one numpy lexsort — no Python/object comparisons
    mat = keys_matrix(ftbl["url_key"])
    k0 = np.ascontiguousarray(mat[:, :8]).view(">u8").ravel()
    k1 = np.ascontiguousarray(mat[:, 8:16]).view(">u8").ravel()
    k2 = np.ascontiguousarray(mat[:, 16:20]).view(">u4").ravel()
    prio = np.asarray(ftbl["priority"])
    seq = np.asarray(ftbl["discovery_seq"])
    order = np.lexsort((k2, k1, k0, seq, prio))
    host_codes, hosts_uniq = pd.factorize(np.asarray(ftbl["host"]), sort=False)
    rank = pd.Series(host_codes[order]).groupby(host_codes[order], sort=False).cumcount().to_numpy()
    delays = {h: robots.crawl_delay_ms(h) for h in hosts_uniq if robots.crawl_delay_ms(h)}
    if delays:
        bh_per_host = np.array(
            [fr.effective_budget(budget, robots.crawl_delay_ms(h), round_time_ms)
             for h in hosts_uniq], dtype=np.int64,
        )
        bh = bh_per_host[host_codes[order]]
    else:
        bh = budget
    sched_mask = np.zeros(ftbl.num_rows, dtype=bool)
    sched_mask[order[rank < bh]] = True
    arr = pa.array(sched_mask)
    return ftbl.filter(arr), ftbl.filter(pc.invert(arr)), robots_blocked


NUM_DEDUP_BUCKETS = 4096  # tuned at 32 CPUs; scaled by util.scaled_buckets
_DEDUP_BUCKETS_CACHE: list = []


def _dedup_buckets() -> int:
    """Worker-cached scaled bucket count for the intra-round dedup
    groupby (bucket count only routes — the dedup winner is
    bucket-count-independent, so determinism across parallelism levels
    is preserved)."""
    if not _DEDUP_BUCKETS_CACHE:
        _DEDUP_BUCKETS_CACHE.append(scaled_buckets(NUM_DEDUP_BUCKETS))
    return _DEDUP_BUCKETS_CACHE[0]


def _dedup_first(g: pa.Table) -> pa.Table:
    """A25 global intra-round dedup, one COARSE bucket (key64 %
    NUM_DEDUP_BUCKETS) at a time: one row per url_key — first by
    (discovery_seq, parent_url, link_index). Bucketing keeps the
    shuffle but gives map_groups thousands of rows per invocation
    instead of one tiny group per distinct key (a 125k-group
    map_groups costs ~100× more in per-group overhead than the same
    rows in 4k buckets)."""
    if g.num_rows <= 1:
        return g
    import pandas as pd

    df = g.to_pandas()
    df = df.sort_values(["discovery_seq", "parent_url", "link_index"], kind="mergesort")
    df = df.drop_duplicates(subset=["url_key"], keep="first")
    return pa.Table.from_pandas(df, preserve_index=False).cast(g.schema)


def _load_robots_into_pool(pages_ds, pool) -> int:
    """A18 discovery, scale path: ONE pass over the pages table
    collects rows whose path is exactly /robots.txt and pushes them
    into the sharded RobotsShardActor pool FROM THE MAP TASKS — the
    driver never materializes a host→text dict (the round loop later
    broadcasts only the rules for hosts present in that round's
    frontier, RobotsShardPool.round_table). Returns the robots-page
    row count (tiny counts table is the only driver-side result)."""
    from urllib.parse import urlsplit

    from engine.robots import robots_shard_of

    actors, num_shards = pool.actors, pool.num_shards

    def push(t: pa.Table) -> pa.Table:
        import ray

        mask = pc.ends_with(t["url"], pattern="/robots.txt")
        rt = t.filter(mask)
        per: dict[int, tuple[list, list, list]] = {}
        n = 0
        for u, html in zip(rt["url"].to_pylist(), rt["html"].to_pylist()):
            parts = urlsplit(u)
            if parts.path != "/robots.txt" or parts.query:
                continue
            host = parts.netloc.lower()
            s = robots_shard_of(host, num_shards)
            bucket = per.setdefault(s, ([], [], []))
            bucket[0].append(host)
            bucket[1].append(parts.scheme)
            bucket[2].append(bytes(html or b"").decode("utf-8", "replace"))
            n += 1
        futs = [actors[s].add_many.remote(*v) for s, v in per.items()]
        if futs:
            ray.get(futs)
        return pa.table({"n": pa.array([n], pa.int64())})

    total = pages_ds.map_batches(push, batch_format="pyarrow").sum("n")
    return int(total or 0)


def _join_fetch_round(sched_ds, pages_ds, rnd: int, fetched_dir, trace_dir,
                      policy, seed_hosts, pool, nparts: int):
    """A13/A23 distributed fetch — the 10^10-frontier path where the
    scheduled set itself is too big for the driver or a broadcast. The
    scheduled rows stay a Dataset end-to-end: one left_outer hash join
    sched ⋈ pages on url (misses surface as null page columns = 404),
    then a SINGLE-PASS map_batches per joined block that

      * writes the fetched part (hits parsed + misses as 404 rows),
      * writes the trace part and a 1-row counts part, and
      * RETURNS only the narrow link-candidate frontier rows, which
        stream straight into the seen filter.

    Nothing O(scheduled) is ever concatenated on the driver; round
    counts come from the tiny per-task counts parts. File names hash
    all urls in the block (idempotent under task retry)."""
    fetched_dir.mkdir(parents=True, exist_ok=True)
    trace_dir.mkdir(parents=True, exist_ok=True)
    joined = sched_ds.select_columns(
        ["url", "host", "depth", "discovery_seq"]
    ).join(pages_ds, "left_outer", num_partitions=nparts, on=("url",))
    _fd, _td = str(fetched_dir), str(trace_dir)
    _policy, _sh = policy, seed_hosts

    def process(t: pa.Table, _rnd=rnd) -> pa.Table:
        import os as _os

        if t.num_rows == 0:
            empty_links = pa.table(
                {"url": pa.array([], pa.string()),
                 "links": pa.array([], LINKS_TYPE),
                 "depth": pa.array([], pa.int32())}
            )
            return _links_to_frontier(_explode_links(empty_links), _policy, _sh)
        hit = pc.is_valid(t["html"])
        t = extract_page_batch(t)  # null html -> text "", links []
        n = t.num_rows
        if "status" in t.column_names:
            # pages carry per-page statuses (3xx rows); null -> 200
            page_st = pc.fill_null(pc.cast(t["status"], pa.int32()), 200)
            status = pc.if_else(hit, page_st, pa.scalar(404, pa.int32()))
        else:
            status = pc.if_else(
                hit, pa.scalar(200, pa.int32()), pa.scalar(404, pa.int32())
            )
        full = pa.table(
            {
                "url": t["url"],
                "warc_ts": t["warc_ts"],
                "html": t["html"],
                "text": t["text"],
                "lang": t["lang"],
                "status": status,
                "fetch_round": pa.array(np.full(n, _rnd, np.int32)),
                "depth": t["depth"],
                "discovery_seq": t["discovery_seq"],
                "links": t["links"],
            }
        )
        hsh = hashlib.sha1()
        for _u in t["url"].to_pylist():
            hsh.update(_u.encode())
            hsh.update(b"\x00")
        tag = hsh.hexdigest()[:16]

        def _write(tbl: pa.Table, d: str, name: str, comp: str) -> None:
            tmp = pathlib.Path(d) / (name + ".tmp")
            pq.write_table(tbl, tmp, compression=comp)
            _os.replace(tmp, pathlib.Path(d) / name)

        _write(full, _fd, f"part-{tag}-{n}.parquet", "zstd")
        trace_tbl = pa.table(
            {
                "round": pa.array(np.full(n, _rnd, np.int32)),
                "host": t["host"],
                "url": t["url"],
                "discovery_seq": t["discovery_seq"],
                "status": status,
            }
        )
        _write(trace_tbl, _td, f"trace-{tag}.parquet", "snappy")
        n_hit = pc.sum(pc.cast(hit, pa.int64())).as_py() or 0
        counts = pa.table(
            {"n": pa.array([n], pa.int64()), "n_hit": pa.array([n_hit], pa.int64())}
        )
        _write(counts, _td, f"counts-{tag}.parquet", "snappy")
        st_col = full["status"]
        if pc.min(st_col).as_py() == 200 and pc.max(st_col).as_py() == 200:
            ok = full  # all-200 fast path: no html-buffer copy
        else:
            ok = full.filter(pc.equal(st_col, 200))
        links_t = _explode_links(ok.select(["url", "links", "depth"]))
        redir = None
        if "location" in t.column_names:
            redir = _redirect_links_table(
                pa.table({"url": t["url"], "depth": t["depth"],
                          "status": status, "location": t["location"]})
            )
        for ex in (_extra_links_table(ok, _policy), redir):
            if ex is not None:
                links_t = pa.concat_tables([links_t, ex.cast(links_t.schema)])
        return _links_to_frontier(links_t, _policy, _sh)

    survivors = (
        joined.map_batches(process, batch_format="pyarrow")
        .map_batches(
            seen_filter_fn(pool.actors, pool.num_shards, rnd), batch_format="pyarrow"
        )
        .materialize()  # narrow rows only
    )
    n_sched = n_fetched = 0
    for p in pathlib.Path(_td).glob("counts-*.parquet"):
        ct = pq.read_table(p)
        n_sched += ct["n"][0].as_py()
        n_fetched += ct["n_hit"][0].as_py()
    return survivors, n_sched, n_fetched, n_sched - n_fetched


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
    # session state produced by CrawlPolicy.initialize (login cookies);
    # hand to FetcherActor(initial_cookies=result.init_cookies.cookies)
    # in a production (real-transport) pipeline
    init_cookies: object = None

    def trace(self) -> list[dict]:
        """Rows in canonical trace order: (round, discovery_seq, url).
        Files are written unsorted (and the distributed fetch writes
        several trace parts per round); ordering is applied here."""
        rows = []
        d = pathlib.Path(self.out_dir) / "trace"
        for rdir in sorted(d.glob("round=*"),
                           key=lambda p: int(p.name.split("=")[1])):
            parts = [pq.read_table(p) for p in sorted(rdir.glob("trace*.parquet"))]
            parts = [p for p in parts if p.num_rows]
            if not parts:
                continue
            t = pa.concat_tables(parts)
            order = pc.sort_indices(
                t, sort_keys=[("discovery_seq", "ascending"), ("url", "ascending")]
            )
            rows.extend(t.take(order).to_pylist())
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
        rows["priority"].append(crawl.policy.priority_of(cu, 0))
        rows["discovery_seq"].append(discovery_seq(0, k))
        rows["parent_url"].append("")
    return pa.Table.from_pydict(rows, schema=FRONTIER)


def _seed_frontier_distributed(crawl: CrawlConfig) -> pa.Table:
    """Large seed lists: canonicalize+key in a Ray job (the per-url
    work — urlsplit + sha1 — is the driver's only serial cost
    otherwise), then dedup driver-side by key."""
    import ray
    import ray.data as rd

    raw = pa.table({"url": pa.array(list(crawl.seeds), pa.string())})

    def key_rows(t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {k: [] for k in (
            "url", "url_key", "host", "host_hash", "depth", "priority",
            "discovery_seq", "parent_url")}
        hh_memo: dict[str, int] = {}
        for s in t["url"].to_pylist():
            cu = canonicalize_url(s)
            k = sha1_key(cu)
            h = host_of(cu)
            hh = hh_memo.get(h)
            if hh is None:
                hh = host_hash64(h)
                hh_memo[h] = hh
            rows["url"].append(cu)
            rows["url_key"].append(k)
            rows["host"].append(h)
            rows["host_hash"].append(hh)
            rows["depth"].append(0)
            rows["priority"].append(crawl.policy.priority_of(cu, 0))
            rows["discovery_seq"].append(discovery_seq(0, k))
            rows["parent_url"].append("")
        return pa.Table.from_pydict(rows, schema=FRONTIER)

    ds = rd.from_arrow(raw).repartition(32).map_batches(key_rows, batch_format="pyarrow")
    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(parts).combine_chunks()
    # dedup by url_key (rows for equal urls are identical, so any
    # winner is the same row) — exact + vectorized: numpy row-unique
    # over the full 20-byte key matrix
    mat = keys_matrix(tbl["url_key"])
    k64 = key64s_of_matrix(mat)
    if len(np.unique(k64)) == tbl.num_rows:
        return tbl  # fast path: no 64-bit dup -> no full-key dup
    _, first_idx = np.unique(mat, axis=0, return_index=True)
    if len(first_idx) < tbl.num_rows:
        return tbl.take(pa.array(np.sort(first_idx)))
    return tbl


def prepare_seed_frontier(seeds_ds, crawl: CrawlConfig, pool: SeenPool,
                          out_dir: str) -> int:
    """Distributed seed ingestion — the 10^8-seed path where even the
    seed list must not live on the driver. `seeds_ds` is a Dataset (or
    parquet path) with a `url` column. Each map task canonicalizes,
    sha1-keys and locally dedups its batch (semantics byte-identical
    to _seed_frontier: depth 0, priority_of(url, 0), seq =
    discovery_seq(0, key) — no link policy filtering, seeds are always
    admitted); the seen pool registers keys in-pipeline (round -1);
    one coarse bucket groupby picks the canonical row per url_key; and
    the groupby's tasks write the round-0 frontier parts — nothing
    seed-sized ever lands on the driver. Follow with
    run_crawl(..., pool=pool, seeded_on_disk=True). Returns the
    deduped frontier row count (from parquet metadata)."""
    import ray.data as rd

    from engine.util import read_parquet_clean

    if isinstance(seeds_ds, str):
        seeds_ds = read_parquet_clean(seeds_ds, columns=["url"])
    policy = crawl.policy
    ndb = _dedup_buckets()

    def key_rows(t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {k: [] for k in (
            "url", "url_key", "host", "host_hash", "depth", "priority",
            "discovery_seq", "parent_url", "link_index", "bucket")}
        hh_memo: dict[str, int] = {}
        local_seen: set[bytes] = set()
        for s in t["url"].to_pylist():
            cu = canonicalize_url(s)
            k = sha1_key(cu)
            if k in local_seen:  # identical rows — any winner is equal
                continue
            local_seen.add(k)
            h = host_of(cu)
            hh = hh_memo.get(h)
            if hh is None:
                hh = host_hash64(h)
                hh_memo[h] = hh
            rows["url"].append(cu)
            rows["url_key"].append(k)
            rows["host"].append(h)
            rows["host_hash"].append(hh)
            rows["depth"].append(0)
            rows["priority"].append(policy.priority_of(cu, 0))
            rows["discovery_seq"].append(discovery_seq(0, k))
            rows["parent_url"].append("")
            rows["link_index"].append(0)
            rows["bucket"].append(key64(k) % ndb)
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
                "bucket": pa.array(rows["bucket"], pa.int32()),
            }
        )

    fdir = pathlib.Path(out_dir) / "frontier" / "round=0"
    fdir.mkdir(parents=True, exist_ok=True)
    (
        seeds_ds.map_batches(key_rows, batch_format="pyarrow")
        .map_batches(
            seen_filter_fn(pool.actors, pool.num_shards, -1),
            batch_format="pyarrow",
        )
        .groupby("bucket")  # cross-task dedup (same-round keys all
        .map_groups(_dedup_first, batch_format="pyarrow")  # pass seen)
        .drop_columns(["link_index", "bucket"])
        .write_parquet(str(fdir))
    )
    return parquet_num_rows(fdir)


def _init_fetch_fn(pages_ds):
    """InitContext.fetch over the hermetic web: canonical-url lookup
    into the pages table via ONE pruned, vectorized scan per call.
    Init-time-only (a login flow touches a handful of urls); the
    crawl rounds never use this path."""
    import ray.data as rd

    if isinstance(pages_ds, pa.Table):
        tbl = pages_ds

        def fetch_tbl(url: str) -> tuple:
            cu = canonicalize_url(url)
            hit = tbl.filter(pc.equal(tbl["url"], cu))
            if hit.num_rows == 0:
                return (404, b"")
            h = hit["html"][0].as_py()
            return (200, h if isinstance(h, bytes) else bytes(h))

        return fetch_tbl

    def fetch_ds(url: str) -> tuple:
        cu = canonicalize_url(url)
        rows = (
            pages_ds.map_batches(
                lambda t, u=cu: t.filter(pc.equal(t["url"], u)).select(
                    ["url", "html"]
                ),
                batch_format="pyarrow",
            ).take(1)
        )
        if not rows:
            return (404, b"")
        h = rows[0]["html"]
        return (200, h if isinstance(h, bytes) else bytes(h))

    return fetch_ds


def _config_hash(crawl: CrawlConfig) -> str:
    # STATE-affecting config only: max_rounds is deliberately excluded
    # (it is a loop bound — resuming a 2-round checkpoint with
    # max_rounds=40 is the normal continue-the-crawl flow, not an
    # incompatible state change).
    blob = json.dumps(
        {
            "seeds": list(crawl.seeds),
            "budget": crawl.budget_per_host,
            "round_time": crawl.round_time_budget_ms,
            "robots": list(crawl.robots_raw),
            "discover": crawl.discover_robots,
            "shards": crawl.num_shards,
            "mode": crawl.seen_mode,
        },
        sort_keys=True,
    ).encode()
    return hashlib.sha1(blob).hexdigest()[:12]


def run_crawl(pages_ds, crawl: CrawlConfig, out_dir: str,
              pool: SeenPool | None = None, resume: bool = False,
              fetch_mode: str = "broadcast",
              schedule_cutoff_rows: int = 2_000_000,
              initial_frontier: "pa.Table | None" = None,
              seeded_on_disk: bool = False) -> CrawlResult:
    """pages_ds: ray.data.Dataset of the pages table (or pa.Table).
    Returns after the frontier drains or max_rounds. The passed-in
    `pool` (or a fresh one) holds the final seen set. seeded_on_disk:
    the caller already wrote out/frontier/round=0 and registered its
    keys (prepare_seed_frontier — the no-driver-materialization seed
    path); crawl.seeds is ignored then."""
    import ray
    import ray.data as rd

    _t_entry = time.monotonic()

    if isinstance(pages_ds, pa.Table):
        pages_tbl = pages_ds
        pages_ds = rd.from_arrow(pages_tbl)

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    robots = RobotsTable(dict(crawl.robots_raw))
    robots_ref = ray.put(robots)
    delays = {h: robots.crawl_delay_ms(h) for h, _ in crawl.robots_raw}
    robots_pool = None
    if crawl.discover_robots:
        from engine.robots import RobotsShardPool

        robots_pool = RobotsShardPool(max(2, crawl.num_shards))
        _load_robots_into_pool(pages_ds, robots_pool)
    policy = crawl.policy
    init_jar = None
    # the config hash is pinned to the PRISTINE config, before any
    # initialize-derived seed extension: a deterministic initialize
    # hook extends seeds identically on fresh run and resume, but a
    # pre-seeded first run (seeded_on_disk / initial_frontier) skips
    # the extension — hashing the pristine config keeps fresh-run and
    # resume hashes equal in every combination (r5, ADVICE item 2)
    cfg_hash = _config_hash(crawl)
    if policy.initialize is not None:
        # PerformInitialization (SURVEY.md §3.1): once, driver-side,
        # BEFORE seed_hosts / the resume config-hash check — the
        # returned urls join crawl.seeds, so a deterministic hook
        # yields the same effective config (and hash) on fresh run and
        # resume. ctx.fetch is a hermetic pages lookup (one pruned
        # dataset scan per call — init touches a handful of urls like
        # a login page, a one-time setup cost; production policies
        # close over a real transport instead).
        from dataclasses import replace as _dc_replace

        from engine.policy import InitContext

        ctx = InitContext(fetch=_init_fetch_fn(pages_ds))
        extra = tuple(policy.initialize(ctx) or ())
        init_jar = ctx.cookies
        if extra and not seeded_on_disk and initial_frontier is None:
            crawl = _dc_replace(crawl, seeds=tuple(crawl.seeds) + extra)
        elif extra:
            # pre-seeded path: the caller built round-0 themselves, so
            # initialize-derived urls cannot be injected here — surface
            # the drop instead of silently losing them
            import warnings

            warnings.warn(
                f"CrawlPolicy.initialize returned {len(extra)} extra "
                "seed url(s) but the crawl is pre-seeded "
                "(seeded_on_disk/initial_frontier); they are ignored — "
                "include them in the prepared frontier instead",
                stacklevel=2,
            )
    # seed_hosts is only consulted by same_host_only policies — for a
    # 10^6+ seed list, canonicalizing every seed on the driver is a
    # multi-second serial cost, so skip it unless the policy needs it
    # (and prefer the already-canonical host column when the caller
    # provided the built frontier)
    if policy.same_host_only:
        if initial_frontier is not None:
            seed_hosts = frozenset(initial_frontier["host"].to_pylist())
        elif seeded_on_disk:
            # bounded by DISTINCT seed hosts (not seed count); a
            # same_host_only policy needs this set on every worker
            # anyway, so driver-side here is the broadcast build
            hosts: set = set()
            for p in (out / "frontier" / "round=0").glob("*.parquet"):
                hosts |= set(
                    pq.read_table(p, columns=["host"])["host"].to_pylist()
                )
            seed_hosts = frozenset(hosts)
        else:
            seed_hosts = frozenset(host_of(canonicalize_url(s)) for s in crawl.seeds)
    else:
        seed_hosts = frozenset()
    res = CrawlResult(out_dir=str(out), init_cookies=init_jar)

    if pool is None:
        pool = SeenPool(crawl.num_shards, mode=crawl.seen_mode)
    res.pool = pool  # type: ignore[attr-defined]

    manifest_path = out / "MANIFEST.json"
    if resume and manifest_path.exists():
        man = json.loads(manifest_path.read_text())
        stored = man.get("config_hash")
        if stored is not None and stored != cfg_hash:
            # a changed config silently mixes incompatible state (e.g.
            # fewer shards would reload only shards 0..n-1, dropping
            # seen keys -> re-crawls). Force an explicit fresh start.
            raise ValueError(
                f"resume config mismatch: checkpoint was written with "
                f"config_hash={stored}, current config hashes to "
                f"{cfg_hash}; resume with the original "
                f"CrawlConfig or start a fresh out_dir"
            )
        start_round = man["next_round"]
        blobs = [
            (out / "seen" / f"round={start_round}" / f"shard={s}.bin").read_bytes()
            for s in range(crawl.num_shards)
        ]
        pool.load_all(blobs)
        # discovered robots need no MANIFEST payload: the shard pool is
        # reloaded from the pages table in setup (same one-pass scan a
        # fresh start does) and each round rebuilds its frontier-host
        # subset from it — nothing host-scale lives in the JSON
        frontier_tbl = None  # read from parquet below
        f0_writer = None
        res.metrics = man.get("metrics", [])
        res.total_scheduled = man.get("total_scheduled", 0)
        res.total_fetched = man.get("total_fetched", 0)
        res.total_errors = man.get("total_errors", 0)
    elif seeded_on_disk:
        # prepare_seed_frontier already wrote round-0 parts and
        # registered their keys in `pool` — rounds read from parquet
        start_round = 0
        frontier_tbl = None
        f0_writer = None
    else:
        start_round = 0
        if initial_frontier is not None:
            # caller prepared the frontier (e.g. bench: seed ingestion
            # is one-time setup, not round throughput) — caller must
            # also have registered the keys in `pool`
            seed_tbl = initial_frontier
        elif len(crawl.seeds) > 20_000:
            seed_tbl = _seed_frontier_distributed(crawl)
            pool.check_and_add(seed_tbl["url_key"].to_pylist(), -1)
        else:
            seed_tbl = _seed_frontier(crawl)
            pool.check_and_add(seed_tbl["url_key"].to_pylist(), -1)
        fdir = out / "frontier" / "round=0"
        fdir.mkdir(parents=True, exist_ok=True)
        # checkpoint write of the seed frontier runs in a background
        # thread (the round works from the in-memory table); joined
        # before the first MANIFEST commit so the checkpoint invariant
        # (MANIFEST only after all round state is on disk) holds
        import threading

        f0_writer = threading.Thread(
            target=pq.write_table, args=(seed_tbl, fdir / "part-0.parquet")
        )
        f0_writer.start()
        frontier_tbl = seed_tbl

    if _PROFILE:
        import sys as _sys

        print(f"[prof] setup {time.monotonic() - _t_entry:.2f}s", file=_sys.stderr)
    for rnd in range(start_round, crawl.max_rounds):
        t0 = time.monotonic()
        prof = _Prof(rnd)
        fdir = out / "frontier" / f"round={rnd}"
        # consume the in-memory seed frontier exactly once (first
        # round of a fresh start) — later rounds read the checkpoint
        cur_frontier_tbl, frontier_tbl = frontier_tbl, None
        if cur_frontier_tbl is not None:
            urls_in = cur_frontier_tbl.num_rows  # file may still be writing
        else:
            urls_in = parquet_num_rows(fdir)
        if urls_in == 0:
            break
        res.rounds = rnd + 1

        # 1+2. robots gate (A14) + per-host schedule/defer split (A26).
        # Hybrid: small frontiers are scheduled driver-side with the
        # SAME semantics (cuts 2 Ray jobs + 2 materializations of
        # fixed cost per round); big frontiers use the distributed
        # threshold path (engine.frontier).
        empty_frontier = _seed_frontier(CrawlConfig(seeds=()))
        if urls_in <= schedule_cutoff_rows:
            if cur_frontier_tbl is not None:
                # first round of a fresh start: the seed frontier is
                # already in memory — skip the parquet round-trip (the
                # checkpoint file is still on disk for resume)
                ftbl = cur_frontier_tbl
            else:
                ftbl = pa.concat_tables(
                    [pq.read_table(p) for p in sorted(fdir.glob("*.parquet"))]
                )
            if robots_pool is not None:
                # per-round subset: rules for THIS round's frontier
                # hosts only — the driver never accumulates the full
                # discovered host→rules table
                robots = robots_pool.round_table(
                    pc.unique(ftbl["host"]).to_pylist(), crawl.robots_raw
                )
            sched_tbl, deferred_tbl, robots_blocked = _schedule_local(
                ftbl, robots, crawl.budget_per_host, crawl.round_time_budget_ms
            )
            gated_count = urls_in - robots_blocked
            deferred = rd.from_arrow(deferred_tbl)
            prof.mark("schedule_local")
        else:
            # fully distributed branch: the frontier AND the scheduled
            # set stay Datasets — a budget-bound round of a 10^10
            # frontier can schedule 10^8+ rows, so no
            # ray.get/concat_tables of scheduled rows on the driver.
            deferred_tbl = None
            sched_tbl = None
            if f0_writer is not None:
                f0_writer.join()  # this branch reads the parquet
                f0_writer = None
            # columns= prunes the hive partition column that
            # read_parquet infers from the "round=N" path component —
            # otherwise deferred rows carry a stray `round` column into
            # the next frontier and union schemas diverge
            frontier_ds = rd.read_parquet(str(fdir), columns=list(FRONTIER.names))
            if robots_pool is not None:
                # bounded by this round's distinct frontier hosts; the
                # broadcast ships only this subset, not the accumulated
                # all-hosts table
                robots = robots_pool.round_table(
                    frontier_ds.unique("host"), crawl.robots_raw
                )
                robots_ref = ray.put(robots)
                delays = {h: robots.crawl_delay_ms(h) for h in robots.rules}
            if robots.rules:
                gated = frontier_ds.map_batches(
                    robots_gate_fn(robots_ref), batch_format="pyarrow"
                ).materialize()
                gated_count = gated.count()  # metadata-cheap on materialized
            else:
                gated = frontier_ds
                gated_count = urls_in
            robots_blocked = urls_in - gated_count
            if gated_count > 0:
                thresholds = fr.compute_thresholds(
                    gated, crawl.budget_per_host, delays, crawl.round_time_budget_ms
                )
                thr_ref = ray.put(thresholds)

                def _mark(t: pa.Table) -> pa.Table:
                    return fr.mark_scheduled(t, cached_get(thr_ref))

                marked = gated.map_batches(_mark, batch_format="pyarrow").materialize()
                sched_ds = marked.map_batches(
                    lambda t: t.filter(t["scheduled"]).drop_columns(["scheduled"]),
                    batch_format="pyarrow",
                )
                deferred = marked.map_batches(
                    lambda t: t.filter(pc.invert(t["scheduled"])).drop_columns(["scheduled"]),
                    batch_format="pyarrow",
                )
            else:
                sched_ds = rd.from_arrow(empty_frontier)
                deferred = rd.from_arrow(empty_frontier)

        # 3. hermetic fetch (A13/A23). Round-owned output dirs are
        # cleared first: a crash mid-round leaves partial task-written
        # part files whose names a rerun (possibly at different block
        # boundaries) would not overwrite — the MANIFEST commit point
        # only advances after the whole round is on disk, so clearing
        # is always safe.
        import shutil

        fetched_dir = out / "fetched" / f"round={rnd}"
        for stale in (fetched_dir, out / "frontier" / f"round={rnd + 1}",
                      out / "trace" / f"round={rnd}",
                      out / "robots" / f"round={rnd}"):
            if stale.exists():
                shutil.rmtree(stale)
        survivors = None  # set by the single-pass fetch pipelines
        tdir = out / "trace" / f"round={rnd}"
        if sched_tbl is not None and fetch_mode == "broadcast":
            n_sched = sched_tbl.num_rows
            if n_sched > 0:
                # broadcast the scheduled (k64, url, depth, seq) table
                # as Arrow (fast IPC serialization). The per-batch
                # lookup is a FLIPPED Acero join on an INT64 key:
                # scheduled table on the probe side, the page batch
                # (one whole block, batch_size=None) on the hash-build
                # side. Joining on the sha1-derived int64 instead of
                # the url string cuts the per-task scan of the big
                # side ~5× (string hashing dominated); url equality is
                # re-verified after the join so a 64-bit collision can
                # only drop a row pair, never mis-fetch.
                sk64 = key64s_of_matrix(keys_matrix(sched_tbl["url_key"])).astype(np.int64)
                sched_small = pa.table(
                    {
                        "k64": pa.array(sk64),
                        "url": sched_tbl["url"],
                        "host": sched_tbl["host"],  # trace parts are
                        # task-written; host rides the broadcast (zero-
                        # copy plasma read) instead of a driver rebuild
                        "depth": sched_tbl["depth"],
                        "discovery_seq": sched_tbl["discovery_seq"],
                    }
                ).combine_chunks()
                meta_ref = ray.put(sched_small)

                def _fetch(t: pa.Table, _rnd=rnd) -> pa.Table:
                    sched = cached_get(meta_ref)
                    k64b = np.array(
                        [int.from_bytes(
                            hashlib.sha1(u.encode("utf-8", "surrogatepass")).digest()[:8],
                            "big") for u in t["url"].to_pylist()],
                        dtype=np.uint64,
                    ).astype(np.int64)
                    t = t.append_column("k64", pa.array(k64b))
                    j = sched.join(t, keys="k64", join_type="inner",
                                   left_suffix="_s", right_suffix="_p")
                    # url columns: sched's stays "url_s"/"url" per suffix rules
                    cols = j.column_names
                    lu = "url_s" if "url_s" in cols else "url"
                    ru = "url_p" if "url_p" in cols else "url"
                    if lu == ru:  # no collision in names (shouldn't happen)
                        eq = None
                    else:
                        eq = pc.equal(j[lu], j[ru])
                        j = j.filter(eq).drop_columns([lu])
                        j = j.rename_columns(
                            [c if c != ru else "url" for c in j.column_names]
                        )
                    j = j.drop_columns(["k64"])
                    n = j.num_rows
                    if "status" in j.column_names:
                        # pages table carries per-page statuses (3xx
                        # redirect rows etc.) — null means plain 200
                        st = pc.fill_null(pc.cast(j["status"], pa.int32()), 200)
                        j = j.set_column(
                            j.column_names.index("status"), "status", st
                        )
                    else:
                        j = j.append_column(
                            "status", pa.array(np.full(n, 200, np.int32))
                        )
                    j = j.append_column(
                        "fetch_round", pa.array(np.full(n, _rnd, np.int32))
                    )
                    return j

                # SINGLE-PASS round pipeline: the fetch task writes its
                # own fetched part file (atomic rename, deterministic
                # name -> idempotent under task retry) and RETURNS only
                # the narrow link-candidate rows, which stream straight
                # into the seen filter — no second job re-reading the
                # html/links from parquet.
                _policy, _sh = policy, seed_hosts
                _fdir = str(fetched_dir)
                _tdir = str(tdir)
                tdir.mkdir(parents=True, exist_ok=True)

                def _fetch_parse_emit(t: pa.Table, _rnd=rnd) -> pa.Table:
                    import os as _os

                    t = _fetch(t)
                    t = extract_page_batch(t)
                    full = t.select(
                        ["url", "warc_ts", "html", "text", "lang",
                         "status", "fetch_round", "depth", "discovery_seq", "links"]
                    )
                    if full.num_rows:
                        hsh = hashlib.sha1()
                        for _u in full["url"].to_pylist():
                            hsh.update(_u.encode())
                            hsh.update(b"\x00")
                        tag = hsh.hexdigest()[:16]  # all urls, not just
                        # the first — no collision between batches
                        fname = f"part-{tag}-{full.num_rows}.parquet"
                        tmp = pathlib.Path(_fdir) / (fname + ".tmp")
                        pq.write_table(full, tmp, compression="zstd")
                        _os.replace(tmp, pathlib.Path(_fdir) / fname)
                        # hit trace rows are task-written (the driver
                        # only writes the small miss rows) — removes an
                        # O(scheduled) serial build+write per round
                        trace_tbl = pa.table(
                            {
                                "round": pa.array(
                                    np.full(full.num_rows, _rnd, np.int32)
                                ),
                                "host": t["host"],
                                "url": t["url"],
                                "discovery_seq": t["discovery_seq"],
                                "status": t["status"],
                            }
                        )
                        ttmp = pathlib.Path(_tdir) / (f"trace-{tag}.parquet.tmp")
                        pq.write_table(trace_tbl, ttmp, compression="snappy")
                        _os.replace(
                            ttmp, pathlib.Path(_tdir) / f"trace-{tag}.parquet"
                        )
                    # html links / collect_links only from 200s; 3xx
                    # rows contribute exactly their location link.
                    # Fast path: all-200 batches (the common case) skip
                    # the filter — it would copy html buffers.
                    st_col = full["status"]
                    if pc.min(st_col).as_py() == 200 and pc.max(st_col).as_py() == 200:
                        ok = full
                    else:
                        ok = full.filter(pc.equal(st_col, 200))
                    links_t = _explode_links(
                        ok.select(["url", "links", "depth"])
                    )
                    for ex in (
                        _extra_links_table(ok, _policy),
                        _redirect_links_table(t) if "location" in t.column_names
                        else None,
                    ):
                        if ex is not None:
                            links_t = pa.concat_tables(
                                [links_t, ex.cast(links_t.schema)]
                            )
                    return _links_to_frontier(links_t, _policy, _sh)

                fetched_dir.mkdir(parents=True, exist_ok=True)
                prof.mark("fetch_prep")
                survivors = (
                    pages_ds.map_batches(
                        _fetch_parse_emit, batch_format="pyarrow", batch_size=None
                    )
                    .map_batches(
                        seen_filter_fn(pool.actors, pool.num_shards, rnd),
                        batch_format="pyarrow",
                    )
                    .materialize()  # narrow rows only
                )
                prof.mark("fetch_parse_write")
                # fetched count from parquet FOOTERS only (~1 ms/part);
                # the url readback + is_in anti-join runs ONLY when
                # misses exist — in the common all-hit round the whole
                # miss path is two metadata scans, not an O(fetched)
                # driver pass
                parts = list(fetched_dir.glob("*.parquet"))
                n_fetched = sum(pq.read_metadata(p).num_rows for p in parts)
                n_errors = sched_tbl.num_rows - n_fetched
                if n_errors:
                    from concurrent.futures import ThreadPoolExecutor

                    def _read_urls(p):
                        return pq.read_table(p, columns=["url"])["url"]

                    with ThreadPoolExecutor(max_workers=8) as ex:
                        hit_parts = list(ex.map(_read_urls, parts))
                    hit_arr = (
                        pa.concat_arrays(
                            [c for part in hit_parts for c in part.chunks]
                        )
                        if hit_parts else pa.array([], pa.string())
                    )
                    # 404s: scheduled urls with no page (vectorized anti)
                    hit_mask = pc.is_in(sched_tbl["url"], value_set=hit_arr)
                    miss_tbl_src = sched_tbl.filter(pc.invert(hit_mask))
                    nulls = pa.nulls(n_errors)
                    miss_tbl = pa.table(
                        {
                            "url": miss_tbl_src["url"],
                            "warc_ts": nulls.cast(pa.timestamp("us")),
                            "html": nulls.cast(pa.binary()),
                            "text": pa.array([""] * n_errors, pa.string()),
                            "lang": nulls.cast(pa.string()),
                            "status": pa.array(np.full(n_errors, 404, np.int32)),
                            "fetch_round": pa.array(np.full(n_errors, rnd, np.int32)),
                            "depth": miss_tbl_src["depth"],
                            "discovery_seq": miss_tbl_src["discovery_seq"],
                            "links": pa.array([[] for _ in range(n_errors)], LINKS_TYPE),
                        }
                    )
                    pq.write_table(miss_tbl, fetched_dir / "misses.parquet")
                    # trace: hit rows were task-written inside the
                    # fetch pipeline; only the (small) miss rows are
                    # driver-written — no O(scheduled) serial trace
                    # build per round (FIXTURES.md §4 order is applied
                    # at read by CrawlResult.trace())
                    miss_trace = pa.table(
                        {
                            "round": pa.array(np.full(n_errors, rnd, np.int32)),
                            "host": miss_tbl_src["host"],
                            "url": miss_tbl_src["url"],
                            "discovery_seq": miss_tbl_src["discovery_seq"],
                            "status": pa.array(np.full(n_errors, 404, np.int32)),
                        }
                    )
                    pq.write_table(miss_trace, tdir / "trace-misses.parquet",
                                   compression="snappy")
                prof.mark("misses_trace")
            else:
                fetched_dir.mkdir(parents=True, exist_ok=True)
                tdir.mkdir(parents=True, exist_ok=True)
                n_fetched = n_errors = 0
        else:
            # distributed single-pass join fetch (scale path): reached
            # by the >cutoff branch always (broadcast needs a driver
            # table — it is a small-frontier optimization) and by the
            # hybrid branch with fetch_mode="join". Fetched parts,
            # trace parts and counts are all task-written; link
            # candidates stream into the seen filter in the same pass.
            sched_src = (
                rd.from_arrow(sched_tbl) if sched_tbl is not None else sched_ds
            )
            if gated_count == 0 or (sched_tbl is not None and sched_tbl.num_rows == 0):
                # a fully-empty join side loses its schema in the hash
                # shuffle (ArrowInvalid on FieldRef url) — and there is
                # nothing to fetch anyway
                fetched_dir.mkdir(parents=True, exist_ok=True)
                tdir.mkdir(parents=True, exist_ok=True)
                n_sched = n_fetched = n_errors = 0
            else:
                survivors, n_sched, n_fetched, n_errors = _join_fetch_round(
                    sched_src, pages_ds, rnd, fetched_dir, tdir, policy,
                    seed_hosts, pool, max(2, crawl.num_partitions),
                )
            prof.mark("join_fetch")

        # launch the seen checkpoint NOW (§4.3): the round's seen adds
        # are final once the fetch pipeline materialized (both
        # branches run the seen filter inside that single pass), so
        # the K actor-side shard writes overlap the frontier phase
        # below; the commit point (ray.get before MANIFEST) is
        # unchanged. Was: serial driver-side serialize_all + writes
        # after the frontier write (~0.22 s/round at 800k/32).
        sdir = out / "seen" / f"round={rnd + 1}"
        sdir.mkdir(parents=True, exist_ok=True)
        seen_ckpt_refs = pool.checkpoint_all(str(sdir))

        # 4. link discovery → fresh frontier (A8,A11,A6,A10,A25,A21).
        # Order: local dedup (inside _links_to_frontier) → seen filter
        # (drops everything discovered in prior rounds) → global dedup
        # over the small survivor set. The seen filter is idempotent
        # per round, so all within-round copies of a NEW key survive
        # to the global dedup, which picks the deterministic winner.
        # Both fetch paths materialize `survivors` (narrow rows) inside
        # the single-pass fetch pipeline.
        fresh_tbl = None
        if survivors is not None:
            n_surv = survivors.count()
            if n_surv == 0:
                fresh_tbl = empty_frontier
            elif n_surv <= schedule_cutoff_rows:
                # driver-side vectorized global dedup (narrow rows)
                import pandas as pd

                parts = [t for t in ray.get(survivors.to_arrow_refs()) if t.num_rows]
                stbl = pa.concat_tables(parts)
                df = stbl.to_pandas()
                df = df.sort_values(
                    ["discovery_seq", "parent_url", "link_index"], kind="mergesort"
                ).drop_duplicates(subset=["url_key"], keep="first")
                fresh_tbl = (
                    pa.Table.from_pandas(df, preserve_index=False)
                    .cast(stbl.schema)
                    .drop_columns(["link_index", "bucket"])
                )
            else:
                deduped = survivors.groupby("bucket").map_groups(
                    _dedup_first, batch_format="pyarrow"
                )
                fresh = deduped.drop_columns(["link_index", "bucket"])

        # next frontier = deferred ∪ fresh
        if fresh_tbl is not None and deferred_tbl is not None:
            nxt_tbl = pa.concat_tables(
                [deferred_tbl,
                 fresh_tbl.select(deferred_tbl.column_names).cast(deferred_tbl.schema)]
            )
            nxt = None
        elif fresh_tbl is not None:
            nxt = deferred.union(rd.from_arrow(fresh_tbl))
            nxt_tbl = None
        elif survivors is not None:
            nxt = deferred.union(fresh)
            nxt_tbl = None
        else:
            nxt = deferred
            nxt_tbl = None
        if nxt_tbl is None and deferred_tbl is not None and survivors is None:
            # no links at all, driver-scheduled round
            nxt_tbl = deferred_tbl
            nxt = None

        nfdir = out / "frontier" / f"round={rnd + 1}"
        nfdir.mkdir(parents=True, exist_ok=True)
        if nxt_tbl is not None:
            if nxt_tbl.num_rows:
                pq.write_table(nxt_tbl, nfdir / "part-0.parquet", compression="snappy")
        else:
            nxt.write_parquet(str(nfdir))
        prof.mark("links_and_frontier_write")
        n_next = parquet_num_rows(nfdir)
        n_deferred = gated_count - n_sched
        new_links = n_next - n_deferred

        # 5. wait for the seen checkpoint launched before phase 4,
        # then lineage + MANIFEST commit (§4.3)
        ray.get(seen_ckpt_refs)
        prof.mark("seen_ckpt")
        res.total_scheduled += n_sched
        res.total_fetched += n_fetched
        res.total_errors += n_errors
        prof.mark("metrics_manifest_start")
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
        man_payload = {
            "next_round": rnd + 1,
            "config_hash": cfg_hash,
            "metrics": res.metrics,
            "total_scheduled": res.total_scheduled,
            "total_fetched": res.total_fetched,
            "total_errors": res.total_errors,
        }
        if robots_pool is not None:
            # §4.3 layout: the round's effective robots subset as
            # parquet (audit/lineage artifact; resume re-derives state
            # from the pages scan, so nothing host-scale sits in JSON)
            rdir = out / "robots" / f"round={rnd}"
            rdir.mkdir(parents=True, exist_ok=True)
            pq.write_table(robots.to_arrow(), rdir / "robots.parquet")
        if f0_writer is not None:
            f0_writer.join()  # commit point: all round state on disk first
            f0_writer = None
        manifest_path.write_text(json.dumps(man_payload, indent=1))
        prof.mark("manifest")
        if n_next == 0:
            break
    if f0_writer is not None:  # max_rounds=0 or never-entered loop
        f0_writer.join()
    if robots_pool is not None:
        # internal to this run (rebuilt from the pages scan on resume);
        # killing it here keeps repeated run_crawl calls in one Ray
        # session from accumulating actor state
        robots_pool.shutdown()
    if _PROFILE:
        import sys as _sys

        print(f"[prof] total {time.monotonic() - _t_entry:.2f}s", file=_sys.stderr)
    return res
