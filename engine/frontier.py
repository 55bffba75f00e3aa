"""Per-host politeness-aware priority frontier scheduler (SURVEY.md A26, §4.2).

Semantics: within a round, each host fetches at most
    Bh = min(budget_per_host, max(1, round_time_budget_ms // crawl_delay_ms))
pages (crawl-delay politeness as pure arithmetic — the hermetic engine
has no wall clock), chosen as the Bh smallest rows by the total order
    (priority, discovery_seq, url_key).
Rows over budget are DEFERRED to the next round (politeness defers, it
never drops); robots-disallowed rows are dropped before scheduling
(engine.crawl).

Skew design (north_star "explicit skew-splitting of mega-hosts"): the
scheduler never co-locates a host's full row set. It computes, per
host, the Bh-th smallest ordering key as a THRESHOLD in two stages:

  stage 1  map_batches over the frontier: per (batch × host) keep the
           ≤B smallest 33-byte ordering keys → tiny (host, ord) rows.
           Each block acts as one "salt" of the mega-host — the
           per-block top-B is a superset guarantee for the global
           top-B, so no mega-host ever concentrates on one worker.
  stage 2  groupby(host).map_groups over those partials (≤ B × blocks
           rows per host): merge-sort, emit the threshold.

Scheduling is then an embarrassingly-parallel filter:
`ord_key(row) <= threshold[host]`, with the threshold table broadcast
via ray.put (hosts × 41 bytes — small side). The frontier's full rows
are never shuffled at all, which is strictly cheaper than the naive
host-hash groupby + sort of the whole frontier.

Determinism: ordering keys are unique (url_key is unique after A25
dedup), so thresholds and the scheduled set are exact pure functions
of the frontier contents — identical at any parallelism (§4.2).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAX_ORD = b"\xff" * 33


def effective_budget(budget_per_host: int, crawl_delay_ms: int,
                     round_time_budget_ms: int) -> int:
    if crawl_delay_ms and crawl_delay_ms > 0:
        return max(1, min(budget_per_host, round_time_budget_ms // crawl_delay_ms))
    return budget_per_host


def ord_key(priority: int, seq: int, url_key: bytes) -> bytes:
    """33-byte sortable encoding of (priority, discovery_seq, url_key);
    lexicographic byte order == tuple order. priority is offset to
    unsigned; seq is uint64; url_key is the 20-byte sha1 (priority and
    seq use 4+8 bytes, 33 total ties it to a unique url)."""
    return struct.pack(">IQ", (priority + (1 << 31)) & 0xFFFFFFFF, seq) + url_key


def ord_keys_batch(t: pa.Table) -> list[bytes]:
    pr = t["priority"].to_pylist()
    sq = t["discovery_seq"].to_pylist()
    ks = t["url_key"].to_pylist()
    return [ord_key(p, s, k) for p, s, k in zip(pr, sq, ks)]


def _partial_topb(t: pa.Table, max_budget: int) -> pa.Table:
    """Stage 1: per host within this batch, the ≤max_budget smallest
    ordering keys."""
    hosts = t["host"].to_pylist()
    ords = ord_keys_batch(t)
    per: dict[str, list[bytes]] = {}
    for h, o in zip(hosts, ords):
        per.setdefault(h, []).append(o)
    o_host: list[str] = []
    o_ord: list[bytes] = []
    for h, lst in per.items():
        lst.sort()
        for o in lst[:max_budget]:
            o_host.append(h)
            o_ord.append(o)
    return pa.table({"host": pa.array(o_host, pa.string()),
                     "ord": pa.array(o_ord, pa.binary())})


def compute_thresholds(frontier_ds, budget_per_host: int,
                       delays: dict[str, int], round_time_budget_ms: int) -> dict[str, bytes]:
    """host -> inclusive ordering-key threshold for this round.
    Hosts with ≤Bh candidate rows get MAX_ORD (schedule all)."""
    partials = frontier_ds.map_batches(
        lambda t: _partial_topb(t, budget_per_host), batch_format="pyarrow"
    )

    def merge(g: pa.Table) -> pa.Table:
        host = g["host"][0].as_py()
        bh = effective_budget(budget_per_host, delays.get(host, 0), round_time_budget_ms)
        ords = sorted(g["ord"].to_pylist())
        thr = ords[bh - 1] if len(ords) >= bh else MAX_ORD
        return pa.table({"host": pa.array([host], pa.string()),
                         "threshold": pa.array([thr], pa.binary())})

    out = partials.groupby("host").map_groups(merge, batch_format="pyarrow")
    pdf = out.to_pandas()  # small: one row per distinct host
    return dict(zip(pdf["host"].tolist(), (bytes(b) for b in pdf["threshold"].tolist())))


def mark_scheduled(t: pa.Table, thresholds: dict[str, bytes]) -> pa.Table:
    """Append bool `scheduled` column: ord_key(row) <= threshold[host].
    Hosts missing from the threshold table had no candidates (can't
    happen for rows present here) — treated as schedule-all."""
    hosts = t["host"].to_pylist()
    ords = ord_keys_batch(t)
    mask = np.fromiter(
        (o <= thresholds.get(h, MAX_ORD) for h, o in zip(hosts, ords)),
        dtype=bool, count=len(hosts),
    )
    return t.append_column("scheduled", pa.array(mask))
