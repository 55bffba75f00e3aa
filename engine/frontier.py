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


def _ord_components(t: pa.Table):
    """(prio, seq, k0, k1, k2) uint64/uint32 arrays whose tuple order
    equals the 33-byte ord_key's lexicographic byte order (big-endian
    unsigned fields compare identically as ints) — the vectorized form
    of ord_keys_batch."""
    from engine.kernels import keys_matrix

    mat = keys_matrix(t["url_key"])
    k0 = np.ascontiguousarray(mat[:, :8]).view(">u8").ravel().astype(np.uint64)
    k1 = np.ascontiguousarray(mat[:, 8:16]).view(">u8").ravel().astype(np.uint64)
    k2 = np.ascontiguousarray(mat[:, 16:20]).view(">u4").ravel().astype(np.uint64)
    prio = (np.asarray(t["priority"]).astype(np.int64)
            + (1 << 31)).astype(np.uint64)
    seq = np.asarray(t["discovery_seq"]).astype(np.uint64)
    return prio, seq, k0, k1, k2


def _unpack_ord(b: bytes) -> tuple:
    """33-byte ord key -> the matching (prio, seq, k0, k1, k2) ints."""
    p, s = struct.unpack(">IQ", b[:12])
    k0 = int.from_bytes(b[12:20], "big")
    k1 = int.from_bytes(b[20:28], "big")
    k2 = int.from_bytes(b[28:32], "big")
    return p, s, k0, k1, k2


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
    ordering keys. Vectorized: one numpy lexsort + pandas cumcount per
    batch; ord bytes are packed only for the ≤B×hosts kept rows."""
    import pandas as pd

    n = t.num_rows
    if n == 0:
        return pa.table({"host": pa.array([], pa.string()),
                         "ord": pa.array([], pa.binary())})
    prio, seq, k0, k1, k2 = _ord_components(t)
    order = np.lexsort((k2, k1, k0, seq, prio))
    host_codes, _ = pd.factorize(np.asarray(t["host"]), sort=False)
    rank = (pd.Series(host_codes[order])
            .groupby(host_codes[order], sort=False).cumcount().to_numpy())
    keep = order[rank < max_budget]
    hosts_col = t["host"].take(pa.array(keep))
    # pack ord bytes for kept rows only
    kp, ks = prio[keep], seq[keep]
    kk0, kk1, kk2 = k0[keep], k1[keep], k2[keep]
    ords = [
        struct.pack(">IQ", int(p), int(s))
        + int(a).to_bytes(8, "big") + int(b).to_bytes(8, "big")
        + int(c).to_bytes(4, "big")
        for p, s, a, b, c in zip(kp, ks, kk0, kk1, kk2)
    ]
    return pa.table({"host": hosts_col,
                     "ord": pa.array(ords, pa.binary())})


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
    happen for rows present here) — treated as schedule-all.
    Vectorized: thresholds are unpacked once per DISTINCT host and the
    lexicographic compare is numpy over component arrays."""
    import pandas as pd

    n = t.num_rows
    if n == 0:
        return t.append_column("scheduled", pa.array([], pa.bool_()))
    prio, seq, k0, k1, k2 = _ord_components(t)
    host_codes, hosts_uniq = pd.factorize(np.asarray(t["host"]), sort=False)
    thr = np.empty((len(hosts_uniq), 5), dtype=np.uint64)
    for i, h in enumerate(hosts_uniq):
        thr[i] = _unpack_ord(thresholds.get(h, MAX_ORD))
    tp, ts, t0, t1, t2 = (thr[host_codes, j] for j in range(5))
    mask = (
        (prio < tp)
        | ((prio == tp) & ((seq < ts)
           | ((seq == ts) & ((k0 < t0)
              | ((k0 == t0) & ((k1 < t1)
                 | ((k1 == t1) & (k2 <= t2))))))))
    )
    return t.append_column("scheduled", pa.array(mask))
