"""Link-graph analytics over edge Datasets — the webtext companion to
the crawl (rank what the crawler discovered).

`pagerank` is a fixed-point integer power iteration expressed purely
as Ray Data groupbys + ONE co-partitioned bucketed join per iteration:
edges⋈ranks on src (engine.joins.equi_join_bucketed — Ray's native
Dataset.join loses block schemas on empty partitions when keys are
sparse, and the bucketed form also reuses our skew-safe routing), a
vectorized per-edge contribution, groupby(dst) sum, then the teleport
fold as a UNION with zero rows per vertex + groupby — no left-outer
join at all. All arithmetic is non-negative int64 floor-division at a
1e9 fixed-point scale, so results are bit-reproducible at any
parallelism AND SQL-mirrorable (the `pagerank_hosts` oracle in
__ray_entry__ unrolls the identical iterations as DuckDB CTEs).

Scale notes (10^10 edges / 10^9 vertices): ranks, degrees and the
vertex set are vertex-sized DATASETS — never driver-materialized,
never broadcast; the only driver scalar is the vertex count (one
aggregate). Each iteration is two all-to-alls (bucketed join on src,
groupby dst) + one vertex-sized groupby — the canonical BSP PageRank
schedule; bucket fan-out scales with cluster CPUs
(util.scaled_buckets). Dangling-node mass is dropped (the oracle
mirrors this).
"""

from __future__ import annotations

import json
import pathlib

import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Min, Sum

SCALE = 1_000_000_000


def _ckpt_commit(state_ds, ckpt_dir: str, done: int, cfg: dict):
    """Write one iteration's vertex-state Dataset as a partitioned
    parquet round (crawl §4.3 layout: parts first, MANIFEST last as
    the commit point) and return the READ-BACK dataset — which also
    truncates the lazy lineage, so a 100-iteration job's plan depth
    stays O(1) instead of O(iterations)."""
    import ray.data as rd

    out = pathlib.Path(ckpt_dir)
    rdir = out / f"round={done}"
    rdir.mkdir(parents=True, exist_ok=True)
    state_ds.write_parquet(str(rdir))
    (out / "MANIFEST.json").write_text(json.dumps({"done": done, "cfg": cfg}))
    return rd.read_parquet(str(rdir))


def _ckpt_resume(ckpt_dir: str | None, resume: bool, cfg: dict):
    """(completed_iterations, state_ds | None). A config mismatch on
    resume raises — silently mixing damping/vertex-count regimes would
    produce plausible-looking garbage."""
    import ray.data as rd

    if not (resume and ckpt_dir):
        return 0, None
    man = pathlib.Path(ckpt_dir) / "MANIFEST.json"
    if not man.exists():
        return 0, None
    m = json.loads(man.read_text())
    if m["cfg"] != cfg:
        raise ValueError(
            f"graph checkpoint config mismatch: stored {m['cfg']}, "
            f"current {cfg}; start a fresh checkpoint_dir"
        )
    done = m["done"]
    return done, rd.read_parquet(str(pathlib.Path(ckpt_dir) / f"round={done}"))


def _nodes(edges, col: str):
    # per-block unique: a node's incident edges cluster within blocks
    # (pages emit their out-links together), so the distinct shuffle
    # carries ≤|block-local nodes| rows instead of |edges|
    return edges.select_columns([col]).map_batches(
        lambda t, c=col: pa.table({"node": pc.unique(t[c])}),
        batch_format="pyarrow",
    )


def vertex_set(edges):
    """Distinct vertex Dataset (column `node`) from an edge Dataset
    (columns src, dst) — groupby-based distinct, stays distributed."""
    return (
        _nodes(edges, "src")
        .union(_nodes(edges, "dst"))
        .groupby("node")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["node"])
    )


# Hybrid cutoff (same philosophy as the crawl's schedule_cutoff_rows):
# an iterative graph job is a CHAIN of sequential all-to-alls — each
# pays the per-shuffle floor, so a 7-node oracle graph was spending
# ~30 s on ~9 shuffle floors. Below the cutoff the edge list fits a
# driver table and the SAME integer math runs vectorized in numpy
# (bit-identical, test-pinned); above it the distributed BSP schedule
# runs. 5M edge rows ≈ 80 MB — comfortably a driver table.
_SMALL_EDGE_CUTOFF = 5_000_000


def _edge_indices(edges):
    """(nodes, src_idx, dst_idx) for the driver paths: vertex ids
    compacted to positions via np.unique's inverse mapping."""
    import numpy as np

    df = edges.to_pandas()
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    return nodes, inv[: len(src)], inv[len(src):]


def _pagerank_driver(edges, n_iter: int, damping_permille: int):
    import numpy as np
    import ray.data as rd

    nodes, si, di = _edge_indices(edges)
    n = len(nodes)
    deg = np.zeros(n, np.int64)
    np.add.at(deg, si, 1)
    r0 = SCALE // n
    teleport = (1000 - damping_permille) * r0 // 1000
    r = np.full(n, r0, np.int64)
    for _ in range(n_iter):
        contrib = (r[si] * damping_permille) // (1000 * deg[si])
        acc = np.zeros(n, np.int64)
        np.add.at(acc, di, contrib)
        r = teleport + acc
    return rd.from_arrow(
        pa.table({"node": pa.array(nodes, pa.int64()),
                  "rank_fp": pa.array(r, pa.int64())})
    )


def pagerank(edges, n_iter: int = 3, damping_permille: int = 850,
             small_cutoff: int = _SMALL_EDGE_CUTOFF,
             checkpoint_dir: str | None = None, resume: bool = False):
    """Integer fixed-point PageRank over an edge Dataset (src, dst).

    Returns a Dataset (node, rank_fp) with rank_fp at SCALE=1e9
    fixed-point. r0 = SCALE // n for every vertex; each iteration:
    r'(v) = teleport + Σ_{(u,v)∈E} (r(u) * d) // (1000 * out_deg(u)),
    teleport = ((1000-d) * (SCALE // n)) // 1000. Every division is a
    non-negative int64 floor division (Arrow's truncating integer
    divide == floor for non-negatives), so any execution order gives
    identical bits. Hybrid: edge lists at or below `small_cutoff`
    rows take the vectorized driver path (identical bits, pinned by
    test_pagerank_matches_integer_reference which runs BOTH paths);
    pass small_cutoff=0 to force the distributed schedule.

    checkpoint_dir (distributed branch only): each iteration's ranks
    are committed as checkpoint_dir/round=k parquet + MANIFEST (a
    10^10-edge job is hours of sequential shuffles; a kill costs at
    most one iteration). resume=True re-enters at MANIFEST.done with
    bit-identical results (integer math, test-pinned); the loop
    invariants (degree join, vertex set) are recomputed — bounded,
    one-time. Config mismatches on resume raise.
    """
    from engine.joins import equi_join_bucketed

    edges = edges.materialize()
    if edges.count() <= small_cutoff:
        return _pagerank_driver(edges, n_iter, damping_permille)

    def _deg_part(t: pa.Table) -> pa.Table:
        # per-block combiner: a page's out-edges sit in one block, so
        # ≤|block-local srcs| partial rows enter the degree shuffle
        g = (
            pa.table({"src": t["src"],
                      "one": pa.nulls(t.num_rows, pa.int64()).fill_null(1)})
            .group_by("src").aggregate([("one", "sum")])
        )
        return pa.table({"src": g["src"], "deg": g["one_sum"]})

    deg = (
        edges.map_batches(_deg_part, batch_format="pyarrow")
        .groupby("src").aggregate(Sum("deg", alias_name="deg"))
    )
    # Loop-invariant datasets are MATERIALIZED once (the cached-
    # adjacency move of every BSP PageRank): every per-iteration
    # reference to a lazy edges_deg would re-embed the degree join —
    # an all-to-all — into the lineage, so n_iter iterations would
    # execute n_iter degree joins and n_iter vertex groupbys instead
    # of one each. The pins are bounded (adjacency = |E| rows, verts =
    # |V| rows) and the object store spills them if needed.
    edges_deg = equi_join_bucketed(edges, deg, on="src").materialize()
    verts = vertex_set(edges).materialize()
    n = verts.count()
    r0 = SCALE // n
    teleport = (1000 - damping_permille) * r0 // 1000

    def zero_c(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"], "c": pa.array([0] * len(t), pa.int64())}
        )

    def contrib(t: pa.Table) -> pa.Table:
        c = pc.divide(
            pc.multiply(t["rank_fp"], pa.scalar(damping_permille, pa.int64())),
            pc.multiply(pa.scalar(1000, pa.int64()), pc.cast(t["deg"], pa.int64())),
        )
        return pa.table({"node": t["dst"], "c": c})

    def fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"],
                "rank_fp": pc.add(
                    pa.scalar(teleport, pa.int64()), pc.cast(t["c"], pa.int64())
                ),
            }
        )

    cfg = {"kind": "pagerank", "damping": damping_permille, "n": n}
    done, ck_ranks = _ckpt_resume(checkpoint_dir, resume, cfg)

    zeros = verts.map_batches(zero_c, batch_format="pyarrow")
    if ck_ranks is not None:
        ranks = ck_ranks
    else:
        done = 0
        ranks = verts.map_batches(
            lambda t: t.append_column("rank_fp", pa.array([r0] * len(t), pa.int64())),
            batch_format="pyarrow",
        )
    for k in range(done, n_iter):
        sums = equi_join_bucketed(
            edges_deg, ranks, on="src", right_on="node"
        ).map_batches(contrib, batch_format="pyarrow")
        # teleport fold: union vertex-zero rows so no-in-edge vertices
        # survive, ONE groupby — no left-outer join
        ranks = (
            sums.union(zeros)
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"))
            .map_batches(fold, batch_format="pyarrow")
        )
        if checkpoint_dir:
            ranks = _ckpt_commit(ranks, checkpoint_dir, k + 1, cfg)
    return ranks


def _components_driver(edges, n_iter: int):
    import numpy as np
    import ray.data as rd

    nodes, si, di = _edge_indices(edges)
    # undirected closure: messages flow both ways each round
    usi = np.concatenate([si, di])
    udi = np.concatenate([di, si])
    l = np.arange(len(nodes), dtype=np.int64)
    for _ in range(n_iter):
        nl = l.copy()
        np.minimum.at(nl, udi, l[usi])
        l = nl
    return rd.from_arrow(
        pa.table({"node": pa.array(nodes, pa.int64()),
                  "component": pa.array(nodes[l], pa.int64())})
    )


def connected_components(edges, n_iter: int = 4,
                         small_cutoff: int = _SMALL_EDGE_CUTOFF,
                         checkpoint_dir: str | None = None,
                         resume: bool = False):
    """Min-label propagation over the undirected closure of an edge
    Dataset (src, dst): every vertex starts labeled with its own id;
    each round every vertex takes the min of its own label and its
    neighbors' labels (one bucketed join src→label + one groupby-min
    over own∪received rows). A FIXED number of rounds keeps the result
    deterministic and SQL-unrollable (the `graph_components` oracle
    mirrors each round as a CTE); iterated to the graph diameter the
    labels are exactly the connected components (test-proven vs
    union-find). Returns (node, component).

    Scale: per round, one edge-sized all-to-all (the bucketed join)
    and one (V+E)-sized groupby — the BSP label-propagation schedule;
    labels never leave the cluster. The undirected closure is part of
    the lazy lineage, so each round re-derives it from the edge
    source rather than pinning a 2|E| copy in the object store.
    CRITICAL lineage shape: the round-k labels Dataset is consumed
    exactly ONCE (as the join's right side) — the single join pass
    emits BOTH the neighbor message (dst, l) and the self row (src,
    l), which is sufficient because every vertex of an edge-derived
    graph appears as src in the undirected closure. Consuming labels
    twice (join + a labels∪msgs union) would DOUBLE the lazy lineage
    every round — 2^n_iter re-execution.

    Hybrid: small edge lists take the vectorized driver path
    (identical labels, pinned by test_connected_components_match_
    union_find which runs BOTH paths); small_cutoff=0 forces the
    distributed schedule.

    checkpoint_dir/resume (distributed branch only): per-round label
    commits + MANIFEST, same layout and semantics as pagerank's."""
    from engine.joins import equi_join_bucketed

    edges = edges.materialize()
    if edges.count() <= small_cutoff:
        return _components_driver(edges, n_iter)

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["dst"], "dst": t["src"]})

    und = edges.union(edges.map_batches(rev, batch_format="pyarrow"))

    def self_label(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "l": t["node"]})

    def msgs_and_self(t: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"node": t["dst"], "l": t["l"]}),
                pa.table({"node": t["src"], "l": t["l"]}),
            ]
        )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "component": t["l"]})

    cfg = {"kind": "components", "n_iter_cap": None}
    done, ck_labels = _ckpt_resume(checkpoint_dir, resume, cfg)
    if ck_labels is not None:
        labels = ck_labels
    else:
        done = 0
        labels = vertex_set(edges).map_batches(
            self_label, batch_format="pyarrow"
        )
    for k in range(done, n_iter):
        labels = (
            equi_join_bucketed(und, labels, on="src", right_on="node")
            .map_batches(msgs_and_self, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("l", alias_name="l"))
        )
        if checkpoint_dir:
            labels = _ckpt_commit(labels, checkpoint_dir, k + 1, cfg)
    return labels.map_batches(rename, batch_format="pyarrow")


def degree_stats(edges):
    """Per-node out/in degree in ONE groupby, no joins: each edge
    contributes an (src, 1, 0) and a (dst, 0, 1) indicator row, summed
    per node — dst-only nodes get out_deg 0 and vice versa."""

    def indicators(t: pa.Table) -> pa.Table:
        n = t.num_rows
        one = pa.array([1] * n, pa.int64())
        zero = pa.array([0] * n, pa.int64())
        out_rows = pa.table({"node": t["src"], "o": one, "i": zero})
        in_rows = pa.table({"node": t["dst"], "o": zero, "i": one})
        # per-block combiner: ≤|block-local nodes| partials shuffle
        g = (
            pa.concat_tables([out_rows, in_rows])
            .group_by("node").aggregate([("o", "sum"), ("i", "sum")])
        )
        return pa.table({"node": g["node"], "o": g["o_sum"], "i": g["i_sum"]})

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"], "out_deg": t["o"], "in_deg": t["i"]}
        )

    return (
        edges.map_batches(indicators, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("o", alias_name="o"), Sum("i", alias_name="i"))
        .map_batches(rename, batch_format="pyarrow")
    )
