"""Generic relational/dataflow operators B1-B18 (SURVEY.md §2B).

Each op is a thin composition over Ray Data primitives; each has a
`queries()` entry in __ray_entry__.py and (where SQL-expressible) a
matching `oracle_sql()` the driver checks via DuckDB at sf0.01.
Column names of computed/aggregate outputs are chosen to match the
oracle SQL exactly (driver hashes values under sorted column names).

Scale notes (per-op "Shuffle?" from SURVEY.md §2B):
  - predicates/projections are pyarrow.compute inside map_batches over
    zero-copy Arrow batches; columns are pruned at read_parquet;
  - groupby/sort/join ops shuffle — group keys are low-cardinality
    here, and sums are pre-aggregated per batch where it matters;
  - broadcast joins ray.put the small side once (B5);
  - semi/anti joins broadcast the key set when small; the big-side
    scale path is engine.joins.semi_anti_bucketed (mode="bucketed").
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from engine.util import cached_get, cluster_cpus, read_parquet_clean
from engine.kernels import canonicalize_url


def _join_partitions(n_rows_est: int | None = None,
                     target_rows: int = 100_000) -> int:
    """Partition count for Ray's native hash joins. Two regimes,
    measured at sf0.1 idle (8→3.0 s, 16→4.1 s, 32→6.5 s — fixed
    per-partition Acero setup dominates small joins): with a row
    estimate (parquet metadata, free), partitions grow with DATA
    (one per target_rows) up to a 2×-CPUs cap so a 10^10-row join on
    a big cluster fans out while a 150k-row sandbox join stays at the
    fast floor of 8; without an estimate, fall back to the pure
    CPU rule (cpus//2, floor 8) — never the frozen 8 that would
    serialize the shuffle at 100× the cluster."""
    cpus = cluster_cpus()
    if n_rows_est:
        return max(8, min(cpus * 2, n_rows_est // target_rows))
    return max(8, cpus // 2)


def _t(sf_dir: str, name: str, columns=None):
    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


# --------------------------------------------------------------- B1
def filter_project(sf_dir: str):
    """σ+π: lineitem in a shipdate range, few columns. No shuffle."""
    from datetime import datetime

    lo = datetime(1995, 1, 1)
    hi = datetime(1996, 1, 1)

    def f(t: pa.Table) -> pa.Table:
        col = t["l_shipdate"]
        m = pc.and_(
            pc.greater_equal(col, pa.scalar(lo, type=pa.timestamp("us"))),
            pc.less(col, pa.scalar(hi, type=pa.timestamp("us"))),
        )
        return t.filter(m)

    return _t(sf_dir, "lineitem",
              ["l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate"]).map_batches(
        f, batch_format="pyarrow"
    )


def _cents(col, scale: float) -> pa.Array:
    """Exact fixed-point: round(col*scale) as int64. Both sides (ray +
    DuckDB oracle) compute this from the SAME input double, so the
    int64 is bit-identical; summing ints is exact, so derived doubles
    match exactly — no float-summation-order hazard (plain rounding is
    not enough: pc.round and DuckDB ROUND can differ by 1 ulp)."""
    return pc.cast(
        pc.round(pc.multiply(col, scale), round_mode="half_towards_infinity"),
        pa.int64(),
    )


# --------------------------------------------------------------- B2
def agg_global(sf_dir: str):
    """Global aggregates over lineitem — exact fixed-point sums
    (partial+final built-in)."""
    ds = _t(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def pre(t: pa.Table) -> pa.Table:
        # per-block COMBINER: one partial row per block, so the Ray
        # Aggregate operator reduces #blocks rows, not #input rows
        # (its per-block sort-combine costs ~170 ms per 9k-row block;
        # pyarrow sums here cost ~1 ms — measured via stats_audit)
        return pa.table(
            {
                "qty_c": pa.array(
                    [pc.sum(_cents(t["l_quantity"], 100.0)).as_py() or 0],
                    pa.int64()),
                "price_c": pa.array(
                    [pc.sum(_cents(t["l_extendedprice"], 100.0)).as_py() or 0],
                    pa.int64()),
                "n_part": pa.array([t.num_rows], pa.int64()),
            }
        )

    out = ds.map_batches(pre, batch_format="pyarrow").aggregate(
        Sum("qty_c", alias_name="qty_c"),
        Sum("price_c", alias_name="price_c"),
        Sum("n_part", alias_name="n"),
    )
    n = out["n"]
    return pa.table(
        {
            "sum_qty": pa.array([out["qty_c"] / 100.0], pa.float64()),
            "avg_price": pa.array([out["price_c"] / 100.0 / n], pa.float64()),
            "n": pa.array([n], pa.int64()),
        }
    )


# --------------------------------------------------------------- B3
def groupby_agg(sf_dir: str):
    """TPC-H Q1 shape: per (l_returnflag, l_linestatus) sums/avgs/count."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount"])

    def pre(t: pa.Table) -> pa.Table:
        # exact fixed-point (see _cents): qty/price in "cents",
        # disc_price = price_c * (10000 - disc_bp) at scale 1e6 —
        # then a per-block COMBINER (arrow group_by): ≤|groups| rows
        # leave each block, so the Ray Aggregate reduces
        # blocks×groups partials instead of every input row (its
        # per-block combine measured ~170 ms per 9k-row block)
        qty_c = _cents(t["l_quantity"], 100.0)
        price_c = _cents(t["l_extendedprice"], 100.0)
        disc_bp = _cents(t["l_discount"], 10000.0)
        disc_m = pc.multiply(price_c, pc.subtract(pa.scalar(10000, pa.int64()), disc_bp))
        part = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": qty_c,
                "price_c": price_c,
                "disc_m": disc_m,
            }
        ).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("disc_m", "sum"),
             ("qty_c", "count")]
        )
        return pa.table(
            {
                "l_returnflag": part["l_returnflag"],
                "l_linestatus": part["l_linestatus"],
                "qty_c": part["qty_c_sum"],
                "price_c": part["price_c_sum"],
                "disc_m": part["disc_m_sum"],
                "n_part": pc.cast(part["qty_c_count"], pa.int64()),
            }
        )

    def post(t: pa.Table) -> pa.Table:
        n = pc.cast(t["count_order"], pa.float64())
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": pc.divide(pc.cast(t["qty_c"], pa.float64()), 100.0),
                "sum_base_price": pc.divide(pc.cast(t["price_c"], pa.float64()), 100.0),
                "sum_disc_price": pc.divide(pc.cast(t["disc_m"], pa.float64()), 1000000.0),
                "avg_qty": pc.divide(
                    pc.divide(pc.cast(t["qty_c"], pa.float64()), 100.0), n
                ),
                "count_order": t["count_order"],
            }
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="qty_c"),
            Sum("price_c", alias_name="price_c"),
            Sum("disc_m", alias_name="disc_m"),
            Sum("n_part", alias_name="count_order"),
        )
        .sort(["l_returnflag", "l_linestatus"])
        .map_batches(post, batch_format="pyarrow")
    )


# --------------------------------------------------------------- B4
def join_hash(sf_dir: str):
    """orders ⋈ customer on custkey (hash-partitioned shuffle join)."""
    from engine.util import parquet_num_rows

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    np_ = _join_partitions(parquet_num_rows(f"{sf_dir}/orders.parquet"))
    return orders.join(
        cust, "inner", num_partitions=np_,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "o_custkey", "o_totalprice", "c_name", "c_mktsegment"])


# --------------------------------------------------------------- B5
def join_broadcast(sf_dir: str):
    """nation ⋈ region: tiny dim side broadcast via ray.put, lookup in
    map_batches — no shuffle."""
    import ray

    region = _t(sf_dir, "region").to_pandas()
    ref = ray.put(dict(zip(region["r_regionkey"], region["r_name"])))

    def attach(t: pa.Table) -> pa.Table:
        m = cached_get(ref)
        names = [m.get(k) for k in t["n_regionkey"].to_pylist()]
        return t.append_column("r_name", pa.array(names, pa.string()))

    return _t(sf_dir, "nation").map_batches(attach, batch_format="pyarrow")


# --------------------------------------------------------------- B6
def join_semi(sf_dir: str, mode: str = "broadcast"):
    """customers WITH a big (>350k) order — semi join. mode="broadcast"
    ships the key set via ray.put (right when the distinct key set fits
    in a worker heap); mode="bucketed" is the engine.joins co-partition
    that holds when it doesn't (10^9+ distinct keys)."""
    return _semi_anti(sf_dir, keep_present=True, mode=mode)


def join_anti(sf_dir: str, mode: str = "broadcast"):
    """customers WITHOUT a big (>350k) order — anti join (same two
    modes as join_semi; scale path = engine.joins.semi_anti_bucketed)."""
    return _semi_anti(sf_dir, keep_present=False, mode=mode)


def _semi_anti(sf_dir: str, keep_present: bool, mode: str = "broadcast"):
    import ray

    big = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 350000.0)),
        batch_format="pyarrow",
    )
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    if mode == "bucketed":
        from engine.joins import semi_anti_bucketed

        return semi_anti_bucketed(
            cust, big.select_columns(["o_custkey"]),
            on="c_custkey", right_on="o_custkey", keep_present=keep_present,
        )
    keys_arr = pa.array(sorted(big.unique("o_custkey")), pa.int64())
    ref = ray.put(keys_arr)

    def f(t: pa.Table) -> pa.Table:
        inset = pc.is_in(t["c_custkey"], value_set=cached_get(ref))
        return t.filter(inset if keep_present else pc.invert(inset))

    return cust.map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------------- B7
def topk(sf_dir: str, k: int = 10):
    """Top-k orders by totalprice: per-block local top-k pre-pass, then
    global sort+limit over ≤ k×blocks rows (scalable form of B7)."""
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def local_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")]
        )
        return t.take(idx[:k])

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


# --------------------------------------------------------------- B8
def sort_orders(sf_dir: str):
    """orders by (o_orderdate, o_orderkey) — range-partitioned sample sort."""
    return _t(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"]).sort(
        ["o_orderdate", "o_orderkey"]
    )


# --------------------------------------------------------------- B9
def distinct(sf_dir: str):
    """distinct c_mktsegment."""
    vals = sorted(_t(sf_dir, "customer", ["c_mktsegment"]).unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, pa.string())})


# --------------------------------------------------------------- B10
def dedup_exact(sf_dir: str):
    """One row per duplicate `text` in documents: min doc_id per
    sha1(text) — hash-partition + per-group first (same kernel as the
    crawl's A25). Pre-aggregates min(doc_id) per key per batch."""
    import hashlib

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        # md5 (not sha1) so the DuckDB oracle can reproduce the key
        h = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "text_md5": pa.array(h, pa.string())})

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["text_md5", "doc_id"])
    )


# --------------------------------------------------------------- B11
def union_all(sf_dir: str):
    """union of two filtered customer subsets (overlap preserved)."""
    c = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])
    a = c.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")),
        batch_format="pyarrow",
    )
    b = c.map_batches(
        lambda t: t.filter(pc.greater(t["c_acctbal"], 0.0)), batch_format="pyarrow"
    )
    return a.union(b)


# --------------------------------------------------------------- B12
def sample(sf_dir: str, hex_digits: int = 4):
    """Deterministic hash sample of lineitem (~25%): keep rows whose
    md5('<l_orderkey>-<l_linenumber>') first hex digit < hex_digits.
    At 100 TB this is the right sampling primitive — reproducible,
    retry-safe and resumable (membership is a pure row function, not a
    function of row order / RNG stream like Dataset.random_sample),
    and exactly SQL-mirrored (DuckDB md5 == hashlib md5). A seeded
    Bernoulli variant remains available via Dataset.random_sample."""
    import hashlib

    allowed = frozenset("0123456789abcdef"[:hex_digits])

    def f(t: pa.Table) -> pa.Table:
        ok = [
            hashlib.md5(f"{a}-{b}".encode()).hexdigest()[0] in allowed
            for a, b in zip(t["l_orderkey"].to_pylist(), t["l_linenumber"].to_pylist())
        ]
        return t.filter(pa.array(ok, pa.bool_()))

    return _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"]).map_batches(
        f, batch_format="pyarrow"
    )


# --------------------------------------------------------------- B13
def json_extract(sf_dir: str):
    """parse events.props JSON, extract k, aggregate per k."""
    ds = _t(sf_dir, "events", ["props"])

    def parse(t: pa.Table) -> pa.Table:
        ks = []
        for s in t["props"].to_pylist():
            try:
                ks.append(int(json.loads(s)["k"]))
            except Exception:
                ks.append(None)
        # per-block combiner: ≤|distinct k| partial rows leave the
        # block (incl. a null-k row — arrow group_by keeps null keys,
        # matching the former Ray Count-over-groupby semantics)
        g = (
            pa.table({"k": pa.array(ks, pa.int64()),
                      "one": pa.array([1] * len(ks), pa.int64())})
            .group_by("k")
            .aggregate([("one", "sum")])
        )
        return pa.table({"k": g["k"], "n": g["one_sum"]})

    return (
        ds.map_batches(parse, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
        .sort("k")
    )


# --------------------------------------------------------------- B14
def date_math(sf_dir: str):
    """events.ts truncated to hour, count + sum(value) per hour
    (tumbling-window equivalent — batch groupby on truncated time)."""
    ds = _t(sf_dir, "events", ["ts", "value"])

    def trunc(t: pa.Table) -> pa.Table:
        # value at exact 1e-6 fixed point (see _cents) so the sum is
        # order-independent and oracle-exact; combined per block so
        # the shuffle carries ≤|hours| partials per block
        g = (
            pa.table(
                {"hour": pc.floor_temporal(t["ts"], unit="hour"),
                 "value_u": _cents(t["value"], 1000000.0),
                 "one": pa.array(np.ones(t.num_rows, np.int64))}
            )
            .group_by("hour")
            .aggregate([("value_u", "sum"), ("one", "sum")])  # COUNT(*)
        )
        return pa.table(
            {"hour": g["hour"], "value_u": g["value_u_sum"],
             "n": g["one_sum"]}
        )

    def post(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": t["hour"],
                "n": t["n"],
                "sum_value": pc.divide(pc.cast(t["value_u"], pa.float64()), 1000000.0),
            }
        )

    return (
        ds.map_batches(trunc, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("n", alias_name="n"), Sum("value_u", alias_name="value_u"))
        .sort("hour")
        .map_batches(post, batch_format="pyarrow")
    )


# --------------------------------------------------------------- B15
def string_fns(sf_dir: str):
    """lower/contains/length over part names (pyarrow.compute kernels)."""
    ds = _t(sf_dir, "part", ["p_partkey", "p_name", "p_type"])

    def f(t: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(t["p_name"])
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "name_lower": lower,
                "name_len": pc.cast(pc.utf8_length(t["p_name"]), pa.int64()),
                "has_steel": pc.match_substring(lower, "steel"),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------------- B16
def url_canonicalize(sf_dir: str):
    """A6 exposed generically: canonicalize urls minted from documents
    (case-folding, default-port strip, dot-segment removal, fragment
    drop). Oracle-checked as a GOLDEN: the SQL constructs the expected
    canonical form for these known inputs directly, plus a sha256 url
    key (DuckDB has no sha1 — the crawl's real A7 key stays sha1,
    unit-tested; this query's key column exists to oracle-check the
    keying step end-to-end)."""
    import hashlib

    ds = _t(sf_dir, "documents", ["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        raw = [
            f"HTTPS://Host-{i % 7}.Example:443/docs/{i}/../{i}?x={i}#frag" for i in ids
        ]
        canon = [canonicalize_url(u) for u in raw]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": pa.array(canon, pa.string()),
                "url_sha256": pa.array(
                    [hashlib.sha256(u.encode()).hexdigest() for u in canon],
                    pa.string(),
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------------- B17
def asof_latest(sf_dir: str, cutoff: str = "2024-01-15 00:00:00"):
    """latest event per user with ts <= cutoff (as-of / CDX-lookup
    kernel, same shape as A24)."""
    cut = np.datetime64(cutoff.replace(" ", "T"), "us")
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def pre(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t["ts"], pa.scalar(cut, pa.timestamp("us"))))

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        return g.tail(1)

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(latest, batch_format="pandas")
        .select_columns(["user_id", "event_id", "ts", "value"])
    )


# --------------------------------------------------------------- B18
def cosine_fixed6_topk_batch(t: pa.Table, k: int) -> pa.Table:
    """Shared B18 scoring kernel (used by vector_topk AND the
    full-probe indexed ANN entry, so both are bit-identical to the
    same SQL oracle): float64 end-to-end + fixed-point round to 6 dp
    so the DuckDB oracle (list_cosine_similarity on the same float32
    inputs upcast to double) lands on the bit-identical rounded
    double; ranking uses the ROUNDED value on both sides (ties broken
    by vec_id) so the top-k sets agree exactly."""
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    probe = np.arange(mat.shape[1], dtype=np.float64)
    denom = np.linalg.norm(mat, axis=1) * np.linalg.norm(probe)
    denom[denom == 0] = 1.0
    cos = (mat @ probe) / denom
    cos_r = pc.divide(
        pc.cast(
            pc.round(pc.multiply(pa.array(cos), 1e6),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        ).cast(pa.float64()),
        1e6,
    )
    t2 = pa.table({"vec_id": t["vec_id"], "cosine": cos_r})
    idx = pc.sort_indices(
        t2, sort_keys=[("cosine", "descending"), ("vec_id", "ascending")]
    )
    return t2.take(idx[:k])


def vector_topk(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k of embeddings against a fixed probe
    vector: numpy matmul per batch (broadcast probe), local top-k, then
    tiny global sort+limit. The IVF/LSH scale path is
    engine.textops.ann_ivf_topk."""
    ds = _t(sf_dir, "embeddings", ["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        return cosine_fixed6_topk_batch(t, k)

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["cosine", "vec_id"], descending=[True, False])
        .limit(k)
    )


def knn_join(sf_dir: str, n_queries: int = 5, k: int = 5):
    """k-NN similarity JOIN: the top-k cosine neighbors for EACH of a
    set of query vectors (the multi-probe generalization of
    vector_topk — the building block of embedding retrieval and
    near-dup candidate mining). The query side is the first n_queries
    corpus vectors (deterministic, so the DuckDB oracle reproduces it
    as a self-join); output one row per (query_id, neighbor), self
    matches included.

    Scale shape: the query matrix is the SMALL side — read once
    driver-side (row-group-pruned predicate read), broadcast via
    ray.put (Q x d floats); scoring is a stateless map_batches doing Q
    vectorized matvecs per block with a per-(block, query) local
    top-k, so only Q*k candidate rows per block reach the final
    Q-sized groupby reduce — the corpus is never shuffled and its
    embeddings never leave their blocks. Bit-exactness: the same
    float64 + 6-dp fixed-point rounding contract as
    cosine_fixed6_topk_batch, applied per query vector; final ranking
    uses the rounded value on both sides, ties broken by vec_id."""
    import pyarrow.parquet as pq
    import ray

    from engine.util import cached_get

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    qt = qt.take(pc.sort_indices(qt["vec_id"]))
    q_ref = ray.put(
        (qt["vec_id"].to_pylist(),
         np.asarray(qt["embedding"].to_pylist(), dtype=np.float64))
    )

    def score(t: pa.Table) -> pa.Table:
        q_ids, qmat = cached_get(q_ref)
        out_schema = pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()),
             ("cosine", pa.float64())]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        outs = []
        for qid, qv in zip(q_ids, qmat):
            denom = norms * np.linalg.norm(qv)
            denom[denom == 0] = 1.0
            cos = (mat @ qv) / denom
            cos_r = pc.divide(
                pc.cast(
                    pc.round(pc.multiply(pa.array(cos), 1e6),
                             round_mode="half_towards_infinity"),
                    pa.int64(),
                ).cast(pa.float64()),
                1e6,
            )
            t2 = pa.table(
                {
                    "query_id": pa.array(
                        np.full(t.num_rows, qid, dtype=np.int64)),
                    "vec_id": t["vec_id"],
                    "cosine": cos_r,
                }
            )
            idx = pc.sort_indices(
                t2,
                sort_keys=[("cosine", "descending"), ("vec_id", "ascending")],
            )
            outs.append(t2.take(idx[:k]))
        return pa.concat_tables(outs)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cosine", "vec_id"], ascending=[False, True], kind="mergesort")
        return g.head(k)

    return (
        _t(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final, batch_format="pandas")
        .select_columns(["query_id", "vec_id", "cosine"])
    )


# --------------------------------------------------------------- A27
def topk_groups(sf_dir: str, k: int = 5):
    """Top-k groups by count (the crawl's biggest-hosts / skew-stats
    shape, SURVEY.md A27) over documents.source — per-block arrow
    combiner, then a |sources|-cardinality groupby-sum."""

    def pre(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"source": t["source"],
                      "one": pa.array(np.ones(t.num_rows, np.int64))})
            .group_by("source")
            .aggregate([("one", "sum")])
        )
        return pa.table({"source": g["source"], "n": g["one_sum"]})

    return (
        _t(sf_dir, "documents", ["source"])
        .map_batches(pre, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "source"], descending=[True, False])
        .limit(k)
    )


# ------------------------------------------------------- sessionize
def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Gap-based session windows over the events log (the
    stream-shaped custom operator: partition by key, order by time,
    break a session when the gap exceeds `gap_minutes`). Batch
    re-expression of a streaming session window — no watermarks, the
    log is complete (SURVEY.md B14 note; ray_guide 'streaming-shaped
    workloads'). Output: one row per (user_id, session_id) with event
    count and exact start/end timestamps — all integer/timestamp
    values, so the DuckDB oracle matches bit-exactly."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        new_session = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_session[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new_session)
        g = g.assign(session_id=sid)
        out = g.groupby("session_id", sort=True).agg(
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        ).reset_index()
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    return (
        _t(sf_dir, "events", ["event_id", "ts", "user_id"])
        .groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .select_columns(["user_id", "session_id", "n_events",
                         "session_start", "session_end"])
    )


# ----------------------------------------------------- window_rank
def window_rank(sf_dir: str, k: int = 3):
    """Windowed rank / grouped top-N (the window-function custom
    operator a batch engine re-expresses as a partitioned sort): top-k
    orders per customer by (o_totalprice DESC, o_orderkey), with the
    rank attached. Keys are COARSE-bucketed (util.scaled_buckets, not
    one map_groups group per customer — per-group overhead on millions
    of tiny groups is the known trap) and ranked vectorized inside
    each bucket (sort + cumcount, no per-key Python)."""
    from engine.joins import _mix64
    from engine.util import scaled_buckets

    nb = scaled_buckets(512)
    ds = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def tag(t: pa.Table) -> pa.Table:
        x = t["o_custkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        b = _mix64(x.view(np.uint64)) % np.uint64(nb)
        return t.append_column("bucket", pa.array(b.astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="mergesort",
        )
        rn = g.groupby("o_custkey", sort=False).cumcount() + 1
        g = g.assign(rn=rn.astype("int64"))
        return g.loc[g["rn"] <= k, ["o_custkey", "o_orderkey", "o_totalprice", "rn"]]

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["o_custkey", "o_orderkey", "o_totalprice", "rn"])
    )


# --------------------------------------------------------- asof_join
def asof_join(sf_dir: str):
    """Two-table AS-OF join (the driver-instruction custom operator —
    asof_latest/B17 is the one-table per-key-latest variant): each
    order matched to its FIRST lineitem shipped at/after the order
    date (forward as-of on l_orderkey; ties on shipdate broken by
    l_linenumber, fully deterministic). Distributed form:
    engine.joins.asof_join_bucketed — both sides co-partitioned on
    mix64(key) buckets, vectorized merge_asof per bucket, one
    all-to-all, nothing on the driver."""
    from engine.joins import asof_join_bucketed

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    items = _t(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_shipdate"])
    return asof_join_bucketed(
        orders, items, on_left="o_orderkey", on_right="l_orderkey",
        ts_left="o_orderdate", ts_right="l_shipdate",
        tiebreak="l_linenumber", direction="forward",
    )


# --------------------------------------------------------- join_range
def join_range(sf_dir: str, window_min: int = 10,
               _force_user_fallback: bool = False):
    """Temporal RANGE (band) join — the key + interval non-equi join
    class (as-of's sibling): for each event, the number of same-user
    events with ts in (ts, ts + window_min minutes]. Output is one
    row per LEFT event (bounded), never the exploded pair set.

    Distributed shape: no pairwise join materializes. Rows are
    coarse-bucketed on mix64(user_id) (all rows of a key share a
    bucket — util.scaled_buckets fan-out), and inside each bucket ONE
    dual vectorized searchsorted over a (user-ordinal, relative-ts)
    composite int64 key counts every row's band matches at once —
    O(n log n) per bucket, no per-user Python loop (a guarded
    per-user fallback covers the composite-key overflow regime:
    users-per-bucket × time-span exceeding int64, unreachable at
    sandbox scale and pushed out linearly by the CPU-scaled bucket
    count). One all-to-all; strict lower bound (b.ts > a.ts) matches
    the SQL exactly under duplicate timestamps."""
    from engine.joins import _mix64
    from engine.util import scaled_buckets

    nb = scaled_buckets(512)
    win_us = np.int64(window_min * 60 * 1_000_000)

    def tag(t: pa.Table) -> pa.Table:
        x = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False)
        b = _mix64(x.astype(np.int64).view(np.uint64)) % np.uint64(nb)
        return t.append_column("bucket", pa.array(b.astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        ts = g["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        uid = g["user_id"].to_numpy()
        n_rows = len(g)
        new_u = np.ones(n_rows, bool)
        if n_rows > 1:
            new_u[1:] = uid[1:] != uid[:-1]
        ordn = (np.cumsum(new_u) - 1).astype(np.int64)
        rel = ts - (ts.min() if n_rows else 0)
        big = np.int64((rel.max() if n_rows else 0) + win_us + 2)
        if (n_rows and not _force_user_fallback
                and ordn[-1] + 1 <= np.iinfo(np.int64).max // max(big, 1)):
            comp = ordn * big + rel
            lo = np.searchsorted(comp, comp, side="right")
            hi = np.searchsorted(comp, comp + win_us, side="right")
            n_next = hi - lo
        else:  # composite overflow: per-user segments, still searchsorted
            n_next = np.zeros(n_rows, np.int64)
            starts = np.flatnonzero(new_u).tolist() + [n_rows]
            for s, e in zip(starts[:-1], starts[1:]):
                seg = rel[s:e]
                n_next[s:e] = (
                    np.searchsorted(seg, seg + win_us, side="right")
                    - np.searchsorted(seg, seg, side="right")
                )
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": pa.array(g["event_id"].to_numpy(), pa.int64()),
                "ts": pa.array(ts.view("datetime64[us]")),
                "n_next": pa.array(n_next.astype(np.int64)),
            }
        )

    return (
        _t(sf_dir, "events", ["event_id", "user_id", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["user_id", "event_id", "ts", "n_next"])
    )


# ------------------------------------------- window lag / moving avg
def _events_windowed(sf_dir: str, win: int):
    """Shared machinery for the offset/frame window ops (window_lag,
    window_moving_avg): events COARSE-bucketed on mix64(user_id)
    (util.scaled_buckets — never one map_groups group per user; at
    10^8 users per-group overhead dominates), each bucket sorted once
    by (user_id, ts, event_id) and every window column computed
    vectorized with pandas groupby shift/rolling. `value` is carried
    as exact 1e-6 fixed-point int64 (_cents) so window sums are
    order-independent and the DuckDB oracle matches bit-exactly;
    divisions back to double are sequenced identically on both sides."""
    from engine.joins import _mix64
    from engine.util import scaled_buckets

    nb = scaled_buckets(512)
    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def tag(t: pa.Table) -> pa.Table:
        x = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        b = _mix64(x.view(np.uint64)) % np.uint64(nb)
        return pa.table(
            {
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "vu": _cents(t["value"], 1000000.0),
                "bucket": pa.array(b.astype(np.int32)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)["vu"]
        lag = grp.shift(1)  # float64 with NaN at group starts; ints < 2^53 exact
        delta = (g["vu"] - lag) / 1e6
        roll = grp.rolling(win, min_periods=1)
        mv_s = roll.sum().reset_index(level=0, drop=True).loc[g.index]
        mv_n = roll.count().reset_index(level=0, drop=True).loc[g.index]
        return g.assign(
            delta_value=delta, moving_avg=(mv_s / 1e6) / mv_n
        )[["user_id", "event_id", "ts", "delta_value", "moving_avg"]]

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def window_lag(sf_dir: str):
    """LAG window: per user ordered by (ts, event_id), the change in
    value vs the previous event (NULL on each user's first event)."""
    return _events_windowed(sf_dir, win=3).select_columns(
        ["user_id", "event_id", "ts", "delta_value"]
    )


def window_moving_avg(sf_dir: str, win: int = 3):
    """Moving-average frame window: per user ordered by (ts, event_id),
    mean of value over the current + `win`-1 preceding rows."""
    return _events_windowed(sf_dir, win=win).select_columns(
        ["user_id", "event_id", "ts", "moving_avg"]
    )


# ------------------------------------------------------------- pivot
def pivot_events(sf_dir: str):
    """Pivot: per hour, event counts spread into one int64 column per
    event_type. Re-expressed Ray-Data-first as indicator columns built
    vectorized in map_batches (pc.equal → int64) + ONE groupby over
    the hour key with a Sum per pivoted column — the per-batch
    indicators are the combiner, so the shuffle carries one row per
    (hour, batch), never per event."""
    types = ("click", "view", "purchase", "signup", "error")
    ds = _t(sf_dir, "events", ["ts", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        cols = {"hour": pc.floor_temporal(t["ts"], unit="hour")}
        for ty in types:
            cols[f"n_{ty}"] = pc.cast(pc.equal(t["event_type"], ty), pa.int64())
        g = (
            pa.table(cols)
            .group_by("hour")
            .aggregate([(f"n_{ty}", "sum") for ty in types])
        )
        # select by the aggregate's actual output names — the column
        # ORDER of group_by().aggregate() is pyarrow-version-dependent
        # (keys first vs last), so a positional rename would silently
        # swap columns on a pyarrow upgrade
        return pa.table(
            {"hour": g["hour"],
             **{f"n_{ty}": g[f"n_{ty}_sum"] for ty in types}}
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(*[Sum(f"n_{ty}", alias_name=f"n_{ty}") for ty in types])
        .sort("hour")
    )


def _flag_status_detail(ds) -> "pd.DataFrame":
    """Detailed (l_returnflag, l_linestatus) fixed-point sum_qty +
    COUNT(*) with a per-block arrow combiner (see groupby_agg — Ray's
    Aggregate per-block combine measured ~170 ms per 9k-row block vs
    ~1 ms for arrow group_by), reduced by a key-cardinality groupby.
    Shared by rollup_agg / cube_agg; the returned pandas frame is
    bounded by flags×statuses, not data size."""

    def pre(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "l_linestatus": t["l_linestatus"],
                    "qty_c": _cents(t["l_quantity"], 100.0),
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("qty_c", "sum"), ("one", "sum")])
        )
        return pa.table(
            {"l_returnflag": g["l_returnflag"],
             "l_linestatus": g["l_linestatus"],
             "qty_c": g["qty_c_sum"], "n": g["one_sum"]}
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty_c", alias_name="qty_c"), Sum("n", alias_name="n"))
        .to_pandas()  # bounded by group-key cardinality, not data size
    )


# ------------------------------------------------------------ rollup
def rollup_agg(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) — sum_qty + count at
    three grouping levels. The data-sized work is ONE shuffle: the
    detailed groupby over exact fixed-point partials; the coarser
    levels are then derived from the detailed AGGREGATE, which is
    group-key-cardinality sized (≤ flags×statuses rows), not
    data-sized — the standard rollup plan at 100 TB. Rolled-up cells
    use the 'ALL' sentinel on both sides (no NULL-vs-NaN hash
    ambiguity in the driver compare)."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    detailed = _flag_status_detail(ds)
    lvl1 = (
        detailed.groupby("l_returnflag", as_index=False)[["qty_c", "n"]]
        .sum()
        .assign(l_linestatus="ALL")
    )
    total = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "qty_c": [detailed["qty_c"].sum()],
            "n": [detailed["n"].sum()],
        }
    )
    out = pd.concat([detailed, lvl1, total], ignore_index=True)
    out = out.sort_values(["l_returnflag", "l_linestatus"], kind="mergesort")
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
            "sum_qty": pa.array(out["qty_c"].astype(np.int64) / 100.0, pa.float64()),
            "n": pa.array(out["n"].astype(np.int64), pa.int64()),
        }
    )


# ------------------------------------------------- percentile_group
def percentile_disc(sf_dir: str):
    """Exact discrete median per group (the rank-based percentile a
    quality-filter pipeline thresholds on): per c_mktsegment, the
    c_acctbal at 1-based rank (n+1)//2 under (c_acctbal, c_custkey)
    order — pure value SELECTION, no interpolation, so the DuckDB
    window-function oracle matches bit-exactly. Group count is bounded
    (segments), so a direct groupby is the right shape."""
    ds = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c_acctbal", "c_custkey"], kind="mergesort")
        row = g.iloc[(len(g) + 1) // 2 - 1]
        return pd.DataFrame(
            {
                "c_mktsegment": [row["c_mktsegment"]],
                "median_acctbal": [float(row["c_acctbal"])],
                "n_customers": [int(len(g))],
            }
        )

    return (
        ds.groupby("c_mktsegment")
        .map_groups(med, batch_format="pandas")
        .select_columns(["c_mktsegment", "median_acctbal", "n_customers"])
    )


# ---------------------------------------------------------- pagerank
def _minted_edges(sf_dir: str):
    """Deterministic host-graph edge list minted from documents (the
    golden-construction pattern: known inputs → SQL-reconstructable
    edges): one edge (doc_id % 7) → ((doc_id*3+1) % 7) per document."""
    ds = _t(sf_dir, "documents", ["doc_id"])

    def mint(t: pa.Table) -> pa.Table:
        d = pc.cast(t["doc_id"], pa.int64())
        seven = pa.scalar(7, pa.int64())
        src = pc.subtract(d, pc.multiply(pc.divide(d, seven), seven))
        d3 = pc.add(pc.multiply(d, pa.scalar(3, pa.int64())), pa.scalar(1, pa.int64()))
        dst = pc.subtract(d3, pc.multiply(pc.divide(d3, seven), seven))
        return pa.table({"src": src, "dst": dst})

    return ds.map_batches(mint, batch_format="pyarrow")


def pagerank_hosts(sf_dir: str, n_iter: int = 3):
    """Integer fixed-point PageRank (engine.graph.pagerank — iterative
    distributed joins + groupbys) over the minted host graph; the
    DuckDB oracle unrolls the identical iterations as CTEs, so an
    ITERATIVE graph algorithm is oracle-checked bit-exactly."""
    from engine.graph import pagerank

    return pagerank(_minted_edges(sf_dir), n_iter=n_iter).sort("node")


def _minted_blocked_edges(sf_dir: str):
    """Edge list minted from documents whose components are KNOWN by
    construction: node ids live in 5 disjoint blocks of 10 (block =
    doc_id % 5) and every edge stays inside its block — u = (doc_id//5)
    % 10, src = block*10+u, dst = block*10+((u*7+3) % 10). The x→7x+3
    permutation of Z10 splits each block into 3 cycles, so the graph
    has 15 true components."""
    ds = _t(sf_dir, "documents", ["doc_id"])

    def _mod(a, m):
        mm = pa.scalar(m, pa.int64())
        return pc.subtract(a, pc.multiply(pc.divide(a, mm), mm))

    def mint(t: pa.Table) -> pa.Table:
        d = pc.cast(t["doc_id"], pa.int64())
        blk = pc.multiply(_mod(d, 5), pa.scalar(10, pa.int64()))
        u = _mod(pc.divide(d, pa.scalar(5, pa.int64())), 10)
        u2 = _mod(
            pc.add(pc.multiply(u, pa.scalar(7, pa.int64())), pa.scalar(3, pa.int64())),
            10,
        )
        return pa.table({"src": pc.add(blk, u), "dst": pc.add(blk, u2)})

    return ds.map_batches(mint, batch_format="pyarrow")


def graph_components(sf_dir: str, n_iter: int = 3):
    """Connected components by fixed-round min-label propagation
    (engine.graph.connected_components — iterative bucketed joins +
    groupby-min); the DuckDB oracle unrolls the identical rounds, and
    3 rounds fully converge on the minted 15-component graph (2 is the diameter bound; chained-shuffle stage overhead at sandbox scale makes every extra round ~20 s, so the margin is one round, not two)."""
    from engine.graph import connected_components

    return connected_components(_minted_blocked_edges(sf_dir), n_iter=n_iter).sort(
        "node"
    )


def graph_degree(sf_dir: str):
    """Per-node out/in degree of the minted host graph
    (engine.graph.degree_stats: two groupbys + vertex-set left-outer
    joins, all distributed)."""
    from engine.graph import degree_stats

    return degree_stats(_minted_edges(sf_dir)).sort("node")


# ------------------------------------------------- stratified sample
def stratified_sample(sf_dir: str):
    """Domain-balanced downsampling (training-data mixing): cap every
    stratum (here documents.lang) at the mean stratum size, keeping an
    over-represented stratum's rows with probability cap/count and
    small strata intact. Membership is a pure row function — keep iff
    the first 8 hex digits of md5(doc_id) are lexicographically below
    the stratum's threshold hex string (monotonic with the integer
    value, so it equals u32 < cap*2^32//count) — reproducible,
    retry-safe and resumable like `sample`, never an RNG stream.
    Stratum counts are a tiny groupby collected once (n_strata rows)
    and the threshold dict broadcast via ray.put; the filter pass is
    stateless shuffle-free map_batches."""
    import hashlib

    import ray

    docs = _t(sf_dir, "documents", ["doc_id", "lang"])

    def _lang_part(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"lang": t["lang"],
                      "one": pa.array(np.ones(t.num_rows, np.int64))})
            .group_by("lang").aggregate([("one", "sum")])
        )
        return pa.table({"lang": g["lang"], "c": g["one_sum"]})

    cnt = (
        docs.map_batches(_lang_part, batch_format="pyarrow")
        .groupby("lang").aggregate(Sum("c", alias_name="c")).to_pandas()
    )
    total = int(cnt["c"].sum())
    cap = total // len(cnt)
    thr = {
        lang: None if c <= cap else format(cap * (1 << 32) // c, "08x")
        for lang, c in zip(cnt["lang"], cnt["c"].astype(int))
    }
    tref = ray.put(thr)

    def f(t: pa.Table) -> pa.Table:
        th = cached_get(tref)
        ok = []
        for i, lang in zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()):
            h = th[lang]
            ok.append(h is None or hashlib.md5(str(i).encode()).hexdigest()[:8] < h)
        return t.filter(pa.array(ok, pa.bool_()))

    return docs.map_batches(f, batch_format="pyarrow")


# --------------------------------------------------- tumbling window
def tumbling_window(sf_dir: str):
    """Streaming-style tumbling-window aggregate: events bucketed into
    fixed 1-hour windows per event_type — count + exact fixed-point
    value sum per (type, window). The bucket is computed inside
    map_batches (pc.floor_temporal — vectorized, no shuffle), so the
    only all-to-all is the final low-cardinality groupby over explicit
    per-block arrow-group_by partials. The streaming
    analogue holds at 100 TB: window assignment is a pure row
    function, so late/out-of-order events land in the right window
    regardless of arrival order."""
    ds = _t(sf_dir, "events", ["ts", "event_type", "value"])

    def pre(t: pa.Table) -> pa.Table:
        # per-block combiner: ≤|type×window| partials per block
        g = (
            pa.table(
                {
                    "event_type": t["event_type"],
                    "window_start": pc.floor_temporal(t["ts"], unit="hour"),
                    "vu": _cents(t["value"], 1_000_000.0),
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by(["event_type", "window_start"])
            .aggregate([("vu", "sum"), ("one", "sum")])  # COUNT(*)
        )
        return pa.table(
            {"event_type": g["event_type"], "window_start": g["window_start"],
             "vu": g["vu_sum"], "n": g["one_sum"]}
        )

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n_events"), Sum("vu", alias_name="sum_value_fp"))
        .sort(["event_type", "window_start"])
    )


# --------------------------------------------------------- histogram
def histogram(sf_dir: str, bin_width: float = 25000.0):
    """Equi-width histogram of orders.o_totalprice. Bin assignment is a
    pure row function (floor(x / width) — IEEE divide+floor, identical
    in DuckDB) computed vectorized in map_batches, then combined
    per batch with a pyarrow group_by so the shuffle carries ≤
    bins-per-batch rows; the global groupby-sum over bin partials is
    the only all-to-all. At 100 TB the shuffle payload stays O(bins ×
    blocks) regardless of row count."""
    ds = _t(sf_dir, "orders", ["o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(t["o_totalprice"], bin_width)), pa.int64())
        g = (
            pa.table({"bin": b, "one": pa.nulls(len(t), pa.int64()).fill_null(1)})
            .group_by("bin")
            .aggregate([("one", "sum")])
        )
        # name-based select (not positional rename): group_by output
        # column order is pyarrow-version-dependent
        return pa.table({"bin": g["bin"], "n": g["one_sum"]})

    return (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .sort("bin")
    )


# -------------------------------------------------------- corr_stats
def corr_stats(sf_dir: str):
    """Pearson correlation of l_quantity vs l_discount from EXACT
    integer partial sums (n, Σx, Σy, Σxy, Σx², Σy² over small
    fixed-point ints — qty ≤ 50, discount·100 ≤ 10, so every partial
    fits int64 at any row count that fits a cluster). The six sums
    combine per block (one partial row each) and reduce in one tiny
    aggregate; the final r = (nΣxy−ΣxΣy)/(√(nΣx²−Σx²)·√(nΣy²−Σy²)) is
    one driver-side expression over exact ints, sequenced identically
    in the SQL oracle, so the double matches bit-exactly."""
    ds = _t(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def pre(t: pa.Table) -> pa.Table:
        # per-block combiner: ONE partial row per block (see
        # groupby_agg) — the six sums stay exact int64
        x = _cents(t["l_quantity"], 1.0)
        y = _cents(t["l_discount"], 100.0)

        def s(a) -> int:
            return pc.sum(a).as_py() or 0

        return pa.table(
            {
                "x": pa.array([s(x)], pa.int64()),
                "y": pa.array([s(y)], pa.int64()),
                "xy": pa.array([s(pc.multiply(x, y))], pa.int64()),
                "xx": pa.array([s(pc.multiply(x, x))], pa.int64()),
                "yy": pa.array([s(pc.multiply(y, y))], pa.int64()),
                "n_part": pa.array([t.num_rows], pa.int64()),
            }
        )

    o = ds.map_batches(pre, batch_format="pyarrow").aggregate(
        Sum("x", alias_name="sx"), Sum("y", alias_name="sy"),
        Sum("xy", alias_name="sxy"), Sum("xx", alias_name="sxx"),
        Sum("yy", alias_name="syy"), Sum("n_part", alias_name="n"),
    )
    import math

    n, sx, sy = o["n"], o["sx"], o["sy"]
    cov = float(n * o["sxy"] - sx * sy)
    vx = float(n * o["sxx"] - sx * sx)
    vy = float(n * o["syy"] - sy * sy)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "corr_qty_disc": pa.array(
                [cov / (math.sqrt(vx) * math.sqrt(vy))], pa.float64()
            ),
        }
    )


# ---------------------------------------------------------- unpivot
def unpivot_events(sf_dir: str):
    """UNPIVOT/melt: the wide per-hour pivot spread back to long
    (hour, event_type, n) rows INCLUDING explicit zero cells — the
    inverse of pivot_events. The wide input is already
    bins×types-sized (pivot's combiner did the data-sized work), so
    the melt is a row-bounded map_batches expansion, no extra
    shuffle."""
    types = ("click", "view", "purchase", "signup", "error")
    wide = pivot_events(sf_dir)

    def melt(t: pa.Table) -> pa.Table:
        parts = [
            pa.table(
                {
                    "hour": t["hour"],
                    "event_type": pa.nulls(len(t), pa.string()).fill_null(ty),
                    "n": t[f"n_{ty}"],
                }
            )
            for ty in types
        ]
        return pa.concat_tables(parts)

    return wide.map_batches(melt, batch_format="pyarrow").sort(
        ["hour", "event_type"]
    )


# ---------------------------------------------------- salted groupby
def groupby_salted(sf_dir: str, n_salts: int = 16):
    """Hot-key-resistant two-phase aggregate: lineitem grouped by
    l_returnflag — THREE keys over the whole table, the canonical
    skew case where a single-phase map_groups would put ~N/3 rows in
    one worker. Phase 1 groups by (key, salt) with salt =
    row-hash % n_salts computed vectorized in map_batches (spreads
    each hot key over n_salts reducers); phase 2 re-groups the
    n_keys×n_salts partials by key. Partials combine per block with
    an arrow group_by before the shuffle; the pattern matters most
    for map_groups-style aggregates (exact medians, top-k lists)
    whose combiner is manual. Result is identical to the unsalted
    groupby and oracle-checked."""
    from engine.joins import _mix64

    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_orderkey"])

    def pre(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False)
        salt = _mix64(k.astype(np.int64).view(np.uint64)) % np.uint64(n_salts)
        # per-block arrow combiner over (key, salt) — ≤ keys×salts
        # partial rows leave each block
        g = (
            pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "salt": pa.array(salt.astype(np.int32)),
                    "qty_c": _cents(t["l_quantity"], 100.0),
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
            .group_by(["l_returnflag", "salt"])
            .aggregate([("qty_c", "sum"), ("one", "sum")])
        )
        return pa.table(
            {"l_returnflag": g["l_returnflag"], "salt": g["salt"],
             "qty_c": g["qty_c_sum"], "n": g["one_sum"]}
        )

    partial = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby(["l_returnflag", "salt"])
        .aggregate(Sum("qty_c", alias_name="qty_c"), Sum("n", alias_name="n"))
    )
    return (
        partial.groupby("l_returnflag")
        .aggregate(Sum("qty_c", alias_name="qty_c2"), Sum("n", alias_name="n_rows"))
        .map_batches(
            lambda t: pa.table(
                {
                    "l_returnflag": t["l_returnflag"],
                    "sum_qty": pc.divide(
                        pc.cast(t["qty_c2"], pa.float64()), 100.0
                    ),
                    "n_rows": t["n_rows"],
                }
            ),
            batch_format="pyarrow",
        )
        .sort("l_returnflag")
    )


# -------------------------------------------------------------- cube
def cube_agg(sf_dir: str):
    """GROUP BY CUBE(l_returnflag, l_linestatus) — sum_qty + count at
    all FOUR grouping levels (detail, each single key, grand total).
    Same plan as rollup_agg: ONE data-sized shuffle (the detailed
    groupby over exact fixed-point partials), every coarser level
    derived from the key-cardinality-sized detailed aggregate on the
    driver; 'ALL' sentinel for rolled-up cells."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
    detailed = _flag_status_detail(ds)
    by_flag = (
        detailed.groupby("l_returnflag", as_index=False)[["qty_c", "n"]]
        .sum()
        .assign(l_linestatus="ALL")
    )
    by_status = (
        detailed.groupby("l_linestatus", as_index=False)[["qty_c", "n"]]
        .sum()
        .assign(l_returnflag="ALL")
    )
    total = pd.DataFrame(
        {
            "l_returnflag": ["ALL"],
            "l_linestatus": ["ALL"],
            "qty_c": [detailed["qty_c"].sum()],
            "n": [detailed["n"].sum()],
        }
    )
    out = pd.concat([detailed, by_flag, by_status, total], ignore_index=True)
    out = out.sort_values(["l_returnflag", "l_linestatus"], kind="mergesort")
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
            "sum_qty": pa.array(out["qty_c"].astype(np.int64) / 100.0, pa.float64()),
            "n": pa.array(out["n"].astype(np.int64), pa.int64()),
        }
    )


# ------------------------------------------------------- global rank
def global_rank(sf_dir: str, n_tiles: int = 4, bin_width: float = 25000.0):
    """Global ROW_NUMBER + NTILE over orders ordered by
    (o_totalprice, o_orderkey) — the distributed total ranking a
    single-node window function can't do at 10^10 rows. Two-pass
    prefix-sum plan (same shape as textops.pack_sequences): rows are
    keyed by a VALUE-range bin (floor(price/width) — order-preserving,
    so every row in bin b outranks every row in bins < b); per-bin
    counts come from one combiner groupby; the driver cumsums the
    O(#bins) counts and broadcasts the bin base ranks; a per-bin
    map_groups sorts its own slice vectorized and adds the base.
    Nothing data-sized touches the driver. NTILE uses the exact SQL
    rule: tile = (rn-1) // ceil-sized big tiles, i.e. DuckDB's
    NTILE(n) with remainder tiles first."""
    import ray

    from engine.util import cached_get as _cg

    ds = _t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def tag(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(t["o_totalprice"], bin_width)), pa.int64())
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_totalprice": t["o_totalprice"],
                "bin": b,
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def _bin_part(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"bin": t["bin"],
                      "one": pa.array(np.ones(t.num_rows, np.int64))})
            .group_by("bin").aggregate([("one", "sum")])
        )
        return pa.table({"bin": g["bin"], "c": g["one_sum"]})

    per_bin = (
        tagged.map_batches(_bin_part, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # O(#bins), not data-sized
        .sort_values("bin")
    )
    counts = per_bin["c"].astype(int)
    base = dict(zip(per_bin["bin"].astype(int), counts.cumsum() - counts))
    n_total = int(counts.sum())
    bref = ray.put(base)
    # NTILE(n) over n_total rows: first (n_total % n) tiles have
    # ceil(n_total/n) rows, the rest floor(n_total/n)
    big = -(-n_total // n_tiles)
    small = n_total // n_tiles
    n_big = n_total % n_tiles
    cut = n_big * big  # ranks 1..cut live in big tiles

    def rank_bin(g: pd.DataFrame) -> pa.Table:
        b = _cg(bref)
        g = g.sort_values(["o_totalprice", "o_orderkey"], kind="mergesort")
        rn = int(b[int(g["bin"].iloc[0])]) + np.arange(1, len(g) + 1)
        if n_big:
            tile = np.where(
                rn <= cut,
                (rn - 1) // big + 1,
                n_big + (rn - 1 - cut) // small + 1,
            )
        else:
            tile = (rn - 1) // small + 1
        return pa.table(
            {
                "o_orderkey": pa.array(g["o_orderkey"].to_numpy(), pa.int64()),
                "o_totalprice": pa.array(
                    g["o_totalprice"].to_numpy(), pa.float64()
                ),
                "rn": pa.array(rn.astype(np.int64)),
                "tile": pa.array(tile.astype(np.int64)),
            }
        )

    return (
        tagged.groupby("bin")
        .map_groups(rank_bin, batch_format="pandas")
        .select_columns(["o_orderkey", "o_totalprice", "rn", "tile"])
    )


# ------------------------------------------------ approx distinct HLL
def approx_distinct_hll(sf_dir: str, b: int = 10):
    """HyperLogLog distinct-count sketch over lineitem.l_orderkey —
    oracle-checked BIT-EXACTLY, which is unusual for a sketch: the
    hash is md5 (deterministic, mirrored in SQL), registers are an
    exact integer groupby-MAX, the harmonic sum is EXACT integer
    arithmetic (Σ 2^(64-M_j) in Python bigints / DuckDB HUGEINT — no
    float-summation order hazard), and the single raw-estimate double
    expression is sequenced identically on both sides. The small-range
    (linear-counting) correction is deliberately omitted so the
    estimator stays one mirrorable expression; accuracy at tiny
    cardinalities is accordingly raw-HLL (documented, tested with a
    wide bound at sf0.001).

    Scale shape: the per-batch combiner collapses every batch to ≤ m
    (bucket, rank) rows via numpy maximum-scatter, the only shuffle is
    a ≤ m×blocks-row groupby-MAX, and the driver folds m=2^b rows —
    the sketch is O(m) state at ANY corpus size, the whole point of
    HLL at 100 TB."""
    import hashlib

    m = 1 << b
    ds = _t(sf_dir, "lineitem", ["l_orderkey"])

    def regs(t: pa.Table) -> pa.Table:
        r = np.zeros(m, dtype=np.int64)
        for key in t["l_orderkey"].to_pylist():
            h = int(hashlib.md5(str(key).encode()).hexdigest()[:16], 16)
            v = h // m  # bucket = h % m, rank from the 54-bit suffix
            rank = 55 - v.bit_length() if v else 55
            bkt = h % m
            if rank > r[bkt]:
                r[bkt] = rank
        nz = np.flatnonzero(r)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int64)),
                "r": pa.array(r[nz]),
            }
        )

    folded = (
        ds.map_batches(regs, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Max("r", alias_name="mr"))
        .to_pandas()  # ≤ m rows by construction
    )
    ss = sum(1 << (64 - int(x)) for x in folded["mr"]) + (m - len(folded)) * (
        1 << 64
    )
    import math

    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    est = alpha * float(m) * float(m) * 18446744073709551616.0 / float(ss)
    # half-away-from-zero like SQL ROUND (Python round() is banker's)
    est6 = math.floor(est * 1000000.0 + 0.5) / 1000000.0
    return pa.table(
        {"m": pa.array([m], pa.int64()), "est_distinct": pa.array([est6])}
    )


# ------------------------------------------------- format round-trips
def _roundtrip(ds, write, read, key: str, sum_col: str):
    """Shared sink→source parity harness: write `ds` as partitioned
    text files (one file per block — the resumable-output rule, never
    one giant file), read it back, aggregate, MATERIALIZE the
    group-key-sized result (≤ distinct(key) rows), and remove the
    scratch dir. The scratch path is a node-local tempdir: fine
    single-node, but on a multi-node cluster write tasks would land
    files on each worker's local filesystem — a real deployment must
    point this at shared storage (the run's out_dir / object store);
    materializing before cleanup keeps the contract lazy-free so the
    tempdir never leaks across bench/test invocations."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix=f"{key}_rt_")
    try:
        write(ds, out)
        return (
            read(out)
            .groupby(key)
            .aggregate(Count(alias_name="n"), Sum(sum_col, alias_name="sum_ids"))
            .sort(key)
            .to_pandas()
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


def jsonl_roundtrip(sf_dir: str):
    """JSONL sink + source parity: documents (doc_id, lang) written as
    partitioned JSON-lines by Ray tasks, read back with read_json, and
    aggregated. Proves the non-parquet format path end-to-end (the
    aggregate matches the parquet-side oracle bit-exactly)."""
    import ray.data as rd

    return _roundtrip(
        _t(sf_dir, "documents", ["doc_id", "lang"]),
        lambda d, o: d.write_json(o), rd.read_json, "lang", "doc_id",
    )


def jsonl_gz_roundtrip(sf_dir: str):
    """gzip-compressed JSONL sink + source parity — the .jsonl.gz
    shape web-text corpora ship in: each input block is written as ONE
    .jsonl.gz part by its own Ray map task (partitioned, resumable,
    deterministically named by content hash), read back with
    read_json(arrow_open_stream_args={'compression': 'gzip'}), and
    aggregated against the same parquet-side oracle as
    jsonl_roundtrip."""
    import ray.data as rd

    def write(d, o):
        import gzip
        import hashlib as H
        import os as _os
        import pathlib

        def write_block(t: pa.Table) -> pa.Table:
            import json

            ids = t["doc_id"].to_pylist()
            langs = t["lang"].to_pylist()
            lines = "".join(
                json.dumps({"doc_id": i, "lang": lg}, separators=(",", ":"))
                + "\n"
                for i, lg in zip(ids, langs)
            ).encode()
            tag = H.md5(lines).hexdigest()[:16]
            path = pathlib.Path(o) / f"part-{tag}.jsonl.gz"
            tmp = path.with_suffix(".tmp")
            # mtime=0 pins the gzip header: retries rewrite identical bytes
            with open(tmp, "wb") as f:
                with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
                    gz.write(lines)
            _os.replace(tmp, path)
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        d.map_batches(write_block, batch_format="pyarrow").materialize()

    def read(o):
        return rd.read_json(
            o,
            file_extensions=["gz"],
            arrow_open_stream_args={"compression": "gzip"},
        )

    return _roundtrip(
        _t(sf_dir, "documents", ["doc_id", "lang"]), write, read,
        "lang", "doc_id",
    )


def csv_roundtrip(sf_dir: str):
    """CSV sink + source parity (same contract as jsonl_roundtrip)."""
    import ray.data as rd

    return _roundtrip(
        _t(sf_dir, "events", ["event_id", "event_type"]),
        lambda d, o: d.write_csv(o), rd.read_csv, "event_type", "event_id",
    )


def text_roundtrip(sf_dir: str):
    """Plain-text source/sink parity (ray.data.read_text, the
    line-oriented format family): documents.text written as
    partitioned .txt parts by Ray map tasks (one file per batch —
    partitioned, resumable, never one giant file), read back with
    read_text, and reduced to (n_lines, sum_chars). The corpus text is
    newline-free and non-empty, so lines round-trip 1:1 with
    documents; lengths are codepoint counts on both sides (python len
    over the utf-8-decoded line == DuckDB length()). Same node-local
    tempdir caveat as _roundtrip (shared storage in production); the
    group-key-free aggregate is 1 row, materialized before cleanup."""
    import shutil
    import tempfile
    import uuid as _uuid

    import ray.data as rd

    out = tempfile.mkdtemp(prefix="text_rt_")

    def dump(t: pa.Table) -> pa.Table:
        # filename randomness only names the part; results are
        # content-based and order-insensitive
        path = f"{out}/part-{_uuid.uuid4().hex}.txt"
        with open(path, "w", encoding="utf-8") as f:
            for s in t[
                "text"
            ].to_pylist():
                f.write(s + "\n")
        return pa.table({"written": pa.array([t.num_rows], pa.int64())})

    try:
        _t(sf_dir, "documents", ["text"]).map_batches(
            dump, batch_format="pyarrow"
        ).materialize()  # barrier: all parts on disk before the read

        def measure(t: pa.Table) -> pa.Table:
            lens = pc.utf8_length(t["text"])
            return pa.table(
                {
                    "n_lines": pa.array([t.num_rows], pa.int64()),
                    "sum_chars": pa.array(
                        [pc.sum(lens).as_py() or 0], pa.int64()
                    ),
                }
            )

        agg = (
            rd.read_text(out)
            .map_batches(measure, batch_format="pyarrow")
            .aggregate(  # eager: returns a dict, safe to clean up after
                Sum("n_lines", alias_name="n_lines"),
                Sum("sum_chars", alias_name="sum_chars"),
            )
        )
        return pa.table(
            {
                "n_lines": pa.array([agg["n_lines"]], pa.int64()),
                "sum_chars": pa.array([agg["sum_chars"]], pa.int64()),
            }
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ------------------------------------------------------ left outer join
def join_left(sf_dir: str, min_acctbal: float = 5000.0):
    """orders LEFT OUTER JOIN the high-balance customer subset — the
    null-padding join variant (B4 is inner). Ray's native hash
    left_outer join; rows without a match carry null c_name, proving
    null propagation through the shuffle join path."""
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    rich = cust.map_batches(
        lambda t: t.filter(
            pc.greater(t["c_acctbal"], min_acctbal)
        ).drop_columns(["c_acctbal"]),
        batch_format="pyarrow",
    )
    from engine.util import parquet_num_rows

    np_ = _join_partitions(parquet_num_rows(f"{sf_dir}/orders.parquet"))
    return orders.join(
        rich, "left_outer", num_partitions=np_,
        on=("o_custkey",), right_on=("c_custkey",),
    ).select_columns(["o_orderkey", "o_custkey", "c_name"])


# ---------------------------------------------------------- set ops
def intersect_distinct(sf_dir: str):
    """INTERSECT: nation keys present among BOTH customers and
    suppliers — distinct of the semi join (B6 machinery), the set
    operator surface a relational user expects."""
    cust = _t(sf_dir, "customer", ["c_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow"
    )
    from engine.joins import semi_anti_bucketed

    supp = _t(sf_dir, "supplier", ["s_nationkey"])
    both = semi_anti_bucketed(cust, supp, on="nationkey",
                              right_on="s_nationkey", keep_present=True)
    return (
        both.map_batches(  # per-block unique: shuffle ≤|keys| per block
            lambda t: pa.table({"nationkey": pc.unique(t["nationkey"])}),
            batch_format="pyarrow",
        )
        .groupby("nationkey")
        .aggregate(Count(alias_name="__c"))
        .select_columns(["nationkey"])
        .sort("nationkey")
    )


def except_distinct(sf_dir: str, big: float = 350000.0):
    """EXCEPT: custkeys that ordered but never placed a BIG
    (> `big`) order — distinct of the anti join. (The more obvious
    customers-minus-orderers EXCEPT is EMPTY in the synthetic data at
    every scale, and an empty Dataset loses its schema through
    to_pandas — so the op pins a pair that is non-empty at all
    scales: 8/68/761 rows at sf0.001/0.01/0.1.)"""
    from engine.joins import semi_anti_bucketed

    orderers = _t(sf_dir, "orders", ["o_custkey"])
    big_orderers = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], big)).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    never = semi_anti_bucketed(orderers, big_orderers, on="o_custkey",
                               keep_present=False)
    return (
        never.map_batches(  # per-block unique: shuffle ≤|keys| per block
            lambda t: pa.table({"o_custkey": pc.unique(t["o_custkey"])}),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .aggregate(Count(alias_name="__c"))
        .select_columns(["o_custkey"])
        .sort("o_custkey")
    )
