"""Bucketed co-partitioned semi/anti join — the big-side scale path
promised by SURVEY.md §2B B6 (ops.join_semi/join_anti use the broadcast
key-set form below a size cutoff; this module is the form that holds
when the key set itself is too large to broadcast).

Shape: both sides are tagged with `bucket = mix64(key) % num_buckets`
and a side marker, unioned (the probe side keeps its full row, the
build side travels as key-only rows padded with nulls), and a single
`groupby(bucket).map_groups` co-locates each bucket: build the key set
from the build-side rows, filter the probe-side rows with a vectorized
`pc.is_in`. One all-to-all over (probe rows + build keys); no driver
materialization; buckets are hash-spread so a skewed key value adds at
most its own row count to one bucket (keys are member-tested, never
cross-joined, so bucket size only affects balance, not complexity).

Works for int64 keys natively; string keys are hashed to a 64-bit
probe key with equality preserved exactly (membership is tested on the
original value, the hash only routes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.util import scaled_buckets


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — spreads sequential int keys uniformly so
    bucket routing never inherits key skew/patterns."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4B9F9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def _bucket_of(col: pa.ChunkedArray, num_buckets: int) -> pa.Array:
    """bucket id per value. Int keys route via mix64 (pure numpy);
    string keys are dictionary-encoded so only the DISTINCT values are
    hashed (one C-speed md5 call each — on a url-keyed join the
    per-row-per-byte Python hash loop this replaces WAS the stage
    cost), then mapped back through the dictionary indices with one
    numpy take."""
    if pa.types.is_integer(col.type):
        x = col.combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        b = _mix64(x.view(np.uint64)) % np.uint64(num_buckets)
        return pa.array(b.astype(np.int32))
    import hashlib

    enc = pc.dictionary_encode(col.combine_chunks())
    dvals = enc.dictionary.to_pylist()
    dhash = np.fromiter(
        (int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[:8], "big")
         for v in dvals),
        dtype=np.uint64, count=len(dvals),
    )
    dbucket = (dhash % np.uint64(num_buckets)).astype(np.int32)
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.array(dbucket[idx])


def _arrow_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset whether its blocks are Arrow or pandas
    (a pandas-origin dataset — e.g. the output of a map_groups — reports
    a PandasBlockSchema whose types are numpy dtypes)."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            fields.append((n, t))
        else:
            try:
                fields.append((n, pa.from_numpy_dtype(t)))
            except (pa.ArrowNotImplementedError, TypeError):
                fields.append((n, pa.string()))
    return pa.schema(fields)


def _typed_empty(names, ltypes: dict, rtypes: dict) -> pa.Table:
    """Zero-row ARROW table with the DECLARED dtypes. A bare
    pd.DataFrame(columns=...) is all-object — Ray then sees empty
    map_groups blocks whose schema differs from the non-empty groups'
    and spams '...new schema: .' mismatch warnings downstream."""
    return pa.table(
        {n: pa.array([], ltypes.get(n, rtypes.get(n))) for n in names}
    )


def _arrow_out(df, names) -> pa.Table:
    """pandas → metadata-free Arrow for map_groups RETURN values: a
    returned DataFrame becomes a PANDAS block, and when that block
    enters a further shuffle Ray's schema dedup chokes on the pandas
    schema ('Failed to hash the schemas … unhashable type: dict') —
    returning Arrow keeps every downstream stage on hashable Arrow
    schemas (int columns were already normalized by the caller)."""
    return pa.Table.from_pandas(df[names], preserve_index=False).replace_schema_metadata(
        None
    )


def _typed_arrow_out(df, names, ltypes: dict, rtypes: dict) -> pa.Table:
    """pandas → Arrow with the DECLARED column types. The null-padded
    union turns integer columns float64 inside the pandas group (BOTH
    sides: a left int column is null on every right-tagged row and
    vice versa); building with an explicit schema restores every
    column's declared Arrow type — int32 stays int32, matching
    _typed_empty — and `from_pandas` maps any surviving NaN to null
    instead of raising like a pandas astype("int64") would."""
    schema = pa.schema([(n, ltypes.get(n, rtypes.get(n))) for n in names])
    return pa.Table.from_pandas(
        df[names], schema=schema, preserve_index=False
    ).replace_schema_metadata(None)


def semi_anti_bucketed(left_ds, right_ds, on: str, right_on: str | None = None,
                       keep_present: bool = True, num_buckets: int | None = None):
    """left semi (keep_present=True) / anti (False) join: keep left rows
    whose `on` value is (not) present among right's `right_on` values.

    Both datasets stay distributed end-to-end: the only exchange is one
    groupby over (left rows ∪ right key rows) on the hashed bucket.
    num_buckets defaults to util.scaled_buckets(64) — 64 at the 32-CPU
    sandbox, scaling with cluster CPUs so bucket SIZE doesn't grow
    with the corpus at fixed fan-out.
    """
    if num_buckets is None:
        num_buckets = scaled_buckets(64)
    right_on = right_on or on
    left_schema = left_ds.schema()
    left_names = list(left_schema.names)
    left_types = {n: left_schema.base_schema.field(n).type for n in left_names}
    key_type = left_types[on]

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.append_column("__bucket", _bucket_of(t[on], num_buckets))
        t = t.append_column("__k", t[on].combine_chunks().cast(key_type))
        return t.append_column("__side", pa.array(np.zeros(t.num_rows, np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        # key-only rows, padded with nulls to the left schema so the
        # union is schema-aligned (narrow: the pads are null arrays)
        n = t.num_rows
        cols = {name: pa.nulls(n, left_types[name]) for name in left_names}
        out = pa.table(cols)
        out = out.append_column("__bucket", _bucket_of(t[right_on], num_buckets))
        out = out.append_column("__k", t[right_on].combine_chunks().cast(key_type))
        return out.append_column("__side", pa.array(np.ones(n, np.int8)))

    def per_bucket(g: pa.Table) -> pa.Table:
        rmask = pc.equal(g["__side"], 1)
        rkeys = g.filter(rmask)["__k"].combine_chunks()
        lt = g.filter(pc.invert(rmask))
        if lt.num_rows == 0:
            return lt.drop_columns(["__k", "__bucket", "__side"])
        inset = pc.is_in(lt["__k"], value_set=rkeys)
        mask = inset if keep_present else pc.invert(inset)
        return lt.filter(mask).drop_columns(["__k", "__bucket", "__side"])

    tagged_l = left_ds.map_batches(tag_left, batch_format="pyarrow")
    tagged_r = right_ds.map_batches(tag_right, batch_format="pyarrow")
    return (
        tagged_l.union(tagged_r)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def asof_join_bucketed(left_ds, right_ds, on_left: str, on_right: str,
                       ts_left: str, ts_right: str, tiebreak: str,
                       direction: str = "backward",
                       num_buckets: int | None = None):
    """Distributed inner AS-OF join: each left row is matched to the
    right row with the same key and the LARGEST `ts_right` <=
    `ts_left` (direction="backward"; ties on ts broken by the largest
    `tiebreak` value) or the SMALLEST `ts_right` >= `ts_left`
    (direction="forward"; ties by smallest `tiebreak`) — fully
    deterministic and SQL-mirrorable via a row_number window.

    Same shape as semi_anti_bucketed: both sides are tagged with
    bucket = mix64(key) % num_buckets and unioned (rows padded with
    nulls to the combined schema), then ONE groupby co-locates each
    bucket, where a vectorized pandas merge_asof does the per-key
    backward search — no per-key map_groups group, no driver
    materialization, one all-to-all. Left and right column names must
    be disjoint except the key columns."""
    import pandas as pd

    if num_buckets is None:
        num_buckets = scaled_buckets(512)
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    lnames = list(lschema.names)
    ltypes = {n: lschema.base_schema.field(n).type for n in lschema.names}
    rtypes = {n: rschema.base_schema.field(n).type for n in rschema.names}
    out_rnames = [n for n in rschema.names if n != on_right]

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {n: t[n].combine_chunks() for n in lnames}
        n = t.num_rows
        for rn_ in out_rnames:
            cols[rn_] = pa.nulls(n, rtypes[rn_])
        out = pa.table(cols)
        out = out.append_column("__bucket", _bucket_of(t[on_left], num_buckets))
        return out.append_column("__side", pa.array(np.zeros(n, np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for ln_ in lnames:
            if ln_ == on_left:
                cols[ln_] = t[on_right].combine_chunks().cast(ltypes[on_left])
            else:
                cols[ln_] = pa.nulls(n, ltypes[ln_])
        for rn_ in out_rnames:
            cols[rn_] = t[rn_].combine_chunks()
        out = pa.table(cols)
        out = out.append_column("__bucket", _bucket_of(t[on_right], num_buckets))
        return out.append_column("__side", pa.array(np.ones(n, np.int8)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == 0, lnames]
        r = g.loc[g["__side"] == 1, [on_left] + out_rnames].rename(
            columns={on_left: on_right} if on_right != on_left else {}
        )
        key_r = on_right if on_right != on_left else on_left
        if len(l) == 0 or len(r) == 0:
            return _typed_empty(lnames + out_rnames, ltypes, rtypes)
        # merge_asof: right sorted by (ts, tiebreak); backward takes
        # the LAST qualifying row (max ts, then max tiebreak — mirrors
        # ORDER BY ts DESC, tiebreak DESC ... rn = 1), forward the
        # FIRST (min ts, min tiebreak — ORDER BY ts, tiebreak rn = 1)
        l = l.sort_values(ts_left, kind="mergesort")
        r = r.sort_values([ts_right, tiebreak], kind="mergesort")
        m = pd.merge_asof(
            l, r, left_on=ts_left, right_on=ts_right,
            left_by=on_left, right_by=key_r, direction=direction,
        )
        m = m[m[ts_right].notna()]  # inner
        m = m[lnames + out_rnames]
        # the null-padded union turned int columns (on BOTH sides — a
        # left int column is null on every right-tagged row) float64;
        # rebuild with the declared schema so e.g. o_custkey comes out
        # int64 again, not double
        return _typed_arrow_out(m, lnames + out_rnames, ltypes, rtypes)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    return (
        tagged.groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(lnames + out_rnames)
    )


def equi_join_bucketed(left_ds, right_ds, on: str, right_on: str | None = None,
                       num_buckets: int | None = None):
    """Distributed INNER equi-join via the same co-partitioned shape as
    asof_join_bucketed: both sides tagged with bucket = mix64(key) %
    num_buckets, null-padded to the combined schema, unioned, then ONE
    groupby co-locates each bucket where a vectorized pandas merge does
    the per-bucket hash join. Exists for joins whose sides can be
    sparse relative to the partition count — Ray's native Dataset.join
    builds per-partition Acero tables that lose their schema when a
    partition receives zero left rows (7 distinct keys into 32
    partitions → empty-block ArrowInvalid), while an empty groupby
    bucket here simply never materializes. Column names must be
    disjoint except the keys; right key is dropped from the output."""
    import pandas as pd

    if num_buckets is None:
        num_buckets = scaled_buckets(64)
    right_on = right_on or on
    lschema = _arrow_schema(left_ds)
    rschema = _arrow_schema(right_ds)
    lnames = list(lschema.names)
    ltypes = {n: lschema.field(n).type for n in lschema.names}
    rtypes = {n: rschema.field(n).type for n in rschema.names}
    out_rnames = [n for n in rschema.names if n != right_on]

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {ln_: t[ln_].combine_chunks() for ln_ in lnames}
        for rn_ in out_rnames:
            cols[rn_] = pa.nulls(n, rtypes[rn_])
        out = pa.table(cols)
        out = out.append_column("__bucket", _bucket_of(t[on], num_buckets))
        return out.append_column("__side", pa.array(np.zeros(n, np.int8)))

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for ln_ in lnames:
            if ln_ == on:
                cols[ln_] = t[right_on].combine_chunks().cast(ltypes[on])
            else:
                cols[ln_] = pa.nulls(n, ltypes[ln_])
        for rn_ in out_rnames:
            cols[rn_] = t[rn_].combine_chunks()
        out = pa.table(cols)
        out = out.append_column("__bucket", _bucket_of(t[right_on], num_buckets))
        return out.append_column("__side", pa.array(np.ones(n, np.int8)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == 0, lnames]
        r = g.loc[g["__side"] == 1, [on] + out_rnames]
        if len(l) == 0 or len(r) == 0:
            return _typed_empty(lnames + out_rnames, ltypes, rtypes)
        m = l.merge(r, on=on, how="inner")
        # null padding makes int columns float64 in the pandas group;
        # rebuild with the declared schema (preserves int32 etc. and
        # tolerates genuine nulls, unlike a hard astype("int64"))
        return _typed_arrow_out(m, lnames + out_rnames, ltypes, rtypes)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    return (
        tagged.groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(lnames + out_rnames)
    )
