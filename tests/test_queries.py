"""Operator correctness vs the DuckDB oracle (SURVEY.md §5.2).

Mirrors the driver's method: run queries()[name](sf_dir) and
oracle_sql()[name] side by side, compare row count, schema width and
an order-insensitive value comparison (columns sorted by name, rows
sorted by all columns). Runs at sf0.001 for speed; the driver re-runs
at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str) -> None:
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: cols {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    )
    a, b = _normalize(ray_df), _normalize(sql_df)
    # numeric-KIND parity: the driver hashes values dtype-sensitively,
    # so an int64 Ray column vs a float64 oracle column (DuckDB
    # SUM(BIGINT)→HUGEINT→float64, or a null-padded join emerging
    # double) hash-mismatches even when every value is equal — the
    # exact failure mode of round 3's asof_join / *_roundtrip. Catch
    # it locally instead of at the driver.
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if {ka, kb} <= {"i", "u", "f"}:
            assert (ka in "iu") == (kb in "iu"), (
                f"{name}.{c}: dtype kind {a[c].dtype} != {b[c].dtype} "
                "(int/float drift would fail the driver's value hash)"
            )
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                ok = (math.isnan(x) and math.isnan(y)) or math.isclose(
                    x, y, rel_tol=1e-9, abs_tol=1e-9
                )
            else:
                ok = x == y or str(x) == str(y)
            assert ok, f"{name}.{c}[{i}]: {x!r} != {y!r}"


ORACLE_NAMES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_vs_oracle(ray_session, con, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    ray_df = _to_pandas(q(SF))
    sql_df = con.sql(sql).df()
    _compare(ray_df, sql_df, name)


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()) - {"crawl_trace"})


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    """Rows-only ops must at least execute and return a stable schema."""
    res = _to_pandas(entrymod.queries()[name](SF))
    assert res is not None and len(res.columns) > 0
    # determinism: run twice, same normalized content
    res2 = _to_pandas(entrymod.queries()[name](SF))
    pd.testing.assert_frame_equal(_normalize(res), _normalize(res2))


def test_clean_corpus_pipeline(ray_session):
    """Composite training-data prep: output has no exact-duplicate
    texts, carries the feature columns, and is deterministic."""
    import hashlib

    from engine.textops import clean_corpus

    df = clean_corpus(SF).to_pandas()
    assert set(df.columns) == {"doc_id", "text", "lang", "source",
                               "n_chars", "n_words", "lang_pred", "fingerprint"}
    md5s = df["text"].map(lambda s: hashlib.md5(s.encode()).hexdigest())
    assert md5s.is_unique
    assert (df["n_chars"] == df["text"].str.len()).all()
    df2 = clean_corpus(SF).to_pandas()
    pd.testing.assert_frame_equal(
        df.sort_values("doc_id").reset_index(drop=True),
        df2.sort_values("doc_id").reset_index(drop=True),
    )
