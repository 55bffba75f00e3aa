"""Round-3 scale-shape regressions for the dedup family.

1. dedup_embedding vs a driver-side brute-force all-pairs oracle:
   identical keep/drop decisions on (a) the real sf0.001 embeddings
   (no near-dups at 0.95 — a pure no-false-positive check) and (b) a
   planted-cluster table (clusters at cosine >= 0.999, threshold
   0.99). The banded-LSH implementation must reproduce the exact
   rep assignment (min qualifying smaller vec_id) the O(n^2)
   reference computes.
2. dedup_simhash two-level re-blocking: a boilerplate cluster bigger
   than the first-level star cap must still yield EXACTLY the pairs a
   brute-force hamming scan finds (the pigeonhole argument is exact
   through both levels).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _bruteforce_reps(mat: np.ndarray, ids: np.ndarray, threshold: float):
    """O(n^2) reference: for each vector (ascending vec_id), rep = the
    smallest earlier vec_id with cosine >= threshold, computed with
    the SAME per-pair float64 kernel the engine verifies with."""
    from engine.textops import _cosine_pair

    order = np.argsort(ids)
    ids_s, mat_s = ids[order], mat[order]
    out = {}
    for i in range(len(ids_s)):
        rep, c = int(ids_s[i]), 1.0
        for j in range(i):
            v = _cosine_pair(mat_s[j], mat_s[i])
            if v >= threshold:
                rep, c = int(ids_s[j]), round(v, 4)
                break
        out[int(ids_s[i])] = (rep, c, rep != int(ids_s[i]))
    return out


def _check_against_bruteforce(sf_dir: str, threshold: float, ray_session):
    from engine import textops

    got = (
        textops.dedup_embedding(sf_dir, threshold=threshold)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    want = _bruteforce_reps(mat, ids, threshold)
    assert len(got) == len(ids)
    for row in got.itertuples():
        w_rep, w_cos, w_dup = want[row.vec_id]
        assert row.rep_id == w_rep, (row.vec_id, row.rep_id, w_rep)
        assert row.is_dup == w_dup
        assert abs(row.cosine_to_rep - w_cos) < 1e-9


def test_dedup_embedding_bruteforce_real_data(ray_session):
    # sf0.001 has no pair above cosine 0.52 -> every vector is its own
    # rep; any dup here would be an LSH/verify false positive
    _check_against_bruteforce(SF, 0.95, ray_session)


def test_dedup_embedding_bruteforce_planted(ray_session, tmp_path):
    rng = np.random.default_rng(123)
    dim = 32
    vecs = []
    for ci, sz in enumerate([2, 3, 4, 5, 10]):
        b = rng.standard_normal(dim)
        b /= np.linalg.norm(b)
        for _ in range(sz):
            vecs.append(b + rng.standard_normal(dim) * 0.005)
    vecs.extend(rng.standard_normal((200, dim)))
    vecs = np.asarray(vecs, dtype=np.float32)
    ids = np.arange(len(vecs), dtype=np.int64)
    perm = rng.permutation(len(vecs))  # row order != id order
    tbl = pa.table(
        {
            "vec_id": pa.array(ids[perm]),
            "embedding": pa.array(
                [v for v in vecs[perm]], pa.list_(pa.float32())
            ),
        }
    )
    d = tmp_path / "planted"
    d.mkdir()
    pq.write_table(tbl, d / "embeddings.parquet")
    _check_against_bruteforce(str(d), 0.99, ray_session)

    # sanity: the planted clusters actually produce dups
    from engine import textops

    got = textops.dedup_embedding(str(d), threshold=0.99).to_pandas()
    assert got["is_dup"].sum() == (2 - 1) + (3 - 1) + (4 - 1) + (5 - 1) + (10 - 1)


def test_simhash_two_level_boilerplate_cluster(ray_session, tmp_path):
    """10^3 near-identical docs (cluster >> first-level star cap):
    the two-level re-block must find exactly the pairs brute force
    finds — no star-cap recall loss."""
    from engine import textops
    from engine.textops import _MAX_LSH_BUCKET, _popcount64, _simhash64

    rng = np.random.default_rng(7)
    base = ["alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon"] * 1
    extra = ["phi", "chi", "psi", "omega", "one", "two", "three", "four"]
    n = _MAX_LSH_BUCKET + 488  # 1000 with the sandbox cap of 512
    texts = []
    for i in range(n):
        words = base[0].split()
        if i % 3 == 1:
            words[i % len(words)] = extra[i % len(extra)]
        elif i % 3 == 2:
            words.append(extra[(i * 5) % len(extra)])
        texts.append(" ".join(words))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    d = tmp_path / "boiler"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")

    got = textops.dedup_simhash(str(d)).to_pandas()
    got_pairs = {(a, b) for a, b in zip(got["doc_a"], got["doc_b"])}

    hs = np.array(
        [np.uint64(_simhash64(s)) for s in texts], dtype=np.uint64
    )
    ham = _popcount64(hs[:, None] ^ hs[None, :])
    ii, jj = np.nonzero(ham <= 3)
    want_pairs = {(int(a), int(b)) for a, b in zip(ii, jj) if a < b}
    assert len(want_pairs) > 1000  # the cluster is real
    assert got_pairs == want_pairs
    # hamming values agree too
    want_ham = {(int(a), int(b)): int(ham[a, b]) for a, b in want_pairs}
    for row in got.itertuples():
        assert want_ham[(row.doc_a, row.doc_b)] == row.hamming
