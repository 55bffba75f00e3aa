"""ANN / clustering over the embeddings table: distributed k-means,
the persisted partitioned IVF index, and the exactness property that
probing ALL lists recovers the brute-force answer."""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_kmeans_assign_deterministic(ray_session):
    from engine import textops

    a = textops.kmeans_assign(SF, k=8, iters=2).to_pandas().sort_values("vec_id")
    b = textops.kmeans_assign(SF, k=8, iters=2).to_pandas().sort_values("vec_id")
    assert len(a) > 0
    assert a["cluster_id"].between(0, 7).all()
    assert a["cluster_id"].tolist() == b["cluster_id"].tolist()
    # clustering is non-degenerate: more than one cluster used
    assert a["cluster_id"].nunique() > 1


def test_ann_index_all_probe_equals_bruteforce(ray_session, tmp_path):
    """Probing every list of the persisted index = exact search: must
    return the same top-k vec_ids as the brute-force scan."""
    from engine import ops, textops

    idx = str(tmp_path / "ivf")
    cents = textops.ann_build_index(SF, idx, n_centroids=8, kmeans_iters=2)
    probe = np.arange(cents.shape[1], dtype=np.float64)
    got = textops.ann_query_index(idx, probe, k=10, n_probe=8).to_pandas()
    brute = ops.vector_topk(SF, k=10).to_pandas()
    assert got["vec_id"].tolist() == brute["vec_id"].tolist()
    # partitioned layout exists on disk (one dir per list)
    lists = sorted(p.name for p in (pathlib.Path(idx) / "lists").iterdir())
    assert all(n.startswith("list_id=") for n in lists)
    assert len(lists) > 1


def test_ann_topk_full_equals_vector_topk(ray_session):
    """The oracle-checked full-probe entry: reading every index
    partition with the shared fixed-point scoring kernel must
    reproduce the brute-force result bit-exactly."""
    from engine import ops, textops

    full = textops.ann_topk_full(SF, k=10).to_pandas()
    brute = ops.vector_topk(SF, k=10).to_pandas()
    assert full["vec_id"].tolist() == brute["vec_id"].tolist()
    assert full["cosine"].tolist() == brute["cosine"].tolist()


def test_ann_indexed_query_entry(ray_session):
    from engine import textops

    out = textops.ann_topk_indexed(SF, k=10, n_probe=4).to_pandas()
    assert len(out) == 10
    # second call reuses the cached index (same result)
    again = textops.ann_topk_indexed(SF, k=10, n_probe=4).to_pandas()
    assert out["vec_id"].tolist() == again["vec_id"].tolist()
