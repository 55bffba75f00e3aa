"""Example: embedding similarity search over a corpus, both serving
shapes, end to end:

    embeddings ──ann_build_index──► index_dir/lists/list_id=*/ parquet
                                    + centroids.npy (IVF: partitioned
                                    by nearest k-means centroid)
    one query  ──ann_query_index──► reads ONLY the n_probe matching
                                    list partitions (partition
                                    pruning), exact cosine top-k
    query SET  ──knn_join─────────► top-k per query in ONE streaming
                                    pass over the corpus (the Q x d
                                    query matrix is broadcast; only
                                    Q*k candidates per block reach the
                                    final reduce)

The index is built once and persists as plain partitioned parquet —
at 100 TB the build is one shuffle-free write and each query touches
only its probed partitions, never the full corpus. The batch path
(knn_join) is the offline shape: score a whole query table (e.g.
near-dup candidate mining, eval-set retrieval) in a single pass.

Run: python examples/semantic_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import numpy as np

from engine import ops, textops


def build_and_query(sf_dir: str, index_dir: str, k: int = 5,
                    n_probe: int = 4):
    """Build the persisted IVF index, then answer one probe twice:
    pruned (n_probe lists — the production serving path) and
    full-probe (every list — provably equal to brute force). Returns
    (indexed_df, full_df) pandas frames of (vec_id, cosine)."""
    cents = textops.ann_build_index(sf_dir, index_dir)
    probe = np.arange(cents.shape[1], dtype=np.float64)
    indexed = textops.ann_query_index(index_dir, probe, k=k,
                                      n_probe=n_probe).to_pandas()
    full = textops.ann_query_index(index_dir, probe, k=k,
                                   n_probe=cents.shape[0]).to_pandas()
    return indexed, full


def batch_search(sf_dir: str, n_queries: int = 5, k: int = 5):
    """The batch shape: top-k neighbors for every vector of a query
    set in one corpus pass (ops.knn_join)."""
    return ops.knn_join(sf_dir, n_queries=n_queries, k=k).to_pandas()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    index_dir = tempfile.mkdtemp(prefix="ann_index_")
    indexed, full = build_and_query(sf_dir, index_dir)
    print(f"index at {index_dir} (partitioned parquet lists)")
    print("pruned-probe top-k:")
    print(indexed.to_string(index=False))
    print("full-probe top-k (== brute force):")
    print(full.to_string(index=False))
    batch = batch_search(sf_dir)
    print("batch k-NN join (5 queries x top-5):")
    print(batch.to_string(index=False))


if __name__ == "__main__":
    main()
