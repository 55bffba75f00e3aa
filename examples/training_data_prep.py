"""Example: large-scale training-data preparation over the documents
table — the LLM-data pipeline composed from this engine's operators,
as ONE chained streaming Ray Data pipeline.

    documents ──clean_corpus──► deduped (exact md5 + MinHash-LSH)
              ──gopher gate───► survivors (vectorized keep mask,
                                same pass — no re-read, no id set
                                on the driver)
              ──pii_scrub─────► redacted text
              ──pack_sequences► fixed-token training blocks
              ──write_parquet─► partitioned output (resumable)

Every stage consumes the previous stage's Dataset (the textops ops all
accept a Dataset in place of sf_dir), so the corpus is read from
storage exactly once and nothing corpus- or id-sized ever touches the
driver: the quality gate is a map_batches filter on the Gopher `keep`
mask, not a take_all()ed id set, and packing's only driver state is
the O(#ranges) prefix-sum base.

Point sf_dir at any directory holding a documents.parquet with
(doc_id, text, lang, source) — e.g. your crawl's extracted text.

Run: python examples/training_data_prep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import pyarrow as pa

from engine import textops


def build_training_data(sf_dir: str, block_tokens: int = 256):
    """The chained pipeline, returned unconsumed (lazy) so callers
    choose the sink. Stages share one lineage: dedup's shuffles and
    the pack groupby are the only all-to-alls; the gate and scrub are
    stateless map_batches in between."""
    # 1. exact + MinHash near dedup, language/quality features attached
    clean = textops.clean_corpus(sf_dir)

    # 2. Gopher quality gate — filter on the vectorized keep mask in
    #    the same pass (gopher_features is the shared kernel; no
    #    second corpus read, no driver-side id set)
    def gate(t: pa.Table) -> pa.Table:
        feats = textops.gopher_features(t.select(["doc_id", "text"]))
        return t.filter(feats["keep"])

    survivors = clean.map_batches(gate, batch_format="pyarrow")

    # 3. PII scrub the survivors (compiled-regex map_batches)
    scrubbed = textops.pii_scrub(survivors)

    # 4. pack into fixed-token training blocks (distributed prefix sum)
    def as_docs(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "text": t["clean_text"]})

    return textops.pack_sequences(
        scrubbed.map_batches(as_docs, batch_format="pyarrow"),
        block_tokens=block_tokens,
    )


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    packed = build_training_data(sf_dir)
    out = tempfile.mkdtemp(prefix="training_data_")
    packed.write_parquet(out)  # partitioned output (resumable)

    import pyarrow.dataset as pads

    n = pads.dataset(out).count_rows()
    print(f"packed {n} docs into training blocks at {out}")
    ray.shutdown()


if __name__ == "__main__":
    main()
