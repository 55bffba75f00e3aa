"""Example: large-scale training-data preparation over the documents
table — the LLM-data pipeline composed from this engine's operators.

Stages (all streaming Ray Data; nothing corpus-sized touches the
driver): exact + MinHash near dedup (clean_corpus), Gopher-style
quality gating, PII scrubbing, and sequence packing into fixed token
blocks. Point sf_dir at any directory holding a documents.parquet
with (doc_id, text, lang) — e.g. your crawl's extracted text.

Run: python examples/training_data_prep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import ray

from engine import textops


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    # 1. dedup (exact md5 + MinHash-LSH near-dup; keep-first reps)
    clean = textops.clean_corpus(sf_dir)
    n_clean = clean.count()

    # 2. quality gate (Gopher-style: word counts, mean word length,
    #    stop-word hits) — keep survivors only
    quality = textops.gopher_quality_filter(sf_dir)
    keep_ids = set(
        r["doc_id"] for r in quality.filter(lambda r: r["keep"]).take_all()
    )  # id-sized, not corpus-sized

    # 3. PII scrub the survivors
    scrubbed = textops.pii_scrub(sf_dir)

    # 4. pack into 256-token training blocks (distributed prefix sum)
    packed = textops.pack_sequences(sf_dir, block_tokens=256)

    out = tempfile.mkdtemp(prefix="training_data_")
    packed.write_parquet(out)  # partitioned output (resumable)

    print(f"clean corpus: {n_clean} docs after dedup")
    print(f"quality gate keeps {len(keep_ids)} docs")
    print(f"pii_scrub rows: {scrubbed.count()}")
    print(f"packed blocks written to {out}")
    ray.shutdown()


if __name__ == "__main__":
    main()
