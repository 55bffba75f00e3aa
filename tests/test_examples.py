"""The runnable examples are part of the product surface — pin their
behavior so the showcase pipeline cannot regress into driver-side
materialization or dtype drift (VERDICT r4, next-round item 1)."""

from __future__ import annotations

import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

SF = "/root/testdata/sf0.001"


def test_training_data_prep_chained(ray_session, tmp_path):
    """One chained lazy pipeline: dedup → gopher gate → pii scrub →
    pack. Output count and schema pinned; doc_id must stay int64 end
    to end (the empty-pandas-block schema-loss regression)."""
    from training_data_prep import build_training_data

    packed = build_training_data(SF, block_tokens=256)
    out = str(tmp_path / "packed")
    packed.write_parquet(out)

    import pyarrow.dataset as pads

    d = pads.dataset(out)
    tbl = d.to_table()
    # pinned: 600 sf0.001 docs -> dedup -> gopher keep -> 306 packed
    assert tbl.num_rows == 306
    schema = {f.name: f.type for f in d.schema}
    assert schema["doc_id"] == pa.int64()
    assert {"doc_id", "n_tokens", "token_offset", "block_start",
            "block_end"} <= set(schema)
    # packing invariants: offsets strictly increase in doc_id order,
    # each doc's block range covers its token span
    rows = tbl.sort_by("doc_id").to_pylist()
    off = 0
    for r in rows:
        assert r["token_offset"] == off
        assert r["block_start"] == off // 256
        assert r["block_end"] == (off + r["n_tokens"] - 1) // 256
        off += r["n_tokens"]


def test_clean_corpus_preserves_int64_doc_id(ray_session):
    """Regression (r5): all-empty pandas group outputs are schema-less
    to Ray and degraded doc_id to double through the anti-join union;
    losers_in_bucket now returns pinned-schema Arrow tables."""
    from engine import textops

    clean = textops.clean_corpus(SF)
    assert dict(zip(clean.schema().names,
                    clean.schema().types))["doc_id"] == pa.int64()
