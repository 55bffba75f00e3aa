"""Example: the full 100-TB story as ONE program — crawl the web,
extract text, and prepare training data, each stage consuming the
previous stage's output:

    pages table ──run_crawl──────► fetched/ parquet (url, text, lang,
                                   status, discovery_seq, ...)
    fetched     ──read_parquet───► corpus Dataset (doc_id, text, lang,
                 (pruned columns)  source) — status-200, non-empty text
    corpus      ──build_training_data──► dedup (exact + MinHash-LSH)
                                         → Gopher gate → PII scrub
                                         → packed training blocks
                ──write_parquet──► partitioned output (resumable)

The corpus stage reads ONLY the columns it needs from the crawl's
partitioned fetched/ output (url/text/lang/status/discovery_seq — the
html payload never leaves storage), mints a deterministic int64
doc_id from the crawl's own discovery_seq, and hands the Dataset
straight to examples.training_data_prep.build_training_data — the
same chained pipeline, so nothing corpus- or id-sized ever touches
the driver. At real scale the only change is the input: swap the
hermetic synthetic pages table for `ray.data.read_parquet(<your
Common-Crawl-style dump>)`.

Run: python examples/crawl_to_training_data.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import tempfile

import pyarrow as pa

from engine.crawl import run_crawl
from engine.oracle import CrawlConfig
from engine.synth import SynthConfig, page_url, pages_table_from_documents


def crawl_corpus(sf_dir: str, out_dir: str):
    """Stage 1+2: crawl a pages table whose bodies are the sf_dir
    documents (hermetic stand-in for a live web), then expose the
    fetched text as a (doc_id, text, lang, source) corpus Dataset.
    Returns (corpus_dataset, crawl_result)."""
    import ray.data as rd

    cfg = SynthConfig(n_hosts=8, n_pages=600)
    pages = pages_table_from_documents(sf_dir, cfg)
    crawl = CrawlConfig(
        seeds=tuple(page_url(h, 0) for h in range(cfg.n_hosts)),
        budget_per_host=40,
        max_rounds=8,
    )
    res = run_crawl(pages, crawl, out_dir)

    # pruned read of the crawl's partitioned output: html stays in
    # storage; discovery_seq (deterministic, unique per url) becomes
    # the corpus doc_id so downstream dedup keeps the FIRST-discovered
    # copy of any duplicated page
    fetched = rd.read_parquet(
        f"{out_dir}/fetched",
        columns=["url", "text", "lang", "status", "discovery_seq"],
    )

    def as_corpus(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.and_(
            pc.equal(t["status"], 200), pc.greater(pc.utf8_length(t["text"]), 0)
        )
        t = t.filter(ok)
        return pa.table(
            {
                "doc_id": pa.compute.cast(t["discovery_seq"], pa.int64()),
                "text": t["text"],
                "lang": t["lang"],
                "source": pa.array(["crawl"] * t.num_rows, pa.string()),
            }
        )

    return fetched.map_batches(as_corpus, batch_format="pyarrow"), res


def crawl_to_training_data(sf_dir: str, crawl_out: str, block_tokens: int = 256):
    """The composed lazy pipeline: crawl → corpus → chained
    training-data prep. Returned unconsumed so callers pick the sink."""
    from training_data_prep import build_training_data

    corpus, res = crawl_corpus(sf_dir, crawl_out)
    return build_training_data(corpus, block_tokens=block_tokens), res


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    crawl_out = tempfile.mkdtemp(prefix="crawl_corpus_")
    packed, res = crawl_to_training_data(sf_dir, crawl_out)
    out = tempfile.mkdtemp(prefix="crawl_training_data_")
    packed.write_parquet(out)  # partitioned output (resumable)

    import pyarrow.dataset as pads

    n = pads.dataset(out).count_rows()
    print(
        f"crawled {res.total_fetched} pages in {res.rounds} rounds; "
        f"packed {n} docs into training blocks at {out}"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
