"""Frozen Arrow schemas for the engine's logical tables (SURVEY.md §1.2).

Schemas are declared, never inferred (inference is allowed only at the
read_parquet boundary, where parquet already carries one). The `pages`
schema is the mandated input shape (BASELINE.json:15 input_hint):
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
"""

from __future__ import annotations

import pyarrow as pa

# Primary input: Common-Crawl-style web pages (BASELINE.json:15).
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Frontier of URLs to (maybe) fetch. discovery_seq is a PURE FUNCTION of
# (depth, url): (depth << 48) | first-6-bytes of sha1(canonical url) —
# deterministic at any parallelism (SURVEY.md §4.2 design 2). Ordering
# ties are broken by url_key in every sort.
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("url_key", pa.binary(20)),  # sha1 of canonical url (north_star)
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("discovery_seq", pa.int64()),
        ("parent_url", pa.string()),
    ]
)

# Per-round fetch output = pages + fetch metadata (archival form; the
# parquet files under out/fetched/round=R/ are our WARC+CDX analogue).
FETCHED = pa.schema(
    list(PAGES)
    + [
        ("status", pa.int32()),
        ("fetch_round", pa.int32()),
        ("depth", pa.int32()),
        ("discovery_seq", pa.int64()),
    ]
)

ROBOTS = pa.schema(
    [
        ("host", pa.string()),
        ("fetched_ts", pa.timestamp("us")),
        ("rules", pa.string()),
        ("crawl_delay_ms", pa.int32()),
    ]
)

CRAWL_LOG = pa.schema(
    [
        ("round", pa.int32()),
        ("partition", pa.int32()),
        ("urls_in", pa.int64()),
        ("fetched", pa.int64()),
        ("errors", pa.int64()),
        ("new_links", pa.int64()),
        ("bytes", pa.int64()),
        ("wall_ms", pa.int64()),
    ]
)

# Mid-pipeline: one row per extracted link before canonicalize/dedup.
LINKS = pa.schema(
    [
        ("url", pa.string()),  # raw href resolved against parent
        ("kind", pa.string()),  # "link" | "prereq"
        ("parent_url", pa.string()),
        ("parent_depth", pa.int32()),
        ("link_index", pa.int32()),
    ]
)
