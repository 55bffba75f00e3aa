"""WARC sink/reader tests (SURVEY.md A3/A4): roundtrip, random access
via the CDX index, determinism."""

from __future__ import annotations

import pathlib
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.synth import SynthConfig, build_pages_table
from engine.warc import (
    format_record,
    iter_warc_records,
    read_warc_record,
    write_warc_batch,
    write_warc_datasink,
)


@pytest.fixture(scope="module")
def pages():
    return build_pages_table(SynthConfig(n_hosts=3, n_pages=40))


def test_warc_roundtrip_and_random_access(pages, tmp_path):
    out = tmp_path / "warc"
    idx = write_warc_batch(pages, str(out))
    assert idx.num_rows == 40
    rows = idx.to_pylist()
    # random access: every record recoverable by (filename, offset, length)
    for i in (0, 7, 39):
        r = rows[i]
        rec = read_warc_record(str(out), r["filename"], r["offset"], r["length"])
        assert rec["version"] == "WARC/1.0"
        assert rec["headers"]["WARC-Target-URI"] == pages["url"][i].as_py()
        assert rec["payload"] == pages["html"][i].as_py()
    # sequential scan finds all records in order
    warcs = list(out.glob("*.warc.gz"))
    assert len(warcs) == 1
    got = [r["headers"]["WARC-Target-URI"] for r in iter_warc_records(str(warcs[0]))]
    assert got == pages["url"].to_pylist()


def test_warc_deterministic(pages, tmp_path):
    a = write_warc_batch(pages, str(tmp_path / "a"))
    b = write_warc_batch(pages, str(tmp_path / "b"))
    fa = next((tmp_path / "a").glob("*.warc.gz"))
    fb = next((tmp_path / "b").glob("*.warc.gz"))
    assert fa.read_bytes() == fb.read_bytes()  # byte-stable archive
    assert format_record("http://x/", None, b"p") == format_record("http://x/", None, b"p")


def test_warc_datasink_distributed(ray_session, pages, tmp_path):
    import ray.data as rd

    n = write_warc_datasink(rd.from_arrow(pages).repartition(4), str(tmp_path / "w"))
    assert n == 40
    # cdx parquet parts cover every url exactly once
    urls = []
    for p in (tmp_path / "w").glob("cdx-*.parquet"):
        urls.extend(pq.read_table(p, columns=["url"])["url"].to_pylist())
    assert sorted(urls) == sorted(pages["url"].to_pylist())


def test_warc_capture_mode_roundtrip(ray_session, tmp_path):
    """Full-fidelity capture: request+response pairs, payload digest
    verifiable, CDX random access lands on the response record."""
    import base64
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from engine.warc import (iter_warc_records, payload_digest,
                             read_warc_record, write_warc_datasink)

    rows = [
        {"url": f"https://h.example/p/{i}", "warc_ts": datetime(2024, 1, 1, 0, 0, i),
         "html": f"<p>body {i}</p>".encode(), "status": 200}
        for i in range(5)
    ]
    tbl = pa.Table.from_pylist(rows)
    out = str(tmp_path / "warc")
    n = write_warc_datasink(rd.from_arrow(tbl), out, mode="capture")
    assert n == 5
    import pathlib

    import pyarrow.parquet as pq
    idx = pa.concat_tables([pq.read_table(p) for p in pathlib.Path(out).glob("cdx-*.parquet")])
    assert idx.num_rows == 5
    # random access via CDX -> response record with verifiable digest
    r0 = idx.to_pylist()[0]
    rec = read_warc_record(out, r0["filename"], r0["offset"], r0["length"])
    assert rec["headers"]["WARC-Type"] == "response"
    body = rec["payload"].split(b"\r\n\r\n", 1)[1]
    assert rec["headers"]["WARC-Payload-Digest"] == payload_digest(body)
    assert rec["headers"]["WARC-Payload-Digest"] == (
        "sha1:" + base64.b32encode(hashlib.sha1(body).digest()).decode())
    # sequential scan sees request+response pairs, linked by id
    recs = list(iter_warc_records(str(pathlib.Path(out) / r0["filename"])))
    assert len(recs) == 10
    kinds = [r["headers"]["WARC-Type"] for r in recs]
    assert kinds == ["request", "response"] * 5
    assert recs[0]["headers"]["WARC-Concurrent-To"] == recs[1]["headers"]["WARC-Record-ID"]
    assert recs[0]["payload"].startswith(b"GET /p/")


def test_warc_streaming_ingest_soak(ray_session, tmp_path):
    """r5 (VERDICT item 10): 10k pages -> write_warc_datasink (capture
    mode) -> distributed warc_pages_dataset ingest; round-trip count,
    per-url html byte equality, digest verification, and the ingested
    table is CRAWLABLE (run one crawl round over it)."""
    import ray.data as rd

    from engine.crawl import run_crawl
    from engine.oracle import CrawlConfig
    from engine.synth import SynthConfig, build_pages_table, page_url
    from engine.warc import warc_pages_dataset, write_warc_datasink

    n = 10_000
    pages = build_pages_table(SynthConfig(n_hosts=20, n_pages=n))
    out = str(tmp_path / "warc")
    written = write_warc_datasink(rd.from_arrow(pages), out, mode="capture")
    assert written == n

    back = warc_pages_dataset(out)  # digest-verifying ingest
    got = back.to_pandas().sort_values("url").reset_index(drop=True)
    src = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(got) == n
    assert list(got["url"]) == list(src["url"])
    assert all(bytes(a) == bytes(b) for a, b in zip(got["html"], src["html"]))
    assert (got["status"] == 200).all()

    # ingested table is crawlable: one budget-limited round
    ingested = pa.table({
        "url": pa.array(got["url"], pa.string()),
        "warc_ts": pa.array(got["warc_ts"], pa.timestamp("us")),
        "html": pa.array([bytes(x) for x in got["html"]], pa.binary()),
        "text": pa.array([""] * n, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })
    crawl = CrawlConfig(seeds=(page_url(0, 0),), budget_per_host=2,
                        max_rounds=1)
    res = run_crawl(ingested, crawl, str(tmp_path / "crawl"))
    assert res.total_fetched >= 1


def test_warc_ingest_detects_corruption(ray_session, tmp_path):
    import pathlib

    import ray.data as rd

    from engine.synth import SynthConfig, build_pages_table
    from engine.warc import warc_pages_dataset, write_warc_datasink

    pages = build_pages_table(SynthConfig(n_hosts=2, n_pages=20))
    out = str(tmp_path / "warc")
    write_warc_datasink(rd.from_arrow(pages), out, mode="capture")
    # flip one byte inside the LAST gzip member's payload region by
    # re-writing a member: simpler — regenerate one shard with a
    # poisoned digest header
    shard = sorted(pathlib.Path(out).glob("*.warc.gz"))[0]
    import gzip as _gz

    from engine.warc import split_warc_members

    recs = list(split_warc_members(shard.read_bytes()))
    # rebuild the shard, corrupting the first response body
    import io

    buf = io.BytesIO()
    for r in recs:
        head = [r["version"]]
        head += [f"{k}: {v}" for k, v in r["headers"].items()]
        payload = r["payload"]
        if r["headers"]["WARC-Type"] == "response":
            payload = payload.replace(b"HTTP/1.1", b"HTTP/1.0", 1) + b"X"
        head[-1] = f"Content-Length: {len(payload)}"
        rec = "\r\n".join(head).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"
        with _gz.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
    shard.write_bytes(buf.getvalue())
    import pytest as _pt

    with _pt.raises(Exception):
        warc_pages_dataset(out).to_pandas()
