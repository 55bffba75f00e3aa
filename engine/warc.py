"""True-WARC datasink + reader (SURVEY.md A3/A4 optional extra).

The engine's primary archive is parquet (fetched/round=R — archive and
index in one), but the reference is a WARC-writing crawler
[pub:Shaman.Scraping WebsiteScraper.cs — WARC + CDX side files], so a
real WARC/1.0 sink is provided: one gzip member per record (the
standard layout that makes records individually seekable), plus a
CDX-style parquet index (url, ts, filename, offset, length) exactly in
the spirit of the reference's WarcItem random-access index.

Determinism: record ids are derived from sha1(url, ts) — no uuid4, no
wall clock — so archives are byte-stable and resumable.

Scale: write_warc_datasink runs as map_batches over the fetched
dataset; each task writes its own .warc.gz + index part (same
partitioned-output pattern as the crawl's fetch stage).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import pathlib
import zlib
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq


def _warc_ts(ts) -> str:
    if ts is None:
        ts = datetime(1970, 1, 1)
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def format_record(url: str, ts, payload: bytes,
                  content_type: str = "text/html") -> bytes:
    """One WARC/1.0 'resource' record (uncompressed bytes)."""
    rid = hashlib.sha1(f"{url}|{_warc_ts(ts)}".encode()).hexdigest()
    headers = (
        "WARC/1.0\r\n"
        "WARC-Type: resource\r\n"
        f"WARC-Record-ID: <urn:sha1:{rid}>\r\n"
        f"WARC-Date: {_warc_ts(ts)}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    return headers + payload + b"\r\n\r\n"


def write_warc_batch(t: pa.Table, out_dir: str) -> pa.Table:
    """map_batches stage: write this batch as one .warc.gz (one gzip
    member per record) + matching CDX parquet part; returns the index
    rows. Deterministic file names from the first url."""
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    urls = t["url"].to_pylist()
    tss = t["warc_ts"].to_pylist()
    htmls = t["html"].to_pylist()
    if not urls:
        return pa.table(
            {"url": pa.array([], pa.string()),
             "warc_ts": pa.array([], pa.timestamp("us")),
             "filename": pa.array([], pa.string()),
             "offset": pa.array([], pa.int64()),
             "length": pa.array([], pa.int64())}
        )
    h = hashlib.sha1()
    for u in urls:
        h.update(u.encode())
        h.update(b"\x00")
    tag = h.hexdigest()[:16]  # ALL urls: two batches sharing a first
    # url (duplicate input rows) must not collide and overwrite parts
    fname = f"part-{tag}-{len(urls)}.warc.gz"
    buf = io.BytesIO()
    offsets, lengths = [], []
    for u, ts, h in zip(urls, tss, htmls):
        rec = format_record(u, ts, h if h is not None else b"")
        start = buf.tell()
        # one gzip member per record -> random access by (offset, length)
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        offsets.append(start)
        lengths.append(buf.tell() - start)
    tmp = out / (fname + ".tmp")
    tmp.write_bytes(buf.getvalue())
    tmp.replace(out / fname)
    idx = pa.table(
        {
            "url": t["url"],
            "warc_ts": t["warc_ts"],
            "filename": pa.array([fname] * len(urls), pa.string()),
            "offset": pa.array(offsets, pa.int64()),
            "length": pa.array(lengths, pa.int64()),
        }
    )
    pq.write_table(idx, out / f"cdx-{tag}.parquet")
    return idx


def write_warc_datasink(fetched_ds, out_dir: str) -> int:
    """Distributed WARC export of a fetched/pages dataset. Returns the
    number of records written."""
    idx = fetched_ds.map_batches(
        lambda t, _o=out_dir: write_warc_batch(t, _o),
        batch_format="pyarrow", batch_size=None,
    )
    return idx.count()


def read_warc_record(warc_dir: str, filename: str, offset: int, length: int) -> dict:
    """Random-access read of one record via its CDX row (the WarcItem
    pattern): seek, decompress one member, parse headers."""
    raw = pathlib.Path(warc_dir, filename).read_bytes()[offset : offset + length]
    rec = gzip.decompress(raw)
    head, _, rest = rec.partition(b"\r\n\r\n")
    headers: dict[str, str] = {}
    lines = head.decode().split("\r\n")
    for line in lines[1:]:
        k, _, v = line.partition(": ")
        headers[k] = v
    payload = rest[: int(headers["Content-Length"])]
    return {"version": lines[0], "headers": headers, "payload": payload}


def iter_warc_records(path: str):
    """Sequential scan of a multi-member .warc.gz (ingest path)."""
    data = pathlib.Path(path).read_bytes()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        rec = d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        head, _, rest = rec.partition(b"\r\n\r\n")
        lines = head.decode().split("\r\n")
        headers = {}
        for line in lines[1:]:
            k, _, v = line.partition(": ")
            headers[k] = v
        yield {"version": lines[0], "headers": headers,
               "payload": rest[: int(headers.get("Content-Length", 0))]}
        pos += consumed
