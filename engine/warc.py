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


def record_id(url: str, ts, kind: str = "") -> str:
    return hashlib.sha1(f"{kind}|{url}|{_warc_ts(ts)}".encode()).hexdigest()


def payload_digest(payload: bytes) -> str:
    """WARC-Payload-Digest value per spec: sha1, base32 (RFC 4648)."""
    import base64

    return "sha1:" + base64.b32encode(hashlib.sha1(payload).digest()).decode()


def format_record(url: str, ts, payload: bytes,
                  content_type: str = "text/html",
                  record_type: str = "resource",
                  extra_headers: dict | None = None) -> bytes:
    """One WARC/1.0 record (uncompressed bytes). record_type
    'resource' (payload = raw content) or 'response'/'request'
    (payload = full HTTP message, Content-Type per spec)."""
    rid = record_id(url, ts, record_type if record_type != "resource" else "")
    if record_type == "response":
        content_type = "application/http; msgtype=response"
    elif record_type == "request":
        content_type = "application/http; msgtype=request"
    lines = [
        "WARC/1.0",
        f"WARC-Type: {record_type}",
        f"WARC-Record-ID: <urn:sha1:{rid}>",
        f"WARC-Date: {_warc_ts(ts)}",
        f"WARC-Target-URI: {url}",
    ]
    for k, v in (extra_headers or {}).items():
        lines.append(f"{k}: {v}")
    lines += [
        f"Content-Type: {content_type}",
        f"Content-Length: {len(payload)}",
        "",
        "",
    ]
    return "\r\n".join(lines).encode() + payload + b"\r\n\r\n"


def format_capture_pair(url: str, ts, html: bytes,
                        status: int = 200) -> tuple[bytes, bytes]:
    """Full-fidelity capture: (request, response) record pair — the
    layout real WARC crawlers write. The response payload is the HTTP
    message (status line + minimal headers + body) and carries
    WARC-Payload-Digest over the BODY; the request record links to the
    response via WARC-Concurrent-To. Deterministic: ids derive from
    (kind, url, ts)."""
    path = "/" + url.split("://", 1)[-1].split("/", 1)[-1] if "/" in url.split("://", 1)[-1] else "/"
    host = url.split("://", 1)[-1].split("/", 1)[0]
    req_payload = (
        f"GET {path} HTTP/1.1\r\nHost: {host}\r\n"
        f"User-Agent: ray-crawl-engine/1.0\r\n\r\n"
    ).encode()
    reason = {200: "OK", 301: "Moved Permanently", 302: "Found",
              404: "Not Found"}.get(status, "OK")
    resp_payload = (
        f"HTTP/1.1 {status} {reason}\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode() + html
    resp_id = record_id(url, ts, "response")
    resp = format_record(
        url, ts, resp_payload, record_type="response",
        extra_headers={"WARC-Payload-Digest": payload_digest(html)},
    )
    req = format_record(
        url, ts, req_payload, record_type="request",
        extra_headers={"WARC-Concurrent-To": f"<urn:sha1:{resp_id}>"},
    )
    return req, resp


def write_warc_batch(t: pa.Table, out_dir: str, mode: str = "resource") -> pa.Table:
    """map_batches stage: write this batch as one .warc.gz (one gzip
    member per record) + matching CDX parquet part; returns the index
    rows. Deterministic file names from all urls in the batch.

    mode="resource": one resource record per page (compact archive).
    mode="capture": request+response record PAIR per page with
    WARC-Payload-Digest — the full-fidelity layout real crawlers
    write; the CDX rows index the RESPONSE members."""
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    urls = t["url"].to_pylist()
    tss = t["warc_ts"].to_pylist()
    htmls = t["html"].to_pylist()
    statuses = (t["status"].to_pylist() if "status" in t.column_names
                else [200] * len(urls))
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

    def _member(rec: bytes) -> tuple[int, int]:
        start = buf.tell()
        # one gzip member per record -> random access by (offset, length)
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        return start, buf.tell() - start

    for u, ts, h, st in zip(urls, tss, htmls, statuses):
        body = h if h is not None else b""
        if mode == "capture":
            req, resp = format_capture_pair(u, ts, body, status=st or 200)
            _member(req)
            off, ln = _member(resp)  # CDX indexes the response member
        else:
            off, ln = _member(format_record(u, ts, body))
        offsets.append(off)
        lengths.append(ln)
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


def write_warc_datasink(fetched_ds, out_dir: str, mode: str = "resource") -> int:
    """Distributed WARC export of a fetched/pages dataset. Returns the
    number of CDX-indexed records written (pages; capture mode writes
    2 WARC records per page)."""
    idx = fetched_ds.map_batches(
        lambda t, _o=out_dir, _m=mode: write_warc_batch(t, _o, mode=_m),
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


def split_warc_members(data: bytes):
    """Split a multi-member .warc.gz byte string into parsed records
    (the in-memory core of iter_warc_records, reusable from a
    map_batches stage over read_binary_files blocks)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        rec = d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        head, _, rest = rec.partition(b"\r\n\r\n")
        lines = head.decode().split("\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(": ")
            headers[k] = v
        yield {"version": lines[0], "headers": headers,
               "payload": rest[: int(headers.get("Content-Length", 0))]}
        pos += consumed


def warc_pages_dataset(warc_dir: str, verify_digest: bool = True):
    """Distributed WARC ingest — archive back to crawlable pages table:
    `read_binary_files` over the .warc.gz shards (one Ray block per
    shard — the write side's partitioned layout IS the read
    parallelism) → per-file gzip-member split → one row per
    resource/response record with columns (url, warc_ts, html, status).

    Capture-mode response records are unwrapped to the HTTP body and,
    when verify_digest, checked against their WARC-Payload-Digest so
    corruption surfaces at ingest. Request records are skipped.

    The shard list fans out as items and each task reads its own file
    raw (read_binary_files would auto-gunzip on the .gz extension and
    destroy the per-record member framing; files live on shared
    storage in a real cluster, so per-task open is the normal path)."""
    import ray.data as rd

    def split(t: pa.Table) -> pa.Table:
        urls, tss, htmls, statuses = [], [], [], []
        for path in t["path"].to_pylist():
            blob = pathlib.Path(path).read_bytes()
            for rec in split_warc_members(blob):
                h = rec["headers"]
                rtype = h.get("WARC-Type", "")
                if rtype not in ("resource", "response"):
                    continue
                body = rec["payload"]
                status = 200
                if rtype == "response":
                    http_head, _, body = body.partition(b"\r\n\r\n")
                    try:
                        status = int(http_head.split(b" ", 2)[1])
                    except (IndexError, ValueError):
                        status = 200
                    want = h.get("WARC-Payload-Digest")
                    if verify_digest and want and payload_digest(body) != want:
                        raise ValueError(
                            f"WARC payload digest mismatch for "
                            f"{h.get('WARC-Target-URI')!r}"
                        )
                urls.append(h.get("WARC-Target-URI", ""))
                tss.append(datetime.strptime(
                    h["WARC-Date"], "%Y-%m-%dT%H:%M:%SZ"))
                htmls.append(body)
                statuses.append(status)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "status": pa.array(statuses, pa.int32()),
            }
        )

    files = [{"path": str(p)}
             for p in sorted(pathlib.Path(warc_dir).glob("*.warc.gz"))]
    return rd.from_items(files).map_batches(
        split, batch_format="pyarrow", batch_size=1
    )


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
