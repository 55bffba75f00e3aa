"""Production HTTP fetcher actor (SURVEY.md A13/A19) — NETWORK STUB.

This sandbox has no network, so the hermetic crawl fetches by lookup
into the pages table (engine.crawl). This module is the REAL fetch
stage's design for production use — the Ray-side plumbing (actor pool
signature, per-actor session/cookie state, batched async fetch,
retry/backoff policy, output schema identical to the hermetic path) is
complete and unit-tested against an injectable transport; only the
socket-level transport itself raises NotImplementedError here.

Reference semantics being re-expressed ([pub], SURVEY.md §2A):
Shaman.Http's async GET with cookies/redirects/retries and the
scraper's `Parallelism` concurrent requests — reshaped as
`ds.map_batches(FetcherActor, concurrency=(n,m), batch_size=B)` where
each actor holds one session (cookie jar) for its lifetime.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa


@dataclass
class RetryPolicy:
    max_attempts: int = 3
    backoff_base_s: float = 0.5
    retry_statuses: tuple = (429, 500, 502, 503, 504)


@dataclass
class CookieJar:
    """Minimal deterministic cookie state (per-actor, A19)."""

    cookies: dict = field(default_factory=dict)  # host -> {name: value}

    def set_from_header(self, host: str, header: str) -> None:
        part = header.split(";", 1)[0]
        if "=" in part:
            name, value = part.split("=", 1)
            self.cookies.setdefault(host, {})[name.strip()] = value.strip()

    def header_for(self, host: str) -> str:
        return "; ".join(f"{k}={v}" for k, v in sorted(self.cookies.get(host, {}).items()))


def _default_transport(url: str, headers: dict) -> tuple[int, dict, bytes]:
    """The socket-level GET. STUB: no network in this sandbox."""
    raise NotImplementedError(
        "no network in this environment — inject a transport "
        "(e.g. urllib/aiohttp wrapper) via FetcherActor(transport=...)"
    )


class FetcherActor:
    """Callable class for ds.map_batches(FetcherActor, concurrency=N):
    session state in __init__ (once per actor), fetch per batch.

    Output schema matches the hermetic fetch exactly:
    (url, warc_ts, html, text=None-to-fill, lang=None, status,
    fetch_round, depth, discovery_seq) — downstream extract/parse
    stages are shared with the hermetic path.
    """

    REDIRECT_STATUSES = (301, 302, 303, 307, 308)

    def __init__(self, transport=None, retry: RetryPolicy | None = None,
                 user_agent: str = "ray-crawl-engine/1.0", fetch_round: int = 0,
                 clock=None, max_redirects: int = 5,
                 initial_cookies: dict | None = None):
        self.transport = transport or _default_transport
        self.retry = retry or RetryPolicy()
        # initial_cookies: host -> {name: value}, typically the session
        # state a CrawlPolicy.initialize login flow produced
        # (CrawlResult.init_cookies.cookies) — copied so sibling actors
        # never share a mutable jar
        self.jar = CookieJar(
            {h: dict(kv) for h, kv in (initial_cookies or {}).items()}
        )
        self.user_agent = user_agent
        self.fetch_round = fetch_round
        self.clock = clock or (lambda: datetime.now(timezone.utc).replace(tzinfo=None))
        self.max_redirects = max_redirects

    def _attempt(self, url: str, host: str) -> tuple[int, dict, bytes]:
        """One url with retry/backoff; returns (status, headers, body)."""
        headers = {"User-Agent": self.user_agent}
        ck = self.jar.header_for(host)
        if ck:
            headers["Cookie"] = ck
        last_status = 0
        for attempt in range(self.retry.max_attempts):
            try:
                status, resp_headers, body = self.transport(url, headers)
            except NotImplementedError:
                raise
            except Exception:
                status, resp_headers, body = 599, {}, b""
            for k, v in resp_headers.items():
                if k.lower() == "set-cookie":
                    self.jar.set_from_header(host, v)
            if status not in self.retry.retry_statuses:
                return status, resp_headers, body
            last_status = status
            time.sleep(self.retry.backoff_base_s * (2 ** attempt))
        return last_status, {}, b""

    def _fetch_one(self, url: str, host: str) -> tuple[int, bytes]:
        """Follow up to max_redirects Location hops (Shaman.Http
        follows redirects within a fetch); cookies are applied and
        collected per hop against the hop's host. Returns the FINAL
        (status, body) — if the chain exceeds max_redirects the last
        3xx status is returned with an empty body."""
        from urllib.parse import urljoin, urlsplit

        cur, cur_host = url, host
        status, body = 0, b""
        for _hop in range(self.max_redirects + 1):
            status, resp_headers, body = self._attempt(cur, cur_host)
            loc = None
            if status in self.REDIRECT_STATUSES:
                for k, v in resp_headers.items():
                    if k.lower() == "location":
                        loc = v
                        break
            if loc is None:
                return status, body
            cur = urljoin(cur, loc)
            cur_host = urlsplit(cur).netloc or cur_host
        return status, b""

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        hosts = t["host"].to_pylist() if "host" in t.column_names else [
            u.split("/")[2] for u in urls
        ]
        statuses, bodies, tss = [], [], []
        for u, h in zip(urls, hosts):
            s, b = self._fetch_one(u, h)
            statuses.append(s)
            bodies.append(b)
            tss.append(self.clock())
        n = len(urls)
        return pa.table(
            {
                "url": t["url"],
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(bodies, pa.binary()),
                "text": pa.array([""] * n, pa.string()),
                "lang": pa.array([None] * n, pa.string()),
                "status": pa.array(statuses, pa.int32()),
                "fetch_round": pa.array(np.full(n, self.fetch_round, np.int32)),
                "depth": t["depth"] if "depth" in t.column_names
                else pa.array(np.zeros(n, np.int32)),
                "discovery_seq": t["discovery_seq"] if "discovery_seq" in t.column_names
                else pa.array(np.zeros(n, np.int64)),
            }
        )
