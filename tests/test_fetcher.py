"""FetcherActor plumbing tests (SURVEY.md A13/A19) with an injected
transport — the socket layer itself is stubbed in this sandbox."""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pytest

from engine.fetcher import CookieJar, FetcherActor, RetryPolicy, _default_transport
from engine.registry import BATCH_KERNELS, get_batch_kernel, get_scalar, register_batch_kernel


def _batch(urls):
    return pa.table({"url": pa.array(urls, pa.string()),
                     "host": pa.array([u.split("/")[2] for u in urls], pa.string())})


def test_transport_stub_raises():
    with pytest.raises(NotImplementedError):
        _default_transport("http://x/", {})


def test_fetcher_with_fake_transport_and_cookies():
    calls = []

    def transport(url, headers):
        calls.append((url, dict(headers)))
        if url.endswith("/login"):
            return 200, {"Set-Cookie": "sid=abc123; Path=/"}, b"<p>ok</p>"
        if url.endswith("/404"):
            return 404, {}, b""
        return 200, {}, b"<p>page</p>"

    f = FetcherActor(transport=transport, fetch_round=2,
                     clock=lambda: datetime(2024, 1, 1))
    out = f(_batch(["https://a.example/login", "https://a.example/next",
                    "https://a.example/404"]))
    assert out["status"].to_pylist() == [200, 200, 404]
    assert out["html"].to_pylist()[0] == b"<p>ok</p>"
    assert out["fetch_round"].to_pylist() == [2, 2, 2]
    # cookie set by /login is sent on the SAME actor's next request
    assert calls[1][1].get("Cookie") == "sid=abc123"
    assert out.schema.names == ["url", "warc_ts", "html", "text", "lang",
                                "status", "fetch_round", "depth", "discovery_seq"]


def test_fetcher_initial_cookies_preseed_session():
    """CrawlPolicy.initialize login state (CrawlResult.init_cookies)
    pre-seeds every fetcher session: a login-gated transport returns
    403 without the session cookie, 200 with — an actor constructed
    with initial_cookies fetches gated pages on its FIRST request,
    and sibling actors never share the (mutable) jar."""

    def gated_transport(url, headers):
        if headers.get("Cookie") == "session=SECRET123":
            return 200, {}, b"<p>members</p>"
        return 403, {}, b""

    cookies = {"gated.example": {"session": "SECRET123"}}
    f = FetcherActor(transport=gated_transport, initial_cookies=cookies,
                     clock=lambda: datetime(2024, 1, 1))
    out = f(_batch(["https://gated.example/dash"]))
    assert out["status"].to_pylist() == [200]
    assert out["html"].to_pylist() == [b"<p>members</p>"]
    # without the pre-seeded jar the same fetch is rejected
    bare = FetcherActor(transport=gated_transport,
                        clock=lambda: datetime(2024, 1, 1))
    assert bare(_batch(["https://gated.example/dash"]))["status"].to_pylist() == [403]
    # jar is copied, not shared: mutating one actor's jar leaves the
    # source dict and sibling actors untouched
    f.jar.set_from_header("gated.example", "session=OTHER")
    assert cookies["gated.example"]["session"] == "SECRET123"


def test_fetcher_retries_on_retryable_status():
    attempts = []

    def transport(url, headers):
        attempts.append(url)
        return (503, {}, b"") if len(attempts) < 3 else (200, {}, b"<p>late</p>")

    f = FetcherActor(transport=transport,
                     retry=RetryPolicy(max_attempts=4, backoff_base_s=0.0))
    out = f(_batch(["https://a.example/x"]))
    assert out["status"].to_pylist() == [200]
    assert len(attempts) == 3


def test_cookie_jar():
    j = CookieJar()
    j.set_from_header("h", "a=1; Path=/")
    j.set_from_header("h", "b=2")
    assert j.header_for("h") == "a=1; b=2"
    assert j.header_for("other") == ""


def test_registry():
    assert get_scalar("canonicalize_url")("HTTP://X.y/") == "http://x.y/"
    assert "extract_page" in BATCH_KERNELS

    def my_kernel(t):
        return t

    register_batch_kernel("custom_site_extractor", my_kernel)
    assert get_batch_kernel("custom_site_extractor") is my_kernel


def test_fetcher_follows_redirects():
    calls = []

    def transport(url, headers):
        calls.append(url)
        if url == "https://a.example/old":
            return 301, {"Location": "/mid"}, b""
        if url == "https://a.example/mid":
            return 302, {"Location": "https://b.example/new"}, b""
        if url == "https://b.example/new":
            return 200, {"Set-Cookie": "t=1"}, b"<p>final</p>"
        return 404, {}, b""

    f = FetcherActor(transport=transport, clock=lambda: datetime(2024, 1, 1))
    out = f(_batch(["https://a.example/old"]))
    # final hop's status/body; relative AND absolute Locations resolved
    assert out["status"].to_pylist() == [200]
    assert out["html"].to_pylist() == [b"<p>final</p>"]
    assert calls == ["https://a.example/old", "https://a.example/mid",
                     "https://b.example/new"]
    # cookie collected against the FINAL hop's host
    assert f.jar.header_for("b.example") == "t=1"


def test_fetcher_redirect_loop_capped():
    def transport(url, headers):
        return 301, {"Location": url}, b""

    f = FetcherActor(transport=transport, max_redirects=3,
                     clock=lambda: datetime(2024, 1, 1))
    out = f(_batch(["https://a.example/loop"]))
    # chain exceeded: last 3xx status surfaces with an empty body
    assert out["status"].to_pylist() == [301]
    assert out["html"].to_pylist() == [b""]
