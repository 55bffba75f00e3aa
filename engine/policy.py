"""CrawlPolicy — the user-extension surface (SURVEY.md §2A A10-A12, A30).

The reference exposes delegates on the scraper object (ShouldScrape,
RewriteLink, CollectAdditionalLinks — [pub:WebsiteScraper.cs], SURVEY.md
§2A); here the same hooks are a frozen dataclass of picklable callables
passed into pipeline construction, applied batch-side.

Hook contract (all optional):
  rewrite(url:str) -> str           A11 — applied to raw resolved hrefs
                                    BEFORE canonicalization.
  should_scrape(url:str, is_prerequisite:bool) -> bool | None
                                    A10 — None means "use built-ins".
  priority(url:str, depth:int) -> int
                                    north_star "priority frontier" —
                                    evaluated on the CANONICAL url at
                                    enqueue time; lower schedules
                                    earlier within a host's per-round
                                    budget (total order is
                                    (priority, discovery_seq, url_key),
                                    engine.frontier). Default 0.
  collect_links(url:str, text:str) -> list[str]
                                    A30 CollectAdditionalLinks — extra
                                    raw urls yielded per fetched page
                                    (beyond <a href> extraction), e.g.
                                    pagination urls synthesized from
                                    page content; they enter the same
                                    rewrite→canonicalize→filter chain
                                    with kind="extra".
  collect_links_html(url:str, html:bytes|str) -> list[str]
                                    A30 variant over the RAW page body
                                    — for JSON-cursor pagination (parse
                                    the body, yield the next-cursor
                                    url) and CSS-selector link
                                    collection (engine.css
                                    .selector_collect_links). Same
                                    chain, same kind="extra"; when both
                                    hooks are set, text-hook urls come
                                    first in the shared link_index
                                    sequence (both engine and simulator
                                    enumerate the concatenation).
  initialize(ctx) -> Iterable[str] | None
                                    the reference's PerformInitialization
                                    (SURVEY.md §3.1: login, seed
                                    expansion before round 0). Runs
                                    ONCE on the driver before the seed
                                    frontier is built; ctx is an
                                    engine.policy.InitContext with
                                    `fetch(url) -> (status, body)`
                                    (hermetic pages lookup in-sandbox;
                                    a real transport in production) and
                                    a mutable `cookies` CookieJar whose
                                    final state pre-seeds FetcherActor
                                    sessions (CrawlResult.init_cookies
                                    → FetcherActor(initial_cookies=…)).
                                    The returned urls join crawl.seeds.
                                    MUST be deterministic: it re-runs
                                    on resume and the effective seed
                                    list participates in the resume
                                    config hash.
Built-ins: scheme allow-list, extension skip-list (A12), optional
same-host(seed hosts) scoping, max depth (A28).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from engine.kernels import host_of

SKIP_EXTENSIONS = frozenset(
    {
        ".png", ".jpg", ".jpeg", ".gif", ".ico", ".svg", ".webp", ".bmp",
        ".css", ".js", ".mjs", ".woff", ".woff2", ".ttf", ".eot",
        ".mp3", ".mp4", ".avi", ".mov", ".webm", ".wav", ".ogg",
        ".zip", ".gz", ".tar", ".rar", ".7z", ".pdf", ".exe", ".dmg",
    }
)


@dataclass
class InitContext:
    """Handed to CrawlPolicy.initialize once, driver-side, before
    round 0. `fetch` resolves a url to (status, body-bytes) — a
    hermetic pages-table lookup in this sandbox, the real HTTP
    transport in production; `cookies` is the session state the hook
    may populate (login), consumed by FetcherActor(initial_cookies=…)
    and surfaced as CrawlResult.init_cookies."""

    fetch: Callable[[str], tuple]
    cookies: "object" = None

    def __post_init__(self):
        if self.cookies is None:
            from engine.fetcher import CookieJar

            self.cookies = CookieJar()


@dataclass(frozen=True)
class CrawlPolicy:
    follow_prereqs: bool = False
    max_depth: Optional[int] = None
    same_host_only: bool = False
    allowed_schemes: tuple = ("http", "https")
    rewrite: Optional[Callable[[str], str]] = None
    should_scrape: Optional[Callable[[str, bool], Optional[bool]]] = None
    priority: Optional[Callable[[str, int], int]] = None
    collect_links: Optional[Callable[[str, str], list]] = None
    collect_links_html: Optional[Callable[[str, object], list]] = None
    initialize: Optional[Callable[["InitContext"], object]] = None

    def priority_of(self, url: str, depth: int) -> int:
        return int(self.priority(url, depth)) if self.priority is not None else 0

    def link_allowed(self, url: str, kind: str, depth: int,
                     seed_hosts: frozenset) -> bool:
        """Decide for an already-canonicalized candidate link at the
        given (child) depth. Deterministic pure function."""
        is_prereq = kind == "prereq"
        if self.should_scrape is not None:
            v = self.should_scrape(url, is_prereq)
            if v is not None:
                return v
        if is_prereq and not self.follow_prereqs:
            return False
        scheme = url.split(":", 1)[0].lower() if ":" in url else ""
        if scheme not in self.allowed_schemes:
            return False
        if self.max_depth is not None and depth > self.max_depth:
            return False
        path = url.split("://", 1)[-1]
        path = path.split("?", 1)[0]
        slash = path.find("/")
        path = path[slash:] if slash >= 0 else "/"
        dot = path.rfind(".")
        if dot > path.rfind("/") and path[dot:].lower() in SKIP_EXTENSIONS and not is_prereq:
            return False
        if self.same_host_only and host_of(url) not in seed_hosts:
            return False
        return True


def sitemap_initialize(*sitemap_urls: str, max_depth: int = 2):
    """Build a CrawlPolicy.initialize hook that seeds the crawl from
    sitemap.xml files: each sitemap is fetched through ctx.fetch (the
    hermetic pages lookup here, the real transport in production) and
    its <loc> urls become extra seeds; <loc> targets that are
    themselves .xml files (sitemap INDEX entries) are followed
    breadth-first up to `max_depth` fetches deep. Deterministic
    (document order, BFS), as CrawlPolicy.initialize requires."""
    import re

    loc_re = re.compile(rb"<loc>\s*([^<]+?)\s*</loc>")

    def hook(ctx) -> list:
        seeds: list[str] = []
        queue = [(u, 0) for u in sitemap_urls]
        seen: set[str] = set()
        while queue:
            u, d = queue.pop(0)
            if u in seen:
                continue
            seen.add(u)
            status, body = ctx.fetch(u)
            if status != 200:
                continue
            for m in loc_re.finditer(body):
                loc = m.group(1).decode("utf-8", "replace").strip()
                if loc.split("?")[0].lower().endswith(".xml"):
                    if d + 1 <= max_depth:
                        queue.append((loc, d + 1))
                elif loc not in seeds:
                    seeds.append(loc)
        return seeds

    return hook
