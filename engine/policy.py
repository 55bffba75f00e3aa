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
Built-ins: scheme allow-list, extension skip-list (A12), optional
same-host(seed hosts) scoping, max depth (A28).
"""

from __future__ import annotations

from dataclasses import dataclass
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
