"""Pure-python sequential crawl simulator — the trace/seen-set oracle.

Implements EXACTLY the round semantics of engine.crawl (SURVEY.md §3.2,
§5.3) with plain dicts, no Ray: the end-to-end tests assert that the
distributed engine's per-round fetch trace and final URL-seen set are
byte-identical to this simulator's at any parallelism. Keep the two in
lockstep: any semantic change lands in both, plus the golden trace
fixture is regenerated ONLY with a conscious compat break.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from engine.frontier import effective_budget, ord_key
from engine.kernels import (
    canonicalize_url,
    discovery_seq,
    extract_links,
    extract_text,
    host_of,
    sha1_key,
)
from engine.policy import CrawlPolicy
from engine.robots import RobotsTable

EXTRA_LINK_IDX_BASE = 1_000_000   # keep in lockstep with engine.crawl
REDIRECT_LINK_IDX = 2_000_000     # keep in lockstep with engine.crawl


@dataclass(frozen=True)
class CrawlConfig:
    seeds: tuple
    budget_per_host: int = 4
    round_time_budget_ms: int = 10_000
    max_rounds: int = 64
    policy: CrawlPolicy = CrawlPolicy()
    robots_raw: tuple = ()  # tuple of (host, robots_txt)
    num_shards: int = 4     # engine-side seen sharding (no semantic effect)
    seen_mode: str = "exact"
    num_partitions: int = 8
    # A18: fetch /robots.txt from the crawled web itself when a host
    # first appears in the frontier (out-of-band, unbudgeted, effective
    # the same round), in addition to the config-injected robots_raw
    discover_robots: bool = False


@dataclass
class SimResult:
    trace: list[dict] = field(default_factory=list)  # {round, host, url, discovery_seq, status}
    seen_urls: set = field(default_factory=set)      # all ever-enqueued canonical urls
    rounds: int = 0
    metrics: list[dict] = field(default_factory=list)


def _frontier_row(url: str, depth: int, parent: str, link_index: int,
                  pol: CrawlPolicy = CrawlPolicy()) -> dict:
    cu = canonicalize_url(url)
    k = sha1_key(cu)
    return {
        "url": cu,
        "url_key": k,
        "host": host_of(cu),
        "depth": depth,
        "priority": pol.priority_of(cu, depth),
        "discovery_seq": discovery_seq(depth, k),
        "parent_url": parent,
        "link_index": link_index,
    }


def simulate(pages: dict[str, bytes], crawl: CrawlConfig,
             redirects: dict[str, str] | None = None) -> SimResult:
    """pages: canonical url -> html bytes (the hermetic web).
    redirects: canonical url -> raw target; such a url fetches as
    status 301 with no content links — only its target is enqueued, at
    the SAME depth (engine.crawl._redirect_links_table semantics)."""
    redirects = redirects or {}
    robots = RobotsTable(dict(crawl.robots_raw))
    pol = crawl.policy
    seeds = list(crawl.seeds)
    if pol.initialize is not None:
        # PerformInitialization mirror (engine.crawl.run_crawl): once,
        # before the seed frontier; returned urls join the seeds
        from engine.policy import InitContext

        def _fetch(url: str) -> tuple:
            cu = canonicalize_url(url)
            if cu in pages:
                return (200, pages[cu])
            return (404, b"")

        ctx = InitContext(fetch=_fetch)
        seeds.extend(pol.initialize(ctx) or ())
    seed_hosts = frozenset(host_of(canonicalize_url(s)) for s in seeds)
    res = SimResult()

    seen: set[bytes] = set()
    frontier: list[dict] = []
    for s in seeds:
        row = _frontier_row(s, 0, "", 0, pol)
        if row["url_key"] not in seen:
            seen.add(row["url_key"])
            res.seen_urls.add(row["url"])
            frontier.append(row)

    resolved_hosts: set[str] = set()
    for rnd in range(crawl.max_rounds):
        if not frontier:
            break
        res.rounds = rnd + 1
        if crawl.discover_robots:
            # A18: when a host first appears, fetch its /robots.txt
            # from the web itself (https preferred), effective now
            hosts = {r["host"] for r in frontier}
            for h in sorted(hosts - resolved_hosts):
                for cand in (f"https://{h}/robots.txt", f"http://{h}/robots.txt"):
                    if cand in pages:
                        robots.add(h, pages[cand].decode("utf-8", "replace"))
                        break
            resolved_hosts |= hosts
        # robots gate (disallowed dropped permanently)
        allowed = [r for r in frontier if robots.allowed(r["host"], r["url"])]
        robots_blocked = len(frontier) - len(allowed)
        # per-host schedule: Bh smallest by (priority, seq, url_key)
        by_host: dict[str, list[dict]] = {}
        for r in allowed:
            by_host.setdefault(r["host"], []).append(r)
        scheduled: list[dict] = []
        deferred: list[dict] = []
        for h, rows in by_host.items():
            bh = effective_budget(
                crawl.budget_per_host, robots.crawl_delay_ms(h),
                crawl.round_time_budget_ms,
            )
            rows.sort(key=lambda r: ord_key(r["priority"], r["discovery_seq"], r["url_key"]))
            scheduled.extend(rows[:bh])
            deferred.extend(rows[bh:])
        # fetch + trace (trace order: by (seq, url) within round)
        scheduled.sort(key=lambda r: (r["discovery_seq"], r["url"]))
        new_rows: dict[bytes, dict] = {}
        fetched = errors = 0
        for r in scheduled:
            html = pages.get(r["url"])
            target = redirects.get(r["url"])
            if html is None:
                status = 404
            elif target is not None:
                status = 301
            else:
                status = 200
            if html is not None:
                fetched += 1
            else:
                errors += 1
            res.trace.append(
                {
                    "round": rnd,
                    "host": r["host"],
                    "url": r["url"],
                    "discovery_seq": r["discovery_seq"],
                    "status": status,
                }
            )
            if html is None:
                continue

            def consider(absu: str, kind: str, idx: int, parent: dict) -> None:
                u = pol.rewrite(absu) if pol.rewrite else absu
                cu = canonicalize_url(u)
                d = parent["depth"] + 1
                if not pol.link_allowed(cu, kind, d, seed_hosts):
                    return
                row = _frontier_row(cu, d, parent["url"], idx, pol)
                prev = new_rows.get(row["url_key"])
                # intra-round dedup: keep first by (seq, parent, link_index)
                if prev is None or (
                    (row["discovery_seq"], row["parent_url"], row["link_index"])
                    < (prev["discovery_seq"], prev["parent_url"], prev["link_index"])
                ):
                    new_rows[row["url_key"]] = row

            if target is not None:
                # 3xx: only the location is enqueued, at the SAME depth
                # (parent_depth-1 shim compensates the chain's +1)
                consider(target, "redirect", REDIRECT_LINK_IDX,
                         {"depth": r["depth"] - 1, "url": r["url"]})
                continue
            for absu, kind, idx in extract_links(html, r["url"]):
                consider(absu, kind, idx, r)
            if pol.collect_links is not None or pol.collect_links_html is not None:
                # A30 CollectAdditionalLinks — same chain, kind="extra",
                # idx offset keeps html links winning dedup ties; both
                # hook forms share ONE index sequence (text-hook urls
                # first) exactly like engine.crawl._extra_links_table
                extras = []
                if pol.collect_links is not None:
                    txt = extract_text(html)
                    extras.extend(pol.collect_links(r["url"], txt))
                if pol.collect_links_html is not None:
                    extras.extend(pol.collect_links_html(r["url"], html))
                for i, extra in enumerate(extras):
                    consider(extra, "extra", EXTRA_LINK_IDX_BASE + i, r)
        fresh = []
        for k, row in new_rows.items():
            if k not in seen:
                seen.add(k)
                res.seen_urls.add(row["url"])
                fresh.append(row)
        res.metrics.append(
            {
                "round": rnd,
                "urls_in": len(frontier),
                "robots_blocked": robots_blocked,
                "scheduled": len(scheduled),
                "fetched": fetched,
                "errors": errors,
                "new_links": len(fresh),
            }
        )
        frontier = deferred + fresh
    return res
