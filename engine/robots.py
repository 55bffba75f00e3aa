"""robots.txt parsing + gating (SURVEY.md §2A A14/A18/A22).

Mandated by BASELINE.json:6,14 (the reference itself is not recalled to
honor robots — this is new design per SURVEY.md A14). Parsing is a
small deterministic prefix-rule matcher (NOT urllib.robotparser, whose
long-path quirks are underspecified): groups by User-agent, longest
prefix match wins, Allow beats Disallow on equal length, '*' wildcard
and '$' anchor supported, Crawl-delay honored.

Serving (A22): the host->rules map is a SMALL side — broadcast via
ray.put once per round and looked up inside map_batches; a RobotsActor
pool is the scale path when the distinct-host count stops being small
(the gate takes either).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlsplit


@dataclass
class RobotsRules:
    # (is_allow, pattern, compiled) sorted by pattern length desc
    rules: list[tuple[bool, str, re.Pattern]] = field(default_factory=list)
    crawl_delay_ms: int = 0

    @staticmethod
    def _compile(pat: str) -> re.Pattern:
        out = []
        for ch in pat:
            if ch == "*":
                out.append(".*")
            elif ch == "$":
                out.append("$")
            else:
                out.append(re.escape(ch))
        return re.compile("^" + "".join(out))

    @classmethod
    def from_text(cls, text: str, agent: str = "*") -> "RobotsRules":
        """Parse rules for `agent` (falling back to the '*' group)."""
        groups: dict[str, list[tuple[str, str]]] = {}
        delays: dict[str, float] = {}
        current: list[str] = []
        last_was_agent = False
        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            k, v = line.split(":", 1)
            k = k.strip().lower()
            v = v.strip()
            if k == "user-agent":
                if not last_was_agent:
                    current = []
                current.append(v.lower())
                groups.setdefault(v.lower(), [])
                last_was_agent = True
                continue
            last_was_agent = False
            if k in ("disallow", "allow"):
                for a in current:
                    groups.setdefault(a, []).append((k, v))
            elif k == "crawl-delay":
                try:
                    d = float(v)
                except ValueError:
                    continue
                for a in current:
                    delays[a] = d
        chosen = agent.lower() if agent.lower() in groups else "*"
        r = cls()
        for kind, pat in groups.get(chosen, []):
            if not pat:
                continue  # "Disallow:" empty = allow all, no rule
            r.rules.append((kind == "allow", pat, cls._compile(pat)))
        # longest pattern wins; allow beats disallow on tie
        r.rules.sort(key=lambda t: (len(t[1]), t[0]), reverse=True)
        r.crawl_delay_ms = int(delays.get(chosen, 0) * 1000)
        return r

    def allowed(self, url_or_path: str) -> bool:
        path = url_or_path
        if "://" in url_or_path:
            parts = urlsplit(url_or_path)
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
        for is_allow, _, cre in self.rules:
            if cre.match(path):
                return is_allow
        return True


class RobotsTable:
    """host -> RobotsRules; hosts absent from the table are fully
    allowed with zero delay. Picklable (compiled regexes pickle fine),
    so it can be ray.put() once and read zero-copy-ish in every task."""

    def __init__(self, raw: dict[str, str] | None = None, agent: str = "*"):
        self.raw = dict(raw or {})
        self.agent = agent
        self.rules = {h: RobotsRules.from_text(t, agent) for h, t in self.raw.items()}

    def add(self, host: str, text: str) -> None:
        """Fold in a robots.txt discovered mid-crawl (A18: the cache
        grows as hosts are first encountered)."""
        self.raw[host] = text
        self.rules[host] = RobotsRules.from_text(text, self.agent)

    def allowed(self, host: str, url: str) -> bool:
        r = self.rules.get(host)
        return True if r is None else r.allowed(url)

    def crawl_delay_ms(self, host: str) -> int:
        r = self.rules.get(host)
        return 0 if r is None else r.crawl_delay_ms

    def allowed_mask(self, hosts: list[str], urls: list[str]) -> list[bool]:
        rules = self.rules
        out = []
        for h, u in zip(hosts, urls):
            r = rules.get(h)
            out.append(True if r is None else r.allowed(u))
        return out

    def to_arrow(self):
        import pyarrow as pa

        from engine.schemas import ROBOTS  # lazy: avoids import cycle at module load
        from datetime import datetime

        hosts = sorted(self.raw)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "fetched_ts": pa.array([datetime(2024, 1, 1)] * len(hosts), pa.timestamp("us")),
                "rules": pa.array([self.raw[h] for h in hosts], pa.string()),
                "crawl_delay_ms": pa.array(
                    [self.crawl_delay_ms(h) for h in hosts], pa.int32()
                ),
            }
        ).cast(ROBOTS)


def robots_shard_of(host: str, num_shards: int) -> int:
    """Stable shard routing for the robots pool (md5-based — host
    strings, so no numeric-pattern skew concern)."""
    import hashlib

    return int.from_bytes(hashlib.md5(host.encode()).digest()[:4], "big") % num_shards


class RobotsShardActor:
    """One shard of the discovered-robots store (A18 scale path,
    SURVEY 'RobotsActor RPC when not small'): holds host -> robots.txt
    text for hosts routing to this shard. Filled by the discovery-scan
    map tasks (add_many), queried per round for the hosts present in
    that round's frontier (get_texts). The full host->text map never
    exists in any single process — at 10^8 distinct hosts each shard
    holds 10^8/K entries and the driver only ever sees the per-round
    working set."""

    def __init__(self):
        self.raw: dict[str, str] = {}
        self.scheme: dict[str, str] = {}

    def add_many(self, hosts: list[str], schemes: list[str],
                 texts: list[str]) -> int:
        """Fold discovered robots pages in; https beats http for the
        same host (order-independent, so concurrent scan tasks commute)."""
        for h, s, t in zip(hosts, schemes, texts):
            prev = self.scheme.get(h)
            if prev is None or (s == "https" and prev == "http"):
                self.raw[h] = t
                self.scheme[h] = s
        return len(self.raw)

    def get_texts(self, hosts: list[str]) -> list[str | None]:
        return [self.raw.get(h) for h in hosts]


class RobotsShardPool:
    """Driver handle over K RobotsShardActors + a bounded parse memo.

    Per crawl round the driver asks for ONLY the hosts present in that
    round's frontier (round_table) and broadcasts that subset — never
    the full accumulated table. Actors take num_cpus=0 so they never
    compete with shuffle aggregators for CPU slots."""

    def __init__(self, num_shards: int, memo_cap: int = 100_000):
        import ray

        self.num_shards = num_shards
        self.actors = [
            ray.remote(RobotsShardActor).options(num_cpus=0).remote()
            for _ in range(num_shards)
        ]
        self._memo: dict[str, RobotsRules] = {}
        self._memo_cap = memo_cap

    def shutdown(self) -> None:
        """Kill the shard actors (run_crawl calls this when its run
        finishes — the pool is rebuilt from the pages scan on resume,
        so nothing is lost, and repeated runs in one Ray session don't
        accumulate actor state)."""
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def get_texts(self, hosts: list[str]) -> dict[str, str]:
        import ray

        by_shard: dict[int, list[str]] = {}
        for h in hosts:
            by_shard.setdefault(robots_shard_of(h, self.num_shards), []).append(h)
        futs = [
            (hs, self.actors[s].get_texts.remote(hs))
            for s, hs in by_shard.items()
        ]
        out: dict[str, str] = {}
        for hs, f in futs:
            for h, t in zip(hs, ray.get(f)):
                if t is not None:
                    out[h] = t
        return out

    def round_table(self, hosts, config_raw, agent: str = "*") -> RobotsTable:
        """RobotsTable limited to the static config rules + the rules
        of `hosts` (this round's frontier hosts). Parsed matchers are
        memoized (bounded) so recurring hosts don't re-parse."""
        found = self.get_texts(sorted(set(hosts)))
        rt = RobotsTable(dict(config_raw), agent)
        for h, txt in found.items():
            rules = self._memo.get(h)
            if rules is None:
                rules = RobotsRules.from_text(txt, agent)
                if len(self._memo) >= self._memo_cap:
                    self._memo.pop(next(iter(self._memo)))
                self._memo[h] = rules
            rt.raw[h] = txt
            rt.rules[h] = rules
        return rt
