"""Unit tests: seen-set shards (exact + cuckoo), robots parsing,
frontier threshold scheduler invariants (SURVEY.md §5.1, §5.6)."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from engine.frontier import MAX_ORD, effective_budget, mark_scheduled, ord_key
from engine.kernels import discovery_seq, sha1_key
from engine.robots import RobotsRules, RobotsTable
from engine.seen import CuckooFilter, SeenShard


# ---------------------------------------------------------------- seen
def _keys(n, seed=0):
    rng = random.Random(seed)
    return [bytes(rng.getrandbits(8) for _ in range(20)) for _ in range(n)]


def test_seen_exact_basic_and_idempotent():
    s = SeenShard("exact")
    ks = _keys(100)
    assert list(s.check_and_add(ks, 0)) == [True] * 100
    # retry same round: still True (idempotent under task retry)
    assert list(s.check_and_add(ks, 0)) == [True] * 100
    # later round: already seen
    assert list(s.check_and_add(ks, 1)) == [False] * 100
    assert s.size() == 100


def test_seen_exact_serialize_roundtrip():
    s = SeenShard("exact")
    ks = _keys(50, 1)
    s.check_and_add(ks, 0)
    blob = s.serialize()
    s2 = SeenShard("exact")
    s2.load(blob)
    assert list(s2.check_and_add(ks, 5)) == [False] * 50
    assert set(s2.keys_snapshot()) == set(ks)


def test_seen_pool_checkpoint_all_roundtrip(ray_session, tmp_path):
    """r5: checkpoint_all writes shard={s}.bin ACTOR-SIDE (launched
    refs, driver waits at its commit point); the files must load back
    to the exact same membership via load_all — the resume path's
    contract (engine/crawl.py reads these bins on resume=True)."""
    import ray

    from engine.seen import SeenPool

    pool = SeenPool(3, mode="exact")
    ks = _keys(200, 7)
    pool.check_and_add(ks, 0)
    refs = pool.checkpoint_all(str(tmp_path))
    ray.get(refs)  # the commit point
    files = sorted(p.name for p in tmp_path.iterdir())
    assert files == [f"shard={s}.bin" for s in range(3)]

    pool2 = SeenPool(3, mode="exact")
    pool2.load_all([(tmp_path / f"shard={s}.bin").read_bytes()
                    for s in range(3)])
    # all keys already seen; membership identical to the source pool
    assert not pool2.check_and_add(ks, 9).any()
    assert pool2.all_keys() == pool.all_keys() == set(ks)
    pool.shutdown()
    pool2.shutdown()


def test_seen_cuckoo_matches_exact_semantics():
    c = SeenShard("cuckoo", capacity=4096)
    e = SeenShard("exact")
    ks = _keys(2000, 2)
    assert list(c.check_and_add(ks, 0)) == list(e.check_and_add(ks, 0))
    assert list(c.check_and_add(ks, 0)) == [True] * 2000  # same-round retry
    assert list(c.check_and_add(ks, 1)) == [False] * 2000
    fresh = _keys(500, 3)
    got = c.check_and_add(fresh, 1)
    # cuckoo may false-positive (claim seen) but NEVER false-negative
    fp = sum(1 for g in got if not g)
    assert fp <= 5  # 16-bit fingerprints: fp rate ~ 2^-13/bucket pair


def test_seen_cuckoo_serialize_roundtrip():
    c = SeenShard("cuckoo", capacity=1024)
    ks = _keys(400, 4)
    c.check_and_add(ks, 0)
    c2 = SeenShard("exact")
    c2.load(c.serialize())
    assert c2.mode == "cuckoo"
    assert list(c2.check_and_add(ks, 3)) == [False] * 400


def test_cuckoo_filter_load():
    cf = CuckooFilter(capacity=10000)
    ks = _keys(9000, 5)
    for k in ks:
        assert cf.insert(k)
    assert all(cf.contains(k) for k in ks)


# -------------------------------------------------------------- robots
ROBOTS_TXT = """
# comment
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /*.json$
Crawl-delay: 1.5

User-agent: evilbot
Disallow: /
"""


def test_robots_rules():
    r = RobotsRules.from_text(ROBOTS_TXT)
    assert r.allowed("/public/page")
    assert not r.allowed("/private/x")
    assert r.allowed("/private/ok/page")  # longest-match Allow wins
    assert not r.allowed("/data/file.json")
    assert r.allowed("/data/file.json.html")  # $ anchor
    assert r.crawl_delay_ms == 1500
    evil = RobotsRules.from_text(ROBOTS_TXT, agent="evilbot")
    assert not evil.allowed("/anything")


def test_robots_table_and_full_urls():
    t = RobotsTable({"a.example": "User-agent: *\nDisallow: /x\n"})
    assert not t.allowed("a.example", "https://a.example/x/1")
    assert t.allowed("a.example", "https://a.example/y")
    assert t.allowed("other.example", "https://other.example/x")  # no rules
    assert t.allowed_mask(["a.example", "b.example"],
                          ["https://a.example/x", "https://b.example/x"]) == [False, True]


def test_robots_grouped_agents():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /z\n"
    assert not RobotsRules.from_text(txt, agent="b").allowed("/z/1")
    assert RobotsRules.from_text(txt, agent="c").allowed("/z/1")  # no * group


# ------------------------------------------------------------ frontier
def test_effective_budget():
    assert effective_budget(10, 0, 10_000) == 10
    assert effective_budget(10, 2000, 10_000) == 5
    assert effective_budget(10, 50_000, 10_000) == 1
    assert effective_budget(3, 1000, 10_000) == 3


def _frontier_tbl(urls, priorities=None):
    ks = [sha1_key(u) for u in urls]
    pr = priorities or [0] * len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "url_key": pa.array(ks, pa.binary(20)),
            "host": pa.array([u.split("/")[2] for u in urls], pa.string()),
            "priority": pa.array(pr, pa.int32()),
            "discovery_seq": pa.array(
                [discovery_seq(0, k) for k in ks], pa.int64()
            ),
        }
    )


def test_ord_key_total_order():
    k1, k2 = sha1_key("http://a/1"), sha1_key("http://a/2")
    assert ord_key(-5, 10, k1) < ord_key(0, 10, k1)  # priority dominates
    assert ord_key(0, 10, k1) < ord_key(0, 11, k1)
    assert ord_key(0, 10, k1) != ord_key(0, 10, k2)
    assert ord_key(0, 10, k1) < MAX_ORD


def test_threshold_scheduler_invariants(ray_session):
    """Budget respected per host; scheduled = exactly the Bh smallest
    ordering keys; identical at different block counts."""
    import ray.data as rd

    from engine.frontier import compute_thresholds

    urls = [f"https://h{i % 3}.example/p/{i}" for i in range(60)]
    tbl = _frontier_tbl(urls)
    budget = 4
    results = []
    for nblocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        thr = compute_thresholds(ds, budget, {}, 10_000)
        marked = mark_scheduled(tbl, thr)
        sched = marked.filter(marked["scheduled"]).to_pylist()
        per_host: dict[str, list] = {}
        for r in sched:
            per_host.setdefault(r["host"], []).append(r)
        assert all(len(v) <= budget for v in per_host.values())
        # exact: per host, scheduled == budget smallest ord keys
        allrows = tbl.to_pylist()
        for h, rows in per_host.items():
            host_rows = [r for r in allrows if r["host"] == h]
            host_rows.sort(key=lambda r: ord_key(r["priority"], r["discovery_seq"], r["url_key"]))
            want = {r["url"] for r in host_rows[:budget]}
            assert {r["url"] for r in rows} == want
        results.append(sorted(r["url"] for r in sched))
    assert results[0] == results[1]  # partitioning-independent


def test_threshold_scheduler_crawl_delay(ray_session):
    import ray.data as rd

    from engine.frontier import compute_thresholds

    urls = [f"https://slow.example/p/{i}" for i in range(10)]
    ds = rd.from_arrow(_frontier_tbl(urls))
    thr = compute_thresholds(ds, 8, {"slow.example": 5000}, 10_000)
    marked = mark_scheduled(_frontier_tbl(urls), thr)
    assert sum(1 for x in marked["scheduled"].to_pylist() if x) == 2  # 10000//5000
