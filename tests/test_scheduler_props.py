"""Property tests: the vectorized scheduler stages are EXACTLY the
per-row reference semantics (byte-lexicographic ord_key order), and
the bucketed semi/anti join is exactly set membership."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.frontier import MAX_ORD, _partial_topb, mark_scheduled, ord_key


def _frontier_rows(draw, n):
    hosts = draw(st.lists(
        st.sampled_from(["a.x", "b.x", "c.x", "mega.x"]),
        min_size=n, max_size=n))
    prios = draw(st.lists(st.integers(-5, 5), min_size=n, max_size=n))
    seqs = draw(st.lists(st.integers(0, 2**50), min_size=n, max_size=n))
    keys = [hashlib.sha1(f"{i}-{seqs[i]}".encode()).digest() for i in range(n)]
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "priority": pa.array(prios, pa.int32()),
            "discovery_seq": pa.array(seqs, pa.int64()),
            "url_key": pa.array(keys, pa.binary(20)),
        }
    )


@st.composite
def _frontier(draw):
    n = draw(st.integers(1, 60))
    return _frontier_rows(draw, n)


@settings(max_examples=60, deadline=None)
@given(t=_frontier(), budget=st.integers(1, 8))
def test_partial_topb_equals_reference(t, budget):
    got = _partial_topb(t, budget)
    # reference: per host, sorted ord keys, first `budget`
    per: dict[str, list[bytes]] = {}
    for h, p, s, k in zip(t["host"].to_pylist(), t["priority"].to_pylist(),
                          t["discovery_seq"].to_pylist(), t["url_key"].to_pylist()):
        per.setdefault(h, []).append(ord_key(p, s, k))
    want = set()
    for h, lst in per.items():
        lst.sort()
        want.update((h, o) for o in lst[:budget])
    assert set(zip(got["host"].to_pylist(), got["ord"].to_pylist())) == want


@settings(max_examples=60, deadline=None)
@given(t=_frontier(), budget=st.integers(1, 8), data=st.data())
def test_mark_scheduled_equals_reference(t, budget, data):
    # thresholds: a mix of real ord keys from the table and MAX_ORD
    hosts = set(t["host"].to_pylist())
    thresholds = {}
    for h in hosts:
        if data.draw(st.booleans()):
            thresholds[h] = MAX_ORD
        else:
            i = data.draw(st.integers(0, t.num_rows - 1))
            thresholds[h] = ord_key(
                t["priority"][i].as_py(), t["discovery_seq"][i].as_py(),
                t["url_key"][i].as_py(),
            )
    got = mark_scheduled(t, thresholds)["scheduled"].to_pylist()
    want = [
        ord_key(p, s, k) <= thresholds.get(h, MAX_ORD)
        for h, p, s, k in zip(t["host"].to_pylist(), t["priority"].to_pylist(),
                              t["discovery_seq"].to_pylist(),
                              t["url_key"].to_pylist())
    ]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    left_keys=st.lists(st.integers(-1000, 1000), min_size=0, max_size=80),
    right_keys=st.lists(st.integers(-1000, 1000), min_size=0, max_size=40),
    keep=st.booleans(),
)
def test_semi_anti_bucketed_is_set_membership(ray_session, left_keys,
                                              right_keys, keep):
    import ray.data as rd

    from engine.joins import semi_anti_bucketed

    if not left_keys:
        return  # empty left: nothing to assert (ray union needs rows)
    left = rd.from_arrow(pa.table(
        {"k": pa.array(left_keys, pa.int64()),
         "v": pa.array(range(len(left_keys)), pa.int64())}
    ))
    right = rd.from_arrow(pa.table({"k": pa.array(right_keys, pa.int64())}))
    out = semi_anti_bucketed(left, right, on="k", keep_present=keep,
                             num_buckets=7).to_pandas()
    rset = set(right_keys)
    want = sorted(v for k, v in zip(left_keys, range(len(left_keys)))
                  if (k in rset) == keep)
    if not want:
        # empty Ray Dataset loses its schema through to_pandas() — a
        # known conversion artifact (verify skill notes), so only the
        # row count is assertable
        assert len(out) == 0
        return
    assert sorted(out["v"].tolist()) == want
