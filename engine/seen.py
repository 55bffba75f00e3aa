"""Sharded URL-seen set: actor pool of K shards (SURVEY.md §2A A16).

north_star (BASELINE.json:6): "a sharded cuckoo-filter URL-seen set
(canonicalized SHA-1 URL keys) held in an actor pool". Two backends
behind one interface:

  * exact  — dict[key -> first_round]; exact membership, used at test
    scale so crawl traces are exactly reproducible, and as the ground
    truth the cuckoo backend is validated against.
  * cuckoo — numpy cuckoo filter (16-bit fingerprints, 4-slot buckets,
    2-choice hashing; pattern ref: PAPERS.md "A Learned Cuckoo Filter
    ..." SIGMOD 2023 — we use the classic static filter, not the
    learned variant). ~2 bytes/key: 10^10 urls ≈ 20 GB across shards,
    which is why the shard COUNT scales with the cluster, not the node.

Idempotency under Ray task retries (SURVEY.md §7 hard parts): a retried
map_batches task re-submits the same keys in the same round;
`check_and_add` stores key->round (exact) or keeps a per-round added
set (cuckoo), so the retry gets the same "new" verdict instead of
False — the seen set never corrupts the frontier on retry.

Cuckoo determinism bound (NOT exact-equivalence): false positives are
a property of the filter state, and insert order across concurrent
seen-filter RPCs is scheduler-dependent (eviction consumes the
per-shard RNG in arrival order), so the false-positive SET — and hence
a trace that hits one — is only statistically stable (~fp_rate ≈
2·4/2^16 per lookup at high load), not bit-reproducible across runs.
Exact mode is the reproducibility backend; cuckoo is the memory-bound
backend. Insert failures (filter full) are surfaced via
SeenPool.insert_failures rather than silently re-crawling.

Routing: shard = key64(url_key) % num_shards, computed batch-side
(kernels.key64s_of_matrix % num_shards); each map_batches task issues ONE batched RPC
per shard it touches.
"""

from __future__ import annotations

import pickle

import numpy as np

from engine.kernels import key64s_of_matrix

_EMPTY = np.uint16(0)


class CuckooFilter:
    """Classic cuckoo filter: b=4 slots/bucket, 16-bit fingerprints."""

    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 0x5EED):
        n_buckets = 1
        while n_buckets * 4 < capacity * 1.1:  # ~0.9 max load factor
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.seed = seed
        self._rng = np.random.default_rng(seed)  # eviction choice only
        self.count = 0

    def _fp_and_index(self, key: bytes) -> tuple[int, int]:
        # key is already a sha1 digest — uniform; carve fp and i1 from it
        fp = (int.from_bytes(key[8:10], "big") | 1)  # nonzero 16-bit
        i1 = int.from_bytes(key[0:8], "big") % self.n_buckets
        return fp, i1

    def _alt(self, i: int, fp: int) -> int:
        # standard partial-key displacement: i xor hash(fp)
        h = (fp * 0x5BD1E995) & 0xFFFFFFFFFFFFFFFF
        return (i ^ h) % self.n_buckets

    def contains(self, key: bytes) -> bool:
        fp, i1 = self._fp_and_index(key)
        if fp in self.table[i1]:
            return True
        return fp in self.table[self._alt(i1, fp)]

    def insert(self, key: bytes) -> bool:
        fp, i1 = self._fp_and_index(key)
        for i in (i1, self._alt(i1, fp)):
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict
        i = i1
        cur = fp
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(0, 4))
            cur, self.table[i][slot] = int(self.table[i][slot]), cur
            i = self._alt(i, cur)
            row = self.table[i]
            empty = np.flatnonzero(row == _EMPTY)
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        return False  # full — caller should have sized capacity right


class SeenShard:
    """One shard of the seen set. Instantiate as a Ray actor:
    ray.remote(SeenShard).remote(...). Plain class so unit tests run it
    in-process."""

    def __init__(self, mode: str = "exact", capacity: int = 1 << 20):
        self.mode = mode
        if mode == "exact":
            self._d: dict[bytes, int] = {}
        elif mode == "cuckoo":
            self._cf = CuckooFilter(capacity)
            self._round_added: set[bytes] = set()
            self._round_no = -1
            self._insert_failures = 0
        else:
            raise ValueError(f"unknown seen mode {mode!r}")

    def check_and_add(self, keys, round_no: int) -> list[bool]:
        """For each key: True iff this key is NEW (first ever seen OR
        first seen in this same round — idempotent under task retry).
        `keys` is a list[bytes] or a packed bytes blob (n×20, the
        cheap-to-pickle RPC form used by the crawl's seen filter)."""
        if isinstance(keys, (bytes, bytearray, memoryview)):
            b = bytes(keys)
            keys = [b[i : i + 20] for i in range(0, len(b), 20)]
        n = len(keys)
        out = np.empty(n, dtype=bool)
        if self.mode == "exact":
            d = self._d
            for i, k in enumerate(keys):
                r = d.get(k)
                if r is None:
                    d[k] = round_no
                    out[i] = True
                else:
                    out[i] = r == round_no
        else:
            if round_no != self._round_no:
                self._round_no = round_no
                self._round_added = set()
            cf, added = self._cf, self._round_added
            for i, k in enumerate(keys):
                if k in added:
                    out[i] = True
                elif cf.contains(k):
                    out[i] = False
                else:
                    if not cf.insert(k):
                        # filter full: the key is reported new but NOT
                        # recorded — it would be re-crawled if seen
                        # again. Counted so undersized capacity is
                        # visible (SeenPool.insert_failures) instead of
                        # silently degrading.
                        self._insert_failures += 1
                    added.add(k)
                    out[i] = True
        return out

    def insert_failures(self) -> int:
        return getattr(self, "_insert_failures", 0)

    def size(self) -> int:
        return len(self._d) if self.mode == "exact" else self._cf.count

    def serialize(self) -> bytes:
        state = {"mode": self.mode}
        if self.mode == "exact":
            state["d"] = self._d
        else:
            state["n_buckets"] = self._cf.n_buckets
            state["table"] = self._cf.table
            state["count"] = self._cf.count
            state["round_added"] = self._round_added
            state["round_no"] = self._round_no
            state["insert_failures"] = self._insert_failures
        return pickle.dumps(state, protocol=4)

    def load(self, blob: bytes) -> None:
        state = pickle.loads(blob)
        self.mode = state["mode"]
        if self.mode == "exact":
            self._d = state["d"]
        else:
            self._cf = CuckooFilter(1)
            self._cf.n_buckets = state["n_buckets"]
            self._cf.table = state["table"]
            self._cf.count = state["count"]
            self._round_added = state["round_added"]
            self._round_no = state["round_no"]
            self._insert_failures = state.get("insert_failures", 0)

    def keys_snapshot(self) -> list[bytes]:
        """Exact mode only — for tests / final-seen-set comparison."""
        if self.mode != "exact":
            raise RuntimeError("keys_snapshot only on exact shards")
        return list(self._d.keys())

    def checkpoint(self, path: str) -> int:
        """serialize() straight to `path` from inside the actor: the K
        shards pickle AND write in parallel and nothing ships to the
        driver (same shared-storage assumption as the task-written
        archive/trace parquet). Returns bytes written. Crash-safety is
        the caller's MANIFEST ordering, as with the old driver-side
        write."""
        blob = self.serialize()
        with open(path, "wb") as f:
            f.write(blob)
        return len(blob)


class SeenPool:
    """Driver-side handle bundle for K SeenShard actors."""

    def __init__(self, num_shards: int, mode: str = "exact",
                 capacity_per_shard: int = 1 << 20):
        import ray

        self.num_shards = num_shards
        self.mode = mode
        # num_cpus=0 (like RobotsShardActor): these are state-holder
        # RPC actors whose work runs inside short handler calls; a
        # nonzero reservation ACCUMULATES across pools kept alive by
        # their owners (res.pool) and starves the 1-CPU map tasks +
        # fractional shuffle aggregators — at num_cpus=4 two leaked
        # 4-shard pools at 0.25 each deadlocked an unrelated groupby.
        Actor = ray.remote(num_cpus=0)(SeenShard)
        self.actors = [
            Actor.remote(mode=mode, capacity=capacity_per_shard)
            for _ in range(num_shards)
        ]

    def shutdown(self) -> None:
        """Kill the shard actors. Callers that own the pool and are
        done with the seen state (e.g. test teardown, a finished
        one-shot crawl) should call this; run_crawl never does — the
        returned res.pool stays queryable."""
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def check_and_add(self, keys: list[bytes], round_no: int) -> np.ndarray:
        """Batched routed RPC from the driver (used for seeds; the
        in-pipeline path is engine.crawl.seen_filter_fn). Keys ship as
        packed per-shard blobs (cheap pickling even for 10^6 seeds)."""
        import ray

        if not keys:
            return np.zeros(0, dtype=bool)
        mat = np.frombuffer(b"".join(keys), dtype=np.uint8).reshape(-1, 20)
        shards = key64s_of_matrix(mat) % np.uint64(self.num_shards)
        mask = np.zeros(len(keys), dtype=bool)
        futs = {}
        for s in range(self.num_shards):
            idx = np.flatnonzero(shards == s)
            if len(idx):
                futs[s] = (idx, self.actors[s].check_and_add.remote(
                    mat[idx].tobytes(), round_no))
        for s, (idx, f) in futs.items():
            mask[idx] = ray.get(f)
        return mask

    def sizes(self) -> list[int]:
        import ray

        return ray.get([a.size.remote() for a in self.actors])

    def insert_failures(self) -> int:
        """Total cuckoo insert failures across shards (0 in exact
        mode) — nonzero means capacity_per_shard was undersized and
        some keys are unrecorded (would re-crawl)."""
        import ray

        return sum(ray.get([a.insert_failures.remote() for a in self.actors]))

    def serialize_all(self) -> list[bytes]:
        import ray

        return ray.get([a.serialize.remote() for a in self.actors])

    def checkpoint_all(self, dir_path: str) -> list:
        """Launch actor-side checkpoint writes (`shard={s}.bin` under
        dir_path) and return the object refs WITHOUT waiting — the
        round loop overlaps them with the frontier phase and ray.get()s
        them at its commit point, just before the MANIFEST write."""
        import os

        return [
            a.checkpoint.remote(os.path.join(dir_path, f"shard={s}.bin"))
            for s, a in enumerate(self.actors)
        ]

    def load_all(self, blobs: list[bytes]) -> None:
        import ray

        assert len(blobs) == self.num_shards
        ray.get([a.load.remote(b) for a, b in zip(self.actors, blobs)])

    def all_keys(self) -> set[bytes]:
        import ray

        out: set[bytes] = set()
        for ks in ray.get([a.keys_snapshot.remote() for a in self.actors]):
            out.update(ks)
        return out
