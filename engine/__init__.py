"""ray-crawl-engine: a Ray-Data-native crawl + data-processing engine.

From-scratch reimplementation of the *capabilities* of
antiufo/Shaman.Scraping (see SURVEY.md; the reference snapshot at
/root/reference is empty, so behavior is specified by BASELINE.json and
SURVEY.md, not by file:line citations into the reference).

Layout (SURVEY.md §7):
  schemas.py   frozen pyarrow schemas (SURVEY.md §1.2)
  kernels.py   scalar/batch kernels: canonicalize, sha1 keys, html
               link/text extraction, json/date/string fns
  ops.py       generic relational operators B1-B18 (SURVEY.md §2B)
  seen.py      sharded URL-seen actor pool (exact + cuckoo)
  robots.py    robots.txt parsing + gate
  frontier.py  per-host politeness scheduler with skew salting
  crawl.py     BSP round loop, checkpoint/resume, MANIFEST
  synth.py     deterministic synthetic pages table + oracle BFS
  textops.py   training-data ops: dedup family, lang-id, quality,
               tokens, fingerprints, ANN similarity, multimodal stubs

No module in this package calls ray.init()/ray.shutdown(); sessions are
owned by bench.py / test fixtures / the driver (__ray_entry__.py:11-13).

Worker importability: the driver may import this package from any cwd
AFTER ray.init (driver contract), so Ray workers can't be assumed to
have /root/repo on sys.path. All engine modules register for
pickle-BY-VALUE with Ray's cloudpickle, so every stage function /
actor class crossing to a worker ships self-contained (serialized
once per function per job — negligible overhead).
"""

from __future__ import annotations


def _register_by_value() -> None:
    try:
        from ray import cloudpickle
    except Exception:  # ray absent: pure-python use (oracle, kernels) still works
        return
    import engine.crawl
    import engine.css
    import engine.frontier
    import engine.joins
    import engine.kernels
    import engine.ops
    import engine.oracle
    import engine.policy
    import engine.robots
    import engine.schemas
    import engine.seen
    import engine.synth
    import engine.textops
    import engine.util

    import sys

    for name, mod in list(sys.modules.items()):
        if name == "engine" or name.startswith("engine."):
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass


_register_by_value()
