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
"""
