"""App-surface smoke tests: `python -m engine.cli` subcommands run in
their own process (the CLI owns its Ray session, like a real user)."""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

import pyarrow.parquet as pq

REPO = str(pathlib.Path(__file__).parent.parent)


def _run_cli(*argv: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "engine.cli", "--num-cpus", "2", *argv],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_crawl_and_warc(tmp_path):
    from engine.synth import SynthConfig, build_pages_table, page_url

    cfg = SynthConfig(n_hosts=3, n_pages=40)
    pages_path = tmp_path / "pages.parquet"
    pq.write_table(build_pages_table(cfg), pages_path)
    out = tmp_path / "crawl"
    res = _run_cli(
        "crawl", "--pages", str(pages_path), "--seeds", page_url(0, 0),
        "--out", str(out), "--budget", "4", "--rounds", "6",
    )
    assert res["fetched"] > 0 and res["rounds"] >= 1
    assert (out / "MANIFEST.json").exists()
    assert list((out / "fetched").glob("round=*/*.parquet"))

    wout = tmp_path / "warc"
    res2 = _run_cli("warc", "--fetched", str(out / "fetched"), "--out",
                    str(wout), "--mode", "capture")
    assert res2["records_indexed"] == res["scheduled"]
    assert list(pathlib.Path(wout).glob("*.warc.gz"))


def test_cli_query(tmp_path):
    res = _run_cli("query", "--name", "distinct",
                   "--sf-dir", "/root/testdata/sf0.001")
    assert res["rows"] == 5
