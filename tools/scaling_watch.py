"""Quiet-window hunter for the N-vs-4N scaling criterion.

BASELINE.md's measurement protocol gates scaling executions on the
same-session pure-CPU ceiling (tools/cpu_ceiling.py): in a contended
window the measurement characterizes the neighbors, not the code.
This tool operationalizes the gate: probe the ceiling every
--interval seconds and, the moment it clears --gate with a tight rep
spread, immediately run `bench.py --scaling` at the chosen level pair
and stop. One execution per invocation; --max-minutes bounds the
hunt so an unattended run cannot outlive its session.

Usage:
  python tools/scaling_watch.py [--levels 8,32] [--gate 0.88]
      [--interval 600] [--max-minutes 150] [--out /tmp/scaling_watch]

Writes probe history to <out>.probes.jsonl and, on a fired
execution, the bench JSON line plus the pre/post ceiling bracket to
<out>.result.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _probe(lo: int, hi: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "cpu_ceiling.py"),
         str(lo), str(hi)],
        capture_output=True, text=True, check=True, timeout=600,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def _spread(reps: list[float]) -> float:
    return (max(reps) - min(reps)) / max(reps)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--gate", type=float, default=0.88)
    ap.add_argument("--max-spread", type=float, default=0.08,
                    help="max rep spread for the probe to count as quiet")
    ap.add_argument("--interval", type=int, default=600)
    ap.add_argument("--max-minutes", type=int, default=150)
    ap.add_argument("--out", default="/tmp/scaling_watch")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    deadline = time.monotonic() + args.max_minutes * 60
    probes_path = args.out + ".probes.jsonl"
    while time.monotonic() < deadline:
        p = _probe(lo, hi)
        reps = p[f"all_{lo}"] + p[f"all_{hi}"]
        quiet = (p["ceiling"] >= args.gate
                 and _spread(p[f"all_{lo}"]) <= args.max_spread
                 and _spread(p[f"all_{hi}"]) <= args.max_spread)
        with open(probes_path, "a") as f:
            f.write(json.dumps({"t": time.time(), **p, "quiet": quiet}) + "\n")
        if quiet:
            bench = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
                env=dict(os.environ, BENCH_SCALE_LEVELS=f"{lo},{hi}"),
                capture_output=True, text=True, check=True, timeout=3600,
            ).stdout
            result = json.loads(bench.strip().splitlines()[-1])
            post = _probe(lo, hi)
            with open(args.out + ".result.json", "w") as f:
                json.dump({"pre_ceiling": p, "execution": result,
                           "post_ceiling": post}, f, indent=1)
            print(json.dumps({"fired": True, "raw": result[
                "scaling_efficiency"], "pre": p["ceiling"],
                "post": post["ceiling"]}))
            return 0
        # sleep the remaining interval (the probe itself took ~1 min)
        time.sleep(max(0, args.interval))
    print(json.dumps({"fired": False, "probes": probes_path}))
    return 0


if __name__ == "__main__":
    main()
