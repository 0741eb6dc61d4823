#!/usr/bin/env python3
"""Interleaved same-window A/B bench between two git revisions.

Pins (or clears) a suspected throughput drift by running the SAME replay
bench alternately from a worktree at revision A and the current tree (B),
in N interleaved pairs within one host window, then comparing the
per-pair ratio's median.  Single-shot round benches on this host carry
0.88-1.16 control spread (BENCH/BASELINE.md), so only an interleaved
median is evidence.

Usage:
    python tools/bench_ab.py --base 6e25fc7 --pairs 6 --events 2000000

Prints one JSON line: {"pairs": [[a_evs, b_evs], ...], "ratios": [...],
"median_ratio": r}.  ratio > 1 means B (current tree) is faster.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tree: str, events: int, cores: int, workdir: str) -> float:
    env = dict(os.environ, BENCH_WORKDIR=workdir)
    out = subprocess.run(
        [sys.executable, "bench.py", "--replay-only",
         "--cores", str(cores), "--events", str(events)],
        cwd=tree, env=env, capture_output=True, text=True, timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return float(json.loads(line)["events_per_sec"])
    raise RuntimeError(f"no JSON line from bench in {tree}:\n{out.stderr[-2000:]}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--base", required=True, help="git rev for side A")
    p.add_argument("--pairs", type=int, default=6)
    p.add_argument("--events", type=int, default=2_000_000)
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--workdir", default="/dev/shm/bench_ab")
    args = p.parse_args()

    wt = os.path.join("/tmp", f"ab_worktree_{args.base}")
    if not os.path.isdir(wt):
        subprocess.run(["git", "worktree", "add", "--detach", wt, args.base],
                       cwd=REPO, check=True)

    pairs, ratios = [], []
    # warm-up once per side (JVM/page-cache) outside the scored pairs
    run_bench(wt, args.events // 10, args.cores, args.workdir)
    run_bench(REPO, args.events // 10, args.cores, args.workdir)
    for i in range(args.pairs):
        a = run_bench(wt, args.events, args.cores, args.workdir)
        b = run_bench(REPO, args.events, args.cores, args.workdir)
        pairs.append([a, b])
        ratios.append(round(b / a, 3))
        print(f"pair {i + 1}: A={a:.0f} B={b:.0f} ratio={b / a:.3f}",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "base": args.base, "events": args.events, "cores": args.cores,
        "pairs": pairs, "ratios": ratios,
        "median_ratio": round(statistics.median(ratios), 3),
    }))


if __name__ == "__main__":
    main()
