"""Round-6 harvest orchestrator.

Cycles: [deep-quiet scaling pair] -> [2x bench floor run] -> repeat.
The pair step waits for FULL load decay (default < 1.3) so the
tight-gated 8->32 pairs actually get the box to themselves — the
generic harvester launches the first job whose gate opens and so never
lets the 1-min load fall below ~2 on an otherwise idle box.  Pair
selection rotates over --pairs (default the two 8->32 pairs, which are
the only ones short of samples).  Bench runs use the looser --bench-gate
(3.0) since floor-grinding only needs the run to START quiet.

All evidence lands where the frozen bench.py puts it (BENCH/
scaling.json, BENCH/bench_best.json); this script only schedules.

Usage: python tools/harvest_r6.py [--pairs a,b] [--quiet 1.3]
       [--bench-gate 3.0] [--bench-per-cycle 2] [--cycles N]
"""
from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "harvest.log")


def _log(msg: str) -> None:
    line = f"{datetime.datetime.now():%H:%M:%S} [r6] {msg}"
    print(line, flush=True)
    try:
        with open(LOG, "a") as f:
            f.write(line + "\n")
    except OSError:
        pass


def _wait_quiet(gate: float, poll: float = 20.0, max_wait: float = 1200.0) -> float:
    t0 = time.time()
    while True:
        load = os.getloadavg()[0]
        if load < gate or time.time() - t0 > max_wait:
            return load
        time.sleep(poll)


def _run(argv: list[str], tag: str) -> None:
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, *argv], cwd=REPO,
                           capture_output=True, text=True, timeout=2400)
        ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    _log(f"{tag} done ok={ok} {time.time() - t0:.0f}s "
         f"load_now={os.getloadavg()[0]:.1f}")


def _pair_state(name: str) -> str:
    try:
        with open(os.path.join(REPO, "BENCH", "scaling.json")) as f:
            d = json.load(f)
        p = d.get("paired", {}).get(name, {})
        return (f"{p.get('efficiency', 0):.3f}"
                f"/{p.get('admissible_of', 0)}")
    except (OSError, json.JSONDecodeError):
        return "?"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", default="arrow_8_to_32,8_to_32")
    ap.add_argument("--quiet", type=float, default=1.3)
    ap.add_argument("--bench-gate", type=float, default=3.0)
    ap.add_argument("--bench-per-cycle", type=int, default=2)
    ap.add_argument("--cycles", type=int, default=10**6)
    args = ap.parse_args()
    pairs = args.pairs.split(",")

    _log(f"r6 orchestrator up pid={os.getpid()} pairs={pairs}")
    for cycle in range(args.cycles):
        name = pairs[cycle % len(pairs)]
        load = _wait_quiet(args.quiet)
        _log(f"cycle {cycle}: load={load:.1f} -> pair {name} "
             f"(state {_pair_state(name)})")
        _run(["bench.py", "--pair", name], f"pair {name}")
        _log(f"pair {name} state now {_pair_state(name)}")
        for i in range(args.bench_per_cycle):
            load = _wait_quiet(args.bench_gate)
            _log(f"cycle {cycle}: load={load:.1f} -> bench {i + 1}")
            _run(["bench.py"], "bench")


if __name__ == "__main__":
    main()
