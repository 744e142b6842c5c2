"""Deep-quiet targeted pair harvester.

The generic harvester (tools/harvest.py) launches the first job whose
load gate opens, so on a box whose only load is the harvest itself the
1-min loadavg never decays below ~2 and the tightest-gated pair
(arrow_8_to_32 / 8_to_32, gate 2.0) starves.  This loop does ONE thing:
wait until the box is genuinely quiet (load < --quiet, default 1.3 —
i.e. full decay of our own previous run), then run the single requested
pair, and repeat --runs times.  Evidence accumulates in
BENCH/scaling.json exactly as with the generic harvester (bench.py
--pair min-merges legs and appends same-window paired samples).

Usage: python tools/harvest_deep.py PAIR [--runs N] [--quiet L] [--poll S]
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
    line = f"{datetime.datetime.now():%H:%M:%S} [deep] {msg}"
    print(line, flush=True)
    try:
        with open(LOG, "a") as f:
            f.write(line + "\n")
    except OSError:
        pass


def _paired(name: str) -> str:
    try:
        with open(os.path.join(REPO, "BENCH", "scaling.json")) as f:
            d = json.load(f)
        p = d.get("paired", {}).get(name, {})
        sizes = d.get("pair_sizes", {})
        n = sum(1 for s in d.get("paired_samples", {}).get(name, [])
                if s.get("n_docs") == sizes.get(name))
        return f"{p.get('efficiency', 0.0):.3f}/{n}"
    except (OSError, json.JSONDecodeError):
        return "?/?"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pair")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--quiet", type=float, default=1.3)
    ap.add_argument("--poll", type=float, default=20.0)
    ap.add_argument("--max-wait", type=float, default=900.0,
                    help="give up waiting for a window after this many "
                         "seconds and log it (co-tenant arrived)")
    args = ap.parse_args()

    _log(f"deep harvester up: pair={args.pair} runs={args.runs} "
         f"quiet<{args.quiet} pid={os.getpid()}")
    for i in range(args.runs):
        t_wait = time.time()
        while True:
            load = os.getloadavg()[0]
            if load < args.quiet:
                break
            if time.time() - t_wait > args.max_wait:
                _log(f"run {i + 1}: no quiet window in {args.max_wait:.0f}s "
                     f"(load={load:.1f}) — proceeding anyway, sample may be "
                     f"inadmissible")
                break
            time.sleep(args.poll)
        load = os.getloadavg()[0]
        _log(f"run {i + 1}/{args.runs}: load={load:.1f} -> pair {args.pair}")
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "bench.py", "--pair", args.pair],
                cwd=REPO, capture_output=True, text=True, timeout=2400)
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        _log(f"run {i + 1}/{args.runs} done ok={ok} {time.time() - t0:.0f}s "
             f"paired(eff/n)={_paired(args.pair)} "
             f"load_now={os.getloadavg()[0]:.1f}")
        time.sleep(5)
    _log("deep harvester done")


if __name__ == "__main__":
    main()
