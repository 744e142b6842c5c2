"""Measure ACTUAL CPU cores consumed by a scaling leg's timed region.

The N->4N scaling pairs time `local[8]` vs `local[32]` legs on one
32-CPU guest.  For the Arrow (mapInArrow) impl the Python workers are
separate OS processes: at local[8] the 8 JVM task threads AND the 8
Python workers can run on DIFFERENT free cores, so the "8-core" leg
really consumes ~2x its nominal cores — free speedup the local[32] leg
cannot get (it is already using the whole box).  That deflates the
measured 8->32 paired efficiency below the true cross-machine value.

This tool replicates bench.py's run_one_scale timed region exactly
(same synth corpus, cache, reps, agg) and samples /proc/stat at 200 ms
during each rep, reporting mean busy-cores alongside the rep wall time.
Effective efficiency = (small_sec * small_busy) / (large_sec *
large_busy) — work-normalized, the number a dedicated 8-CPU vs 32-CPU
machine pair would show.

Usage: python tools/cpu_leg.py CORES N_DOCS [impl] [--out FILE]
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stat() -> tuple[float, float]:
    """(busy_jiffies, total_jiffies) summed over all CPUs."""
    with open("/proc/stat") as f:
        line = f.readline().split()
    vals = [float(x) for x in line[1:]]
    idle = vals[3] + vals[4]  # idle + iowait
    return sum(vals) - idle, sum(vals)


class CpuSampler:
    def __init__(self, period: float = 0.2) -> None:
        self.period = period
        self.samples: list[float] = []  # busy-cores per interval
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        ncpu = os.cpu_count() or 1
        b0, t0 = _stat()
        while not self._stop.wait(self.period):
            b1, t1 = _stat()
            if t1 > t0:
                self.samples.append(ncpu * (b1 - b0) / (t1 - t0))
            b0, t0 = b1, t1

    def __enter__(self) -> "CpuSampler":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join()

    def mean(self) -> float:
        return sum(self.samples) / len(self.samples) if self.samples else 0.0


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    impl = sys.argv[3] if len(sys.argv) > 3 and not sys.argv[3].startswith("-") else "arrow"
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    from pyspark.sql import functions as F

    from tackle4losscontentextraction_spark.operators import (
        extraction,
        extraction_arrow,
    )
    from tackle4losscontentextraction_spark.session import get_spark
    from tackle4losscontentextraction_spark.sources import synth

    reps = 2 if n_docs / (cores * 4500.0) > 25 else 3
    spark = get_spark(app_name=f"t4l-cpuleg-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 16))
    spark.sparkContext.setLogLevel("ERROR")
    parts = 128 if n_docs <= 600_000 else 512
    docs = synth.synth_docs(spark, n_docs, partitions=parts).cache()
    docs.count()
    fn = extraction_arrow.extract_arrow if impl == "arrow" else extraction.extract
    rep_rows = []
    for i in range(reps):
        t0 = time.perf_counter()
        with CpuSampler() as cs:
            out = fn(docs)
            out.agg(F.count("*").alias("n"),
                    F.sum("content_chars").alias("_force")).collect()
        sec = time.perf_counter() - t0
        rep_rows.append({"rep": i, "sec": round(sec, 3),
                         "busy_cores_mean": round(cs.mean(), 2),
                         "busy_cores_max": round(max(cs.samples or [0]), 2),
                         "n_samples": len(cs.samples)})
        print(json.dumps(rep_rows[-1]), flush=True)
    spark.stop()
    best = min(rep_rows, key=lambda r: r["sec"])
    result = {"cores": cores, "n_docs": n_docs, "impl": impl,
              "reps": rep_rows, "best": best,
              "load_1min": round(os.getloadavg()[0], 1)}
    print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
