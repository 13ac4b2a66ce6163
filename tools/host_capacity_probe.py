"""Host per-thread capacity control (Spark-free).

The two-parallelism scaling protocol assumes the box gives N and 4N
threads the same per-thread speed — on a virtualized, possibly
core-shared guest that assumption must be MEASURED, not assumed. This
runs K concurrent single-thread CPU probes (same arithmetic loop as
tools/scaling_bench.cpu_probe) for K in 1,2,4,8,16,32 and reports the
per-thread slowdown vs K=1. capacity(K) = t(1)/t(K) is the fraction
of a lone thread's speed each of K concurrent threads receives; an
engine scaling at exactly the host's capacity curve is scaling
perfectly — the deficit is the box, which a real 4x-executor cluster
(dedicated cores per executor) does not share.

Usage: python tools/host_capacity_probe.py [reps]
"""

from __future__ import annotations

import json
import statistics
import sys
from concurrent.futures import ProcessPoolExecutor


def probe_once(_=None) -> float:
    import time

    t0 = time.perf_counter()
    x = 0
    for i in range(12_000_000):
        x += i ^ (i >> 3)
    return time.perf_counter() - t0


def run_level(k: int) -> float:
    """Median per-thread probe time with k concurrent probes."""
    with ProcessPoolExecutor(max_workers=k) as ex:
        times = list(ex.map(probe_once, range(k)))
    return statistics.median(times)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    levels = [1, 2, 4, 8, 16, 32]
    out = {}
    for k in levels:
        meds = sorted(run_level(k) for _ in range(reps))
        out[str(k)] = round(meds[len(meds) // 2], 3)
        print(f"  K={k:<3d} per-thread median {out[str(k)]}s", file=sys.stderr)
    base = out["1"]
    report = {
        "per_thread_s": out,
        "capacity": {k: round(base / v, 3) for k, v in out.items()},
        "note": (
            "capacity[K] = fraction of a lone thread's speed each of K "
            "concurrent threads receives on this guest"
        ),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
