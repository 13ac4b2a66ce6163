"""Host memory-bandwidth capacity control (Spark-free).

Companion to host_capacity_probe.py: K concurrent processes each
stream-copy a 256 MB numpy array (far beyond L3, pure DRAM traffic)
and report per-thread copy time. capacity(K) = t(1)/t(K). An analytic
engine is bandwidth-bound, so THIS curve — not the ALU curve — bounds
what any engine can scale to on one box: executors on a real cluster
bring their own memory buses.

Usage: python tools/host_bandwidth_probe.py [reps]
"""

from __future__ import annotations

import json
import statistics
import sys
from concurrent.futures import ProcessPoolExecutor


def probe_once(_=None) -> float:
    import time

    import numpy as np

    a = np.ones(32 * 1024 * 1024, dtype=np.float64)  # 256 MB
    b = np.zeros_like(a)  # touch every page BEFORE timing
    np.copyto(b, a)       # warm both directions (page tables, TLB)
    np.copyto(a, b)
    t0 = time.perf_counter()
    for _i in range(8):
        np.copyto(b, a)
        np.copyto(a, b)
    return time.perf_counter() - t0


def run_level(k: int) -> float:
    with ProcessPoolExecutor(max_workers=k) as ex:
        times = list(ex.map(probe_once, range(k)))
    return statistics.median(times)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = {}
    for k in [1, 2, 4, 8, 16, 32]:
        meds = sorted(run_level(k) for _ in range(reps))
        out[str(k)] = round(meds[len(meds) // 2], 3)
        print(f"  K={k:<3d} per-thread median {out[str(k)]}s", file=sys.stderr)
    base = out["1"]
    print(json.dumps({
        "per_thread_s": out,
        "capacity": {k: round(base / v, 3) for k, v in out.items()},
        "note": "per-thread DRAM copy capacity with K concurrent streams",
    }, indent=2))


if __name__ == "__main__":
    main()
