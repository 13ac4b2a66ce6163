"""Clean-window scaling campaign (round-3 closure of the BASELINE.md
section 2 efficiency gate).

Round 2 measured the 2->8 qualifying pair at 0.803 (min-of-reps) /
0.79 (clean-median) under uniform ~2.3x host contamination — met on
the min estimator, at the edge on the median. This tool automates what
BENCH.md prescribes for the definitive number: KEEP SAMPLING until
enough reps land in a quiet host window, then compute the median over
clean reps only.

Protocol (supersets tools/scaling_bench.py):
  - same interleaved N / 4N alternation, fresh JVM + untimed warm-up
    per rep, per-rep CPU probes (before+after child);
  - a rep is CLEAN iff its probe is within ``--slack`` (default 25%)
    of the QUIET baseline — the best probe this host has ever shown
    (default 1.05s, measured in a verified-idle window, BENCH.md
    round-2; overridable via $SCALING_QUIET_PROBE), not merely the
    best probe of a possibly-contaminated session;
  - sampling continues until BOTH levels hold ``--clean`` clean reps
    or ``--max-attempts`` rep-pairs have run; every rep (clean or
    not) is recorded with its probe so the window quality is
    auditable;
  - efficiency = tput(4N) / (4 x tput(N)) over clean-median walls,
    plus the min-of-reps and compute-only views for continuity with
    round 2.

Usage: python tools/scaling_campaign.py [sf_dir] [n_low] [n_high]
           [clean_target] [inflate] [max_attempts]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(__file__))

from scaling_bench import run_once  # noqa: E402

#: run_once records the SUM of a before-child and an after-child
#: probe, so the quiet baseline for the recorded value is 2 x 1.05s
#: (the verified-idle single-probe measurement, BENCH.md round 2)
DEFAULT_QUIET_PROBE = 2.10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    clean_target = int(sys.argv[4]) if len(sys.argv) > 4 else 5
    inflate = int(sys.argv[5]) if len(sys.argv) > 5 else 50
    max_attempts = int(sys.argv[6]) if len(sys.argv) > 6 else 25
    quiet = float(os.environ.get("SCALING_QUIET_PROBE", DEFAULT_QUIET_PROBE))
    slack = float(os.environ.get("SCALING_PROBE_SLACK", "1.25"))
    gate = quiet * slack

    reps: dict[int, list[dict]] = {n_low: [], n_high: []}

    def n_clean(cores: int) -> int:
        return sum(r["probe"] <= gate for r in reps[cores])

    attempt = 0
    while attempt < max_attempts and (
        n_clean(n_low) < clean_target or n_clean(n_high) < clean_target
    ):
        attempt += 1
        # always run the FULL pair, even when one level is already
        # satisfied: a lone-level tail would sample different ambient
        # conditions than its counterpart
        for cores in (n_low, n_high):
            r = run_once(sf_dir, cores, inflate)
            r["clean"] = r["probe"] <= gate
            reps[cores].append(r)
            print(
                f"  attempt {attempt:>2d} cores={cores:<3d} "
                f"wall={r['wall']:.2f}s compute={r['compute_wall']:.2f}s "
                f"probe={r['probe']:.2f}s "
                f"{'CLEAN' if r['clean'] else 'noisy'} "
                f"[{n_clean(n_low)}/{n_clean(n_high)} clean]",
                file=sys.stderr,
            )

    def summary(cores: int) -> dict:
        rs = reps[cores]
        clean = [r for r in rs if r["clean"]] or rs
        walls = [r["wall"] for r in clean]
        cwalls = [r["compute_wall"] for r in clean]
        rows = rs[-1]["rows"]
        med = statistics.median(walls)
        return {
            "reps": len(rs),
            "clean_reps": sum(r["clean"] for r in rs),
            "walls_all": [round(r["wall"], 2) for r in rs],
            "probes_all": [round(r["probe"], 2) for r in rs],
            "clean_walls": [round(w, 2) for w in walls],
            "median_clean_wall": round(med, 2),
            "min_wall": round(min(r["wall"] for r in rs), 2),
            "median_clean_compute": round(statistics.median(cwalls), 2),
            "min_compute": round(min(r["compute_wall"] for r in rs), 2),
            "rows": rows,
            "turns_per_sec_median_clean": round(rows / med, 1),
            "routed_counts": rs[-1]["counts"],
            "bytes_written": rs[-1]["bytes"],
            "files_written": rs[-1]["files"],
        }

    lo, hi = summary(n_low), summary(n_high)
    ratio = n_high / n_low
    report = {
        "protocol": (
            "probe-gated clean-window campaign: interleaved levels, fresh "
            f"JVM + warm-up per rep, rep clean iff probe <= {gate:.2f}s "
            f"(quiet {quiet:.2f}s x {slack:.2f})"
        ),
        "sf_dir": sf_dir,
        "inflate": inflate,
        "levels": {str(n_low): lo, str(n_high): hi},
        "efficiency_median_clean": round(
            lo["median_clean_wall"] / (ratio * hi["median_clean_wall"]), 3
        ),
        "efficiency_min": round(
            lo["min_wall"] / (ratio * hi["min_wall"]), 3
        ),
        "compute_efficiency_median_clean": round(
            lo["median_clean_compute"] / (ratio * hi["median_clean_compute"]),
            3,
        ),
        "compute_efficiency_min": round(
            lo["min_compute"] / (ratio * hi["min_compute"]), 3
        ),
        "gate_met_median": lo["median_clean_wall"]
        / (ratio * hi["median_clean_wall"])
        >= 0.8,
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
