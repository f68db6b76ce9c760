"""Two-cluster-size scaling evidence for the north rule.

A real N vs 4N executor cluster isn't available in this sandbox, so (per
the driver's instruction) the same job runs at two parallelism levels —
e.g. ``local[2]`` and ``local[8]`` — each in its **own JVM** (subprocess),
on deterministic inputs.  Reports:

- **weak scaling** (the regime that matters at 10^10 events: data grows
  with the cluster): 4× events on 4× cores; efficiency = t_N / t_4N,
  equivalently throughput_4N / (4 · throughput_N) with proportional input.
- **strong scaling** (fixed input, 4× cores): efficiency = speedup / 4.

Why N=2 → 4N=8 and not 8 → 32: this VM advertises 32 vCPUs but they are
heavily oversubscribed by the hypervisor — at 32 busy threads, vmstat
shows ~43% system time and ~15% CPU steal, and local[32] runs *slower*
than local[8] on identical input for any workload.  2 → 8 threads stays
inside the machine's real capacity, so the ratio measures the engine's
scaling rather than the hypervisor's scheduler.  (Measured evidence is
recorded in BENCH.md.)

Evidence-hygiene rules (learned the hard way in round 2, when a stale
auto-rewrite of BENCH.md clobbered the criterion-bearing table):

- this script NEVER writes BENCH.md — it emits ONE machine-readable JSON
  artifact (``SCALING_<mode>_<label>.json``) holding every rep of every
  configuration plus noise-probe calibrations; prose tables are edited by
  hand FROM the artifact and cite it;
- a fixed single-thread CPU probe runs before and after every rep; if the
  window was noisy (probe deviating >1.5× from the best probe seen) the
  artifact says so per-rep, so a reader can tell engine from neighbors.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
BASE_EVENTS = int(os.environ.get("BINLAKE_SCALE_BASE_EVENTS", "1000000"))
N = int(os.environ.get("BINLAKE_SCALE_N", "2"))
N4 = 4 * N
# this VM carries unpredictable external load (hypervisor neighbors, a few
# cores' worth, in bursts) — each configuration runs REPS times and the
# best wall is kept, which measures the engine rather than the neighbors
REPS = int(os.environ.get("BINLAKE_SCALE_REPS", "3"))
MODE = os.environ.get("BINLAKE_BENCH_ENGINE_MODE", "cow")
LABEL = os.environ.get("BINLAKE_SCALE_LABEL", "r03")


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_util import cpu_probe  # noqa: E402  (shared noise probe)


def run_once(cpus: int, events: int) -> dict:
    env = dict(
        os.environ,
        BINLAKE_BENCH_CPUS=str(cpus),
        BINLAKE_BENCH_EVENTS=str(events),
        BINLAKE_BENCH_EPOCHS="4",
        BINLAKE_BENCH_MODE="cdc",
        BINLAKE_BENCH_CDC_REPS="1",  # scale_bench does its own repetition
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    p0 = cpu_probe()
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    p1 = cpu_probe()
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    r["probe_before_sec"] = p0
    r["probe_after_sec"] = p1
    return r


def run(cpus: int, events: int) -> dict:
    reps = [run_once(cpus, events) for _ in range(REPS)]
    best = min(reps, key=lambda r: r["cdc"]["wall_sec"])
    return {
        "best": best,
        "reps": [
            {
                "wall_sec": r["cdc"]["wall_sec"],
                "events_per_sec": r["cdc"]["events_per_sec"],
                "probe_before_sec": r["probe_before_sec"],
                "probe_after_sec": r["probe_after_sec"],
            }
            for r in reps
        ],
    }


def main() -> int:
    started = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    configs = {
        "n_base": (N, BASE_EVENTS),
        "n_4x": (N, BASE_EVENTS * 4),
        "n4_4x": (N4, BASE_EVENTS * 4),
    }
    runs = {k: run(cpus, ev) for k, (cpus, ev) in configs.items()}
    tnb = runs["n_base"]["best"]["cdc"]["wall_sec"]
    tn = runs["n_4x"]["best"]["cdc"]["wall_sec"]
    tn4 = runs["n4_4x"]["best"]["cdc"]["wall_sec"]
    weak_eff = round(tnb / tn4, 3)
    strong_eff = round(tn / tn4 / 4, 3)

    all_probes = [
        p
        for r in runs.values()
        for rep in r["reps"]
        for p in (rep["probe_before_sec"], rep["probe_after_sec"])
    ]
    best_probe = min(all_probes)
    noisy = [round(p / best_probe, 2) for p in all_probes if p > 1.5 * best_probe]

    result = {
        "metric": f"cdc_{MODE}_scaling_efficiency_local{N}_vs_local{N4}",
        "label": LABEL,
        "started_utc": started,
        "finished_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "engine_mode": MODE,
        "base_events": BASE_EVENTS,
        "reps_per_config": REPS,
        "throughput": {
            f"local{N}_base": runs["n_base"]["best"]["cdc"]["events_per_sec"],
            f"local{N}_4x": runs["n_4x"]["best"]["cdc"]["events_per_sec"],
            f"local{N4}_4x": runs["n4_4x"]["best"]["cdc"]["events_per_sec"],
        },
        "wall_sec": {f"local{N}_base": tnb, f"local{N}_4x": tn, f"local{N4}_4x": tn4},
        "weak_scaling_efficiency": weak_eff,
        "strong_scaling_efficiency": strong_eff,
        "noise": {
            "probe_best_sec": best_probe,
            "probes_over_1p5x": noisy,
            "window_quiet": len(noisy) == 0,
        },
        "all_reps": {k: r["reps"] for k, r in runs.items()},
    }
    print(json.dumps(result))
    artifact = os.path.join(HERE, f"SCALING_{MODE}_{LABEL}.json")
    with open(artifact, "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
