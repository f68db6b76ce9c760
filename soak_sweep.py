"""Continuous-ingest soak sweep → one machine-readable artifact.

Round 2's soak numbers lived only in BENCH.md prose (and were then lost
in the d4a0be9 clobber); this harness runs `soak_bench.py` across the
(mode, offered-rate) grid in separate JVMs and records every result —
plus the same single-thread CPU noise probes `scale_bench.py` uses — in
``SOAK_<label>.json``, so sustained-ingest capacity is tracked round
over round as a checked-in artifact, not prose.

Gate (BENCH.md round-3 target): COW sustains ≥150k events/s offered and
MOR ≥500k applied at local[8] in a quiet window.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
LABEL = os.environ.get("BINLAKE_SOAK_LABEL", "r03")
SECONDS = os.environ.get("BINLAKE_SOAK_SECONDS", "90")
CPUS = os.environ.get("BINLAKE_BENCH_CPUS", "8")
# (mode, offered events/s) grid — the round-1 capacity envelope points
CONFIGS = [
    ("cow", 150_000),
    ("cow", 300_000),
    ("mor", 600_000),
    ("mor", 1_000_000),
]


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_util import cpu_probe  # noqa: E402  (shared noise probe)


def run_once(mode: str, rate: int) -> dict:
    env = dict(
        os.environ,
        BINLAKE_SOAK_MODE=mode,
        BINLAKE_SOAK_RATE=str(rate),
        BINLAKE_SOAK_SECONDS=SECONDS,
        BINLAKE_BENCH_CPUS=CPUS,
    )
    p0 = cpu_probe()
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "soak_bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    p1 = cpu_probe()
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    r["probe_before_sec"] = p0
    r["probe_after_sec"] = p1
    return r


def main() -> int:
    started = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    runs = [run_once(mode, rate) for mode, rate in CONFIGS]

    probes = [p for r in runs for p in (r["probe_before_sec"], r["probe_after_sec"])]
    best_probe = min(probes)
    noisy = [round(p / best_probe, 2) for p in probes if p > 1.5 * best_probe]

    cow_best = max(r["value"] for r in runs if r["mode"] == "cow")
    mor_best = max(r["value"] for r in runs if r["mode"] == "mor")
    result = {
        "metric": "cdc_soak_sweep_applied_events_per_sec",
        "label": LABEL,
        "started_utc": started,
        "finished_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "cpus": int(CPUS),
        "seconds_per_run": int(SECONDS),
        "gates": {
            "cow_applied_per_sec_min": 150_000,
            "mor_applied_per_sec_min": 500_000,
            "cow_best_applied_per_sec": cow_best,
            "mor_best_applied_per_sec": mor_best,
            "cow_pass": cow_best >= 150_000,
            "mor_pass": mor_best >= 500_000,
        },
        "noise": {
            "probe_best_sec": best_probe,
            "probes_over_1p5x": noisy,
            "window_quiet": len(noisy) == 0,
        },
        "runs": runs,
    }
    print(json.dumps(result))
    with open(os.path.join(HERE, f"SOAK_{LABEL}.json"), "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
