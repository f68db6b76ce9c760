"""Memory-bandwidth scaling probe (round-5 strong-scaling attribution).

The CDC replay's dominant phase (``materialize``: parquet scan → winner
shuffle → fused Arrow decode → persist) is memory-bandwidth-bound, not
CPU-bound, so its 2→8-core speedup must be read against the machine's
*bandwidth* ceiling, not the ~0.91-efficiency pure-CPU ceiling that
``bench_util.cpu_probe`` measures.  This probe measures that ceiling:
each process streams over a 512 MiB float64 array (``copy`` = one read +
one write pass) with a warm pool (fork + first-touch page faults excluded
— they dominated a cold run by 3-4×), best-of-N per parallelism level
per the VM noise protocol used by every other harness here.

    python membw_probe.py            # writes MEMBW_<label>.json

Output: per-leg rep list + best aggregate GB/s at 2 and 8 processes and
the best-over-best 2→8 speedup.  Evidence-hygiene: never writes
BENCH.md; one JSON artifact; all reps recorded.
"""

from __future__ import annotations

import datetime
import json
import multiprocessing as mp
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
MB = int(os.environ.get("BINLAKE_MEMBW_MB", "512"))
PASSES = int(os.environ.get("BINLAKE_MEMBW_PASSES", "8"))
REPS = int(os.environ.get("BINLAKE_MEMBW_REPS", "5"))
LABEL = os.environ.get("BINLAKE_MEMBW_LABEL", "r05")


def _work(_: int) -> float:
    x = np.empty(MB * 1024 * 1024 // 8, dtype=np.float64)
    x[:] = 1.0
    t0 = time.monotonic()
    for _ in range(PASSES):
        y = x.copy()
        x[0] = y[0]  # defeat dead-store elimination
    return time.monotonic() - t0


def run_leg(n: int) -> float:
    """Aggregate GB/s over n concurrent streaming processes."""
    with mp.Pool(n) as pool:
        pool.map(_work, range(n))  # warm: fork, allocator, page tables
        t0 = time.monotonic()
        pool.map(_work, range(n))
        wall = time.monotonic() - t0
    gb = n * PASSES * 2 * MB / 1024.0  # read + write per pass
    return round(gb / wall, 2)


def main() -> int:
    started = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"
    )
    reps: dict[int, list[float]] = {2: [], 8: []}
    for _ in range(REPS):
        for n in (2, 8):  # interleave so noise bursts hit both legs
            reps[n].append(run_leg(n))
    result = {
        "metric": "machine_membw_scaling",
        "label": LABEL,
        "array_mb": MB,
        "passes": PASSES,
        "started_utc": started,
        "legs": {
            f"procs{n}": {"reps_gb_per_sec": reps[n], "best": max(reps[n])}
            for n in (2, 8)
        },
        "bw_speedup_2_to_8_best": round(max(reps[8]) / max(reps[2]), 2),
        "finished_utc": datetime.datetime.now(
            datetime.timezone.utc
        ).isoformat(timespec="seconds"),
    }
    print(json.dumps(result, indent=1))
    with open(os.path.join(HERE, f"MEMBW_{LABEL}.json"), "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
