"""Shared noise calibration for the bench harnesses.

All three harnesses (bench.py, scale_bench.py, soak_sweep.py) stamp
their JSON artifacts with the SAME fixed single-thread CPU probe so
probe_sec values are comparable across artifacts: ~0.61 s on this VM
when quiet; >1.5x that means hypervisor-neighbor load was present during
the window (BENCH.md evidence-hygiene rules)."""

import time


def cpu_probe() -> float:
    t0 = time.monotonic()
    acc = 0
    for i in range(12_000_000):
        acc += i * i
    return round(time.monotonic() - t0, 3)
