"""Strong-scaling phase attribution (round-4 verdict item #5).

SCALING_*_r04 measured strong-scaling efficiency ~0.52 (COW) / 0.56
(MOR) from local[2] to local[8] against a ~0.91 machine ceiling.  This
harness attributes the gap using the per-epoch ``phase_ms`` lineage
breakdown (materialize / evolve / write / footer, with the snapshot
commit and micro-batch planning appearing as the residual):

    python profile_scaling.py                 # orchestrates both modes
    BINLAKE_PROFILE_CPUS=8 python profile_scaling.py --one  # one leg

Per leg (own JVM via subprocess, like scale_bench.py): replay a FIXED
deterministic change log at local[N], then read the committed lineage
back from the table and sum each phase across epochs.  A phase whose
time stays flat from 2 to 8 cores is serial; one that shrinks ~4x is
parallel.  Output: PROFILE_<label>.json with per-phase sums at both
parallelisms, their 2→8 speedups, and cpu probes.

Evidence-hygiene: same rules as scale_bench.py — never writes BENCH.md,
one JSON artifact, probes before/after every rep.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

EVENTS = int(os.environ.get("BINLAKE_PROFILE_EVENTS", "4000000"))
EPOCHS = int(os.environ.get("BINLAKE_PROFILE_EPOCHS", "4"))
REPS = int(os.environ.get("BINLAKE_PROFILE_REPS", "2"))
LABEL = os.environ.get("BINLAKE_PROFILE_LABEL", "r05")


def one_leg() -> int:
    """Run one replay in THIS process and print a JSON line with the
    per-epoch lineage phases."""
    import shutil
    import time

    from bench import _cached_change_log  # reuse the disk-cached generator
    from binlake_spark.changelog import GenSpec
    from binlake_spark.session import get_spark
    from binlake_spark.streaming import CdcEngine

    cpus = int(os.environ["BINLAKE_PROFILE_CPUS"])
    mode = os.environ.get("BINLAKE_PROFILE_MODE", "cow")
    spark = get_spark("binlake_profile", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spec = GenSpec(
        n_docs=max(1_000, EVENTS // 25),
        n_events=EVENTS,
        events_per_epoch=max(1, EVENTS // EPOCHS),
        retransmit_frac=0.05,
        hot_keys=5,
        hot_frac=0.1,
        evolution_at=EVENTS // 2,
        seed=42,
    )
    src, files, total = _cached_change_log(spec)
    work = tempfile.mkdtemp(prefix="binlake_profile_")
    try:
        # warmup epoch on a throwaway table (JIT, python workers, Arrow)
        wspec = GenSpec(n_docs=1_000, n_events=20_000, events_per_epoch=10_000,
                        retransmit_frac=0.05, hot_keys=2, hot_frac=0.1,
                        evolution_at=10_000, seed=7)
        wsrc, _, _ = _cached_change_log(wspec)
        wt = CdcEngine.create_table(os.path.join(work, "warm"), num_buckets=8)
        CdcEngine(wt).run_batch_replay(spark, wsrc)

        table = CdcEngine.create_table(os.path.join(work, "docs"), num_buckets=32)
        engine = CdcEngine(table, salt=None, mode=mode)
        t0 = time.monotonic()
        engine.run_stream(
            spark, src, os.path.join(work, "ckpt"), max_files_per_trigger=2
        )
        replay_wall = time.monotonic() - t0

        entries = [
            e for e in table.snapshot()["lineage"] if e.get("kind") == "merge"
        ]
        print(json.dumps({
            "cpus": cpus,
            "mode": mode,
            "events": total,
            "replay_wall_sec": round(replay_wall, 3),
            "epochs": [
                {
                    "epoch_id": e["epoch_id"],
                    "wall_ms": e["wall_ms"],
                    "phase_ms": e.get("phase_ms") or {},
                    "n_events": e["n_events"],
                }
                for e in entries
            ],
        }))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def run_leg(cpus: int, mode: str) -> dict:
    from bench_util import cpu_probe

    best = None
    reps = []
    for _ in range(REPS):
        p0 = cpu_probe()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one"],
            env=dict(os.environ, BINLAKE_PROFILE_CPUS=str(cpus),
                     BINLAKE_PROFILE_MODE=mode),
            capture_output=True, text=True, timeout=1800,
        )
        p1 = cpu_probe()
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        r["probe_before_sec"], r["probe_after_sec"] = p0, p1
        reps.append(r)
        if best is None or r["replay_wall_sec"] < best["replay_wall_sec"]:
            best = r
    return {"best": best, "rep_walls": [r["replay_wall_sec"] for r in reps],
            "probes": [(r["probe_before_sec"], r["probe_after_sec"]) for r in reps]}


def attribute(leg: dict) -> dict:
    """Sum phases across epochs.  Phase clocks: materialize_ms +
    evolve_ms run in the ENGINE before merge's wall_ms starts, so one
    epoch's total is materialize + evolve + merge wall; inside the merge
    wall, write_ms + footer_ms are named and the rest (metadata
    aggregation glue + snapshot commit) is ``merge_residual``.  The
    inter-epoch gap (replay wall − Σ epoch totals) is Structured
    Streaming's per-trigger overhead: source listing, micro-batch
    planning, checkpoint writes."""
    phases = {"materialize": 0.0, "evolve": 0.0, "write": 0.0,
              "footer": 0.0, "merge_residual": 0.0}
    total = 0.0
    for e in leg["best"]["epochs"]:
        ph = e["phase_ms"]
        mat, evo = ph.get("materialize_ms", 0), ph.get("evolve_ms", 0)
        mer = e["wall_ms"]
        wr, ft = ph.get("write_ms", 0), ph.get("footer_ms", 0)
        total += (mat + evo + mer) / 1000.0
        phases["materialize"] += mat / 1000.0
        phases["evolve"] += evo / 1000.0
        phases["write"] += wr / 1000.0
        phases["footer"] += ft / 1000.0
        phases["merge_residual"] += (mer - wr - ft) / 1000.0
    return {
        "replay_wall_sec": leg["best"]["replay_wall_sec"],
        "epoch_total_sec": round(total, 3),
        "phase_sec": {k: round(v, 3) for k, v in sorted(phases.items())},
        "inter_epoch_gap_sec": round(
            leg["best"]["replay_wall_sec"] - total, 3
        ),
    }


def main() -> int:
    if "--one" in sys.argv:
        return one_leg()
    started = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    result = {"metric": "cdc_strong_scaling_phase_attribution",
              "label": LABEL, "events": EVENTS, "epochs": EPOCHS,
              "reps_per_leg": REPS, "started_utc": started, "modes": {}}
    for mode in ("cow", "mor"):
        legs = {}
        for cpus in (2, 8):
            leg = run_leg(cpus, mode)
            legs[f"local{cpus}"] = {**attribute(leg),
                                    "rep_walls": leg["rep_walls"],
                                    "probes": leg["probes"]}
        a, b = legs["local2"], legs["local8"]
        speedup = {
            k: round(a["phase_sec"][k] / b["phase_sec"][k], 2)
            for k in a["phase_sec"]
            if b["phase_sec"].get(k, 0) > 0.05
        }
        speedup["inter_epoch_gap"] = round(
            a["inter_epoch_gap_sec"] / max(b["inter_epoch_gap_sec"], 1e-9), 2
        )
        legs["speedup_2_to_8"] = speedup
        legs["strong_efficiency"] = round(
            a["replay_wall_sec"] / b["replay_wall_sec"] / 4, 3
        )
        result["modes"][mode] = legs
    result["finished_utc"] = datetime.datetime.now(
        datetime.timezone.utc
    ).isoformat(timespec="seconds")
    print(json.dumps(result, indent=1))
    with open(os.path.join(HERE, f"PROFILE_{LABEL}.json"), "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
