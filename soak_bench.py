"""Continuous-ingest soak: unbounded rate-source stream → CDC engine.

The scaling bench (scale_bench.py) replays a bounded log; this harness
runs the engine the way production runs it — an endless change stream,
fixed-interval triggers, state growing across epochs — and reports
whether it keeps up.

    python soak_bench.py                      # 200k events/s for 60 s
    BINLAKE_SOAK_RATE=500000 BINLAKE_SOAK_SECONDS=120 python soak_bench.py

The synthetic envelope is generated JVM-side from the rate source (pure
functions of the offset — deterministic at any parallelism, zero driver
cost; sources/changelog_sources.py), so generation is part of the
measured path.  "Keeping up" = every trigger's batch duration below the
trigger interval and applied max seq tracking the emitted offset.

Prints one JSON line: events applied, applied/s, epochs, p50/p95 epoch
wall, behind_seconds at stop.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RATE = int(os.environ.get("BINLAKE_SOAK_RATE", "200000"))
SECONDS = int(os.environ.get("BINLAKE_SOAK_SECONDS", "60"))
TRIGGER = int(os.environ.get("BINLAKE_SOAK_TRIGGER", "10"))
CPUS = int(os.environ.get("BINLAKE_BENCH_CPUS", os.environ.get("SPARK_GRAFT_CPUS", "8")))
N_DOCS = int(os.environ.get("BINLAKE_SOAK_DOCS", "200000"))
MODE = os.environ.get("BINLAKE_SOAK_MODE", "cow")


def main() -> int:
    from binlake_spark.session import get_spark
    from binlake_spark.sources.changelog_sources import rate_changelog_stream
    from binlake_spark.streaming import CdcEngine

    spark = get_spark("binlake_soak", cpus=CPUS, shuffle_partitions=CPUS)
    work = tempfile.mkdtemp(prefix="binlake_soak_")
    try:
        table = CdcEngine.create_table(os.path.join(work, "docs"), num_buckets=32)
        engine = CdcEngine(table, mode=MODE)
        # tokens-only envelope: the SQL byte-packing of the synthetic
        # payload costs more than the whole ingest pipeline and would
        # measure the generator, not the engine (payload decode is covered
        # by the file-based bench)
        stream = rate_changelog_stream(
            spark,
            rows_per_second=RATE,
            n_docs=N_DOCS,
            tokens_per_doc=16,
            with_payload=False,
        )
        t0 = time.monotonic()
        q = (
            stream.writeStream.foreachBatch(
                lambda df, eid: engine.apply_batch(df, eid) and None
            )
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(processingTime=f"{TRIGGER} seconds")
            .start()
        )
        time.sleep(SECONDS)
        q.stop()
        deadline = time.monotonic() + 120
        while q.isActive and time.monotonic() < deadline:
            time.sleep(0.5)
        elapsed = time.monotonic() - t0

        snap = table.snapshot()
        max_seq = max([int(w) for w in snap["watermarks"].values()] or [0])
        merges = [e for e in table._all_lineage() if e.get("kind") == "merge"]
        epoch_walls = sorted(
            e["wall_ms"] + e.get("phase_ms", {}).get("materialize_ms", 0)
            for e in merges
        )
        behind = max(0.0, elapsed - max_seq / RATE)
        print(
            json.dumps(
                {
                    "metric": "cdc_soak_applied_events_per_sec",
                    "value": round(max_seq / elapsed, 1),
                    "unit": "events/sec",
                    "rate_offered": RATE,
                    "seconds": round(elapsed, 1),
                    "events_applied_through_seq": max_seq,
                    "epochs": len(merges),
                    "live_rows": table.read(spark).count(),
                    "epoch_wall_ms_p50": epoch_walls[len(epoch_walls) // 2]
                    if epoch_walls
                    else None,
                    "epoch_wall_ms_max": epoch_walls[-1] if epoch_walls else None,
                    "behind_seconds_at_stop": round(behind, 1),
                    "keeping_up": bool(
                        epoch_walls and epoch_walls[-1] < TRIGGER * 1000 * 2
                    ),
                    "mode": MODE,
                    "cpus": CPUS,
                }
            )
        )
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
