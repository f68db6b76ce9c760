"""End-to-end demo: stream a synthetic binlog into a LakeTable, kill the
query mid-stream, resume from checkpoint, and prove the final state matches
the oracle exactly.

Run:  spark-submit examples/replay_demo.py [cow|mor]  (or plain python)

``mor`` replays through the merge-on-read path (delta appends + read-time
LWW + periodic compaction) instead of copy-on-write; the oracle check is
identical.
"""

import shutil
import sys
import tempfile

import numpy as np

from binlake_spark.changelog import (
    GenSpec,
    generate_change_log,
    oracle_final_state,
    write_change_log,
)
from binlake_spark.session import get_spark
from binlake_spark.streaming import CdcEngine


def main() -> int:
    work = tempfile.mkdtemp(prefix="binlake_demo_")
    spark = get_spark("replay_demo", cpus=8, shuffle_partitions=8)

    spec = GenSpec(
        n_docs=300,
        n_events=5000,
        events_per_epoch=500,
        retransmit_frac=0.1,
        hot_keys=3,
        hot_frac=0.3,
        evolution_at=2500,
    )
    pdf = generate_change_log(spec)
    src = f"{work}/change_log"
    files = write_change_log(pdf, src)
    print(f"change log: {len(pdf)} events in {len(files)} epoch files at {src}")

    mode = sys.argv[1] if len(sys.argv) > 1 else "cow"
    table = CdcEngine.create_table(f"{work}/docs", num_buckets=16)
    # salt exercises the two-stage agg path in COW; MOR uses the default
    # bucketed joinback
    engine = (
        CdcEngine(table, salt=8)
        if mode == "cow"
        else CdcEngine(table, mode="mor", mor_compact_every=3)
    )
    print(f"engine mode: {mode}")

    print("phase 1: streaming with maxFilesPerTrigger=1, killing after 3 epochs …")
    engine.run_stream(
        spark, src, f"{work}/ckpt", max_files_per_trigger=1, stop_after_epochs=3
    )
    mid = table.last_epoch("cdc")
    print(f"  killed at epoch {mid}; table version {table.snapshot()['version']}")

    print("phase 2: resuming from checkpoint to drain the log …")
    engine.run_stream(spark, src, f"{work}/ckpt", max_files_per_trigger=1)
    print(f"  final epoch {table.last_epoch('cdc')}")

    expected = oracle_final_state(pdf)
    got = engine.read_state(spark).orderBy("doc_id").collect()
    assert len(got) == len(expected), (len(got), len(expected))
    for row, (_, ref) in zip(got, expected.iterrows()):
        assert row.doc_id == ref.doc_id
        assert np.array_equal(np.array(row.tokens, dtype=np.int32), ref.tokens)
        assert row.lang == ref.lang
    print(f"final state: {len(got)} live docs — exact token-array match vs oracle ✓")

    engine.lineage(spark).orderBy("epoch_id").select(
        "epoch_id", "n_events", "n_upserts", "n_deletes", "n_buckets", "wall_ms"
    ).show()
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
