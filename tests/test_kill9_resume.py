"""Hard-failure exactly-once: SIGKILL the ingest process mid-stream (no
shutdown hooks, torn in-flight state possible), resume from the Spark
checkpoint in a fresh process, and land on the oracle-exact final table.

This is the literal north-rule sentence — "a killed job resumes and
replays to the identical final table" — under the harshest kill, not a
graceful query stop (that case is test_streaming.py).  Survives because:
the snapshot link is the commit point (a torn data dir c{N} without its
snapshot is invisible and overwritten on replay), foreachBatch re-delivers
the uncommitted epoch, and the epoch guard skips everything already
committed.
"""

import os
import signal
import subprocess
import sys
import textwrap
import time

from binlake_spark.changelog import (
    GenSpec,
    generate_change_log,
    oracle_final_state,
    write_change_log,
)
from binlake_spark.lake.table import LakeTable
from binlake_spark.streaming import CdcEngine

import numpy as np
import pytest


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_sigkill_mid_stream_then_resume(spark, tmp_path, mode):
    spec = GenSpec(
        n_docs=80, n_events=2000, events_per_epoch=200,
        retransmit_frac=0.1, evolution_at=1000,
    )
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    root = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    CdcEngine.create_table(root, num_buckets=4)

    child_code = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
        from binlake_spark.session import get_spark
        from binlake_spark.lake.table import LakeTable
        from binlake_spark.streaming import CdcEngine
        spark = get_spark("kill9_child", cpus=2, shuffle_partitions=2)
        engine = CdcEngine(LakeTable({repr(root)}), mode={repr(mode)},
                           mor_compact_every=3)
        engine.run_stream(spark, {repr(src)}, {repr(ckpt)}, max_files_per_trigger=1)
        """
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", child_code],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    table = LakeTable(root)
    try:
        deadline = time.monotonic() + 240
        while time.monotonic() < deadline:
            if table.last_epoch("cdc") >= 2:
                break
            if proc.poll() is not None:
                raise AssertionError("child exited before reaching epoch 2")
            time.sleep(0.3)
        assert table.last_epoch("cdc") >= 2, "child too slow to reach epoch 2"
        # the hard kill: no cleanup, mid-whatever-it-was-doing
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    killed_at = table.last_epoch("cdc")
    # resume in THIS process from the same checkpoint and drain — MOR
    # resumes with outstanding deltas and periodic tombstone-retaining
    # compaction straddling the kill point
    engine = (CdcEngine(table) if mode == "cow"
              else CdcEngine(table, mode="mor", mor_compact_every=3))
    engine.run_stream(spark, src, ckpt, max_files_per_trigger=1)
    assert table.last_epoch("cdc") > killed_at

    expected = oracle_final_state(pdf)
    got = engine.read_state(spark).orderBy("doc_id").collect()
    assert len(got) == len(expected)
    for row, (_, ref) in zip(got, expected.iterrows()):
        assert row.doc_id == ref.doc_id
        assert np.array_equal(np.array(row.tokens, dtype=np.int32), ref.tokens)
