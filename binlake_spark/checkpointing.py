"""Materialization-primitive selection for iterative / fan-in plans.

Several operators materialize an intermediate frame so it is computed
exactly once (BPE training rounds, connected-component label rounds,
substring-dedup fingerprint sets, IVF Lloyd centroids, the ngram
posting list).  Two Spark primitives can do this:

- ``DataFrame.localCheckpoint()`` — truncates lineage and pins the
  blocks in EXECUTOR storage.  Fast (no external write), but the blocks
  die with the executor: on a real cluster, losing ONE executor
  mid-job aborts the whole job instead of recomputing, because the
  lineage needed to rebuild the blocks was discarded.  Fine for tests,
  benchmarks, and single-node local[] runs.
- ``DataFrame.checkpoint()`` — same lineage truncation, but the blocks
  are written to the RELIABLE checkpoint directory (HDFS/S3/...), so an
  executor loss recomputes nothing and loses nothing.  This is the
  100-TB posture: a multi-hour dedup or BPE job must survive node loss
  the same way the engine's positions survive it (the reference keeps
  resume state in ZooKeeper for exactly this reason — a wave node dying
  must not lose the fleet's progress, ZkLeaderSelector.java:184-220).

The knob is process-global (operators pick it up at call time, no
signature churn):

    from binlake_spark.checkpointing import set_checkpoint_mode
    set_checkpoint_mode("reliable", spark, "hdfs://...checkpoints/run1")
    ... run dedup / bpe_train / ivf as usual ...
    set_checkpoint_mode("local")

Results are bit-identical between modes (pinned by
tests/test_checkpoint_mode.py); only the failure/recovery story and
the materialization cost differ.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

LOCAL = "local"
RELIABLE = "reliable"

_lock = threading.Lock()
_mode = LOCAL


def set_checkpoint_mode(mode: str, spark=None, checkpoint_dir: str | None = None) -> None:
    """Select the materialization primitive for every subsequent
    operator-internal checkpoint.

    ``mode="reliable"`` requires a Spark checkpoint directory: pass
    ``spark`` + ``checkpoint_dir`` to have it set here, or call
    ``spark.sparkContext.setCheckpointDir(...)`` yourself beforehand —
    ``DataFrame.checkpoint()`` raises at the first materialization
    otherwise (fail-fast is deliberate: silently falling back to
    executor-pinned blocks would reintroduce the exposure the caller
    opted out of)."""
    global _mode
    if mode not in (LOCAL, RELIABLE):
        raise ValueError(f"checkpoint mode must be 'local' or 'reliable', got {mode!r}")
    if mode == RELIABLE and spark is not None:
        if checkpoint_dir is not None:
            spark.sparkContext.setCheckpointDir(checkpoint_dir)
        elif spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
            raise ValueError(
                "reliable checkpoint mode needs a checkpoint directory: pass "
                "checkpoint_dir= or call spark.sparkContext.setCheckpointDir first"
            )
    with _lock:
        _mode = mode


def checkpoint_mode() -> str:
    """The currently selected mode ('local' or 'reliable')."""
    return _mode


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage and materialize ``df`` with the selected
    primitive.  ``eager=True`` (default, matching ``localCheckpoint``)
    runs the job now; ``eager=False`` defers to first use."""
    if _mode == RELIABLE:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def release(df: DataFrame) -> None:
    """Release a frame materialized by :func:`materialize` once it is
    superseded (iterative loops would otherwise pin every round's blocks
    in storage).  ``unpersist`` covers the localCheckpoint blocks; for
    reliable checkpoints the files are owned by the checkpoint dir and
    reclaimed when the caller removes the run's directory."""
    try:
        df.unpersist()
    except Exception:
        pass
