"""ChangeFeedReader — checkpointed incremental consumption of a LakeTable.

The consumer-side completion of the reference's distribution path: where
BinLake pushes decoded changes to Kafka consumers (DefaultProducer.java's
sync send + ack/refcount release), a lake-native consumer *pulls* the
row-level diff between the last version it committed and CURRENT
(:meth:`LakeTable.read_changes`) — same delivery contract (at-least-once
until commit, per-consumer positions), no broker in the path.

Semantics:

- ``poll(spark)`` returns ``(changes_df, cursor)`` — the net I/U/D rows
  from the committed position to the table's CURRENT version — or ``None``
  when caught up.  Nothing is acknowledged by polling.
- ``commit(cursor)`` durably advances the position (atomic tmp+rename,
  the same publish pattern as table snapshots).  Crash between poll and
  commit ⇒ the next poll re-delivers the same window: at-least-once, and
  idempotent downstream because the feed is a *net* diff keyed by the
  merge key (applying it twice is a no-op upsert).
- First poll: ``initial="snapshot"`` (default) delivers the whole current
  table as 'I' rows — the Debezium initial-snapshot analog, pairing with
  `bootstrap_snapshot` on the write side; ``initial="current"`` starts
  empty at CURRENT and only ever sees forward changes.

Scale: a poll costs what `read_changes` costs — manifest-pruned to the
buckets that moved since the committed position; a caught-up poll is one
snapshot-JSON read, zero Spark jobs.  Retention interplay: the committed
position must stay within `expire_snapshots` retention; a reader that
falls behind gets :class:`FeedBehindRetention` and must re-bootstrap
(``reset()``) rather than silently miss deletes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binlake_spark.lake.table import LakeTable, _atomic_write_json

FEEDS_DIR = "feeds"


class FeedBehindRetention(RuntimeError):
    """The committed feed position was expired by `expire_snapshots` —
    the diff base is gone, so deletes since then are unrecoverable.
    Re-bootstrap with `reset()` (full snapshot re-delivery)."""


class ChangeFeedReader:
    def __init__(
        self,
        table: LakeTable,
        consumer_id: str = "default",
        checkpoint_dir: str | None = None,
        initial: str = "snapshot",
    ):
        if initial not in ("snapshot", "current"):
            raise ValueError(f"initial must be 'snapshot' or 'current', got {initial!r}")
        self.table = table
        self.consumer_id = consumer_id
        self.initial = initial
        base = checkpoint_dir or os.path.join(table.meta_dir, FEEDS_DIR)
        os.makedirs(base, exist_ok=True)
        self._path = os.path.join(base, f"{consumer_id}.json")

    # ------------------------------------------------------------------ #
    def position(self) -> int | None:
        """Last committed table version, or None before the first commit."""
        if not os.path.exists(self._path):
            return None
        with open(self._path) as f:
            return int(json.load(f)["version"])

    def commit(self, cursor: int) -> None:
        """Durably advance the position to ``cursor`` (atomic publish).
        Refuses to move backwards — replays are requested via `reset()`,
        never by silently rewinding an acknowledged position."""
        pos = self.position()
        if pos is not None and int(cursor) < pos:
            raise ValueError(f"cursor {cursor} is behind committed position {pos}")
        _atomic_write_json(
            self._path, {"version": int(cursor), "consumer_id": self.consumer_id}
        )

    def reset(self) -> None:
        """Drop the committed position: the next poll re-bootstraps per
        ``initial`` (full snapshot re-delivery or skip-to-current)."""
        if os.path.exists(self._path):
            os.unlink(self._path)

    # ------------------------------------------------------------------ #
    def poll(
        self, spark: SparkSession, with_preimage: bool = False
    ) -> tuple[DataFrame, int] | None:
        """Changes since the committed position, or None when caught up.
        ``with_preimage`` passes through to :meth:`LakeTable.read_changes`
        (the initial-snapshot window has no preimages and emits a NULL
        ``_pre``)."""
        snap = self.table.snapshot()
        cur = int(snap["version"])
        pos = self.position()

        if pos is None:
            if self.initial == "current":
                self.commit(cur)  # nothing delivered, so committing is safe
                return None
            key = snap["key_col"]
            df = self.table.read(spark, with_seq=True, version=cur)
            data_cols = [c for c in df.columns if c not in (key, "_seq")]
            out = df.select(
                key, *data_cols, "_seq", F.lit("I").alias("_change_op")
            )
            if with_preimage:
                from pyspark.sql import types as T

                pre_t = T.StructType(
                    [out.schema[c] for c in data_cols]
                    + [T.StructField("_seq", T.LongType(), True)]
                )
                out = out.withColumn("_pre", F.lit(None).cast(pre_t))
            return out, cur

        if cur == pos:
            return None
        try:
            return (
                self.table.read_changes(
                    spark, from_version=pos, to_version=cur,
                    with_preimage=with_preimage,
                ),
                cur,
            )
        except FileNotFoundError as e:
            raise FeedBehindRetention(
                f"consumer {self.consumer_id!r} is committed at version {pos}, "
                f"which expire_snapshots has reclaimed: {e}. reset() to "
                "re-bootstrap from a full snapshot."
            ) from e

    def poll_for_merge(self, spark: SparkSession) -> tuple[DataFrame, int] | None:
        """:meth:`poll`, with rows re-stamped for a downstream MERGE.

        Two CDF-contract seqs would lose a strict ``seq > _seq`` LWW at
        the destination even though they must apply:

        - **D rows** carry the *preimage* ``_seq`` — a tie against the
          destination's copy of that very row;
        - **U rows whose winner seq regressed** (the source admitted a
          fresh lower-seq event after a delete — legal, the retransmit
          fence is per-bucket-monotone-opt-in) — an outright loss.

        The true ordering position of either change is not retained by
        the source, but it is bracketed: from-window max < event ≤ hi,
        where hi is the to-snapshot's max applied watermark.  Re-stamping
        at ``hi`` is sound: ahead of anything the destination holds from
        earlier windows (dst seqs ≤ from-window max < hi) and behind
        every event of later windows; on redelivery the destination's
        own LWW absorbs the already-applied change."""
        polled = self.poll(spark, with_preimage=True)
        if polled is None:
            return None
        out, cur = polled
        hi = max(
            (int(v) for v in (self.table.snapshot(cur).get("watermarks") or {}).values()),
            default=-1,
        )
        if hi >= 0:
            needs_stamp = (F.col("_change_op") == "D") | (
                (F.col("_change_op") == "U")
                & (F.col("_pre._seq") >= F.col("_seq"))
            )
            out = out.withColumn(
                "_seq", F.when(needs_stamp, F.lit(hi)).otherwise(F.col("_seq"))
            )
        return out.drop("_pre"), cur

    # ------------------------------------------------------------------ #
    def apply_to(self, spark: SparkSession, dst: LakeTable):
        """Replicate one feed window into another LakeTable — lake→lake
        downstream replication, the consumer side of the reference's
        multi-topic distribution but with the lake as the transport.

        One call = poll → align ``dst``'s schema (additive, mirrors the
        source's evolution) → MERGE the window as a keyed net diff
        (I/U upsert, D tombstone, LWW on the feed's ``_seq``) → advance
        the consumer position.  Returns the MergeResult, or None when
        caught up.

        Exactly-once downstream: the position commits only *after* the
        merge's snapshot commit.  A crash between the two redelivers the
        window, which re-merges under a fresh epoch as the same keyed
        net diff — per-row ``_seq`` LWW makes the re-apply a no-op, so
        the destination converges to the identical state (verified in
        tests/test_change_feed.py replication tests).  Delete ordering
        across the strict-LWW merge is handled by
        :meth:`poll_for_merge`'s tombstone re-stamp."""
        from binlake_spark.lake.merge import merge_into

        polled = self.poll_for_merge(spark)
        if polled is None:
            return None
        out, cur = polled

        dst_have = {f.name for f in dst.schema().fields}
        missing = [
            (f.name, f.dataType.simpleString())
            for f in out.schema.fields
            if f.name not in dst_have and f.name not in ("_seq", "_change_op")
        ]
        if missing:
            dst.add_columns(missing)

        stream_id = f"feed:{self.consumer_id}"
        res = merge_into(
            spark,
            dst,
            out,
            epoch_id=dst.last_epoch(stream_id) + 1,
            stream_id=stream_id,
            seq_col="_seq",
            op_col="_change_op",
        )
        self.commit(cur)
        return res
