"""Bucket-pruned copy-on-write MERGE INTO for :class:`LakeTable`.

Semantics (the Iceberg ``MERGE INTO`` the north rule names, built from
scratch on DataFrame ops):

    MERGE INTO target t USING net s ON t.<key> = s.<key>
    WHEN MATCHED AND s.op = 'D' THEN DELETE
    WHEN MATCHED              THEN UPDATE SET *
    WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *

``net`` must be *net changes*: at most one row per key (the output of
:func:`binlake_spark.operators.compaction.compact_lww`).  Compacting before
the merge is the analog of the reference's packet batching
(ProtobufConverter.formatByRows, ProtobufConverter.java:549-729): MERGE
sees ≤ |keys| rows regardless of how many raw events the batch carried,
which bounds copy-on-write amplification at 10^10-event scale.

Exactly-once is layered:

1. **Epoch guard** — a foreachBatch epoch replayed after a crash is
   detected via the ``epochs`` map committed in the same snapshot as the
   data, and skipped.  (Reference parity: consumers dedup by GTID after an
   at-least-once failover, doc/binlake-arc.md:27 — we move the dedup into
   the committed sink so the guarantee is exactly-once.)
2. **Watermark fence** — events with ``seq`` ≤ the bucket's applied
   high-water mark are dropped, so a retransmitted tail (the reference's
   duplicate window after leader failover) is a no-op even across epochs.
   The fence is a broadcast join against ≤ num_buckets rows — no per-key
   state is kept anywhere (SURVEY §7 M3).
3. **Idempotent body** — even if both guards were bypassed, re-merging the
   same net change is a keyed upsert that converges to the same state.

Physical plan at scale: the anti-join of survivors against net-changes
runs with the *net* side broadcast when small (a micro-batch of net
changes usually is), so the scan of the k dirty buckets is a single
map-side pass — no shuffle of the existing table.  The rewrite is
repartitioned on the bucket id so each output directory is written by one
task (one file per bucket per commit, Iceberg-style).
"""

from __future__ import annotations

import glob
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlake_spark.lake.table import LakeTable


@dataclass
class MergeResult:
    applied: bool
    epoch_id: int
    version: int | None = None
    n_net: int = 0
    n_dirty_buckets: int = 0
    wall_ms: int = 0
    skipped_reason: str | None = None
    partitions: list[dict] = field(default_factory=list)


def merge_into(
    spark: SparkSession,
    table: LakeTable,
    net: DataFrame,
    *,
    epoch_id: int = 0,
    stream_id: str = "default",
    seq_col: str = "seq",
    op_col: str = "op",
    enforce_watermark: bool = True,
    broadcast_net: bool | None = None,
) -> MergeResult:
    """Apply one compacted change batch to the table, exactly once."""
    t0 = time.monotonic()
    snap = table.snapshot()
    key = snap["key_col"]
    num_buckets = snap["num_buckets"]

    # -- 1. epoch idempotence guard ------------------------------------- #
    if epoch_id <= int(snap["epochs"].get(stream_id, -1)):
        return MergeResult(
            applied=False, epoch_id=epoch_id, skipped_reason="epoch-already-applied"
        )

    net = net.withColumn(
        "_bucket", F.pmod(F.hash(F.col(key)), F.lit(num_buckets)).cast("int")
    )

    # -- 2. retransmit fence: drop seq <= applied watermark -------------- #
    if enforce_watermark and snap["watermarks"]:
        wm = table.watermarks_df(spark)
        net = (
            net.join(F.broadcast(wm), "_bucket", "left")
            .filter(F.col(seq_col) > F.coalesce(F.col("_wm"), F.lit(-1)))
            .drop("_wm")
        )

    net = net.persist()
    try:
        # per-bucket lineage stats — one row per dirty bucket, tiny collect
        stats = (
            net.groupBy("_bucket")
            .agg(
                F.max(seq_col).alias("max_seq"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum((F.col(op_col) != "D").cast("long")).alias("n_upserts"),
                F.sum((F.col(op_col) == "D").cast("long")).alias("n_deletes"),
            )
            .collect()
        )
        if not stats:
            # nothing survived the fence: still commit the epoch marker so
            # a replay of this epoch stays a no-op.
            snap["version"] += 1
            snap["epochs"][stream_id] = epoch_id
            snap["lineage"].append(
                {
                    "kind": "merge",
                    "stream_id": stream_id,
                    "epoch_id": epoch_id,
                    "version": snap["version"],
                    "wall_ms": int((time.monotonic() - t0) * 1000),
                    "partitions": [],
                }
            )
            table._write_snapshot(snap)
            return MergeResult(
                applied=True,
                epoch_id=epoch_id,
                version=snap["version"],
                skipped_reason="empty-after-fence",
            )

        dirty = sorted(int(r["_bucket"]) for r in stats)
        n_net = sum(int(r["n_events"]) for r in stats)

        # -- 3. merge body: survivors ∪ upserts, dirty buckets only ------ #
        schema = T.StructType.fromJson(snap["schema"])
        cols = [f.name for f in schema.fields]
        current = table.read(spark, buckets=dirty)

        net_keyed = net.select(key, "_bucket", seq_col, op_col, *[
            c for c in cols if c != key and c in net.columns
        ])
        anti_side = net_keyed.select(key)
        if broadcast_net or broadcast_net is None:
            anti_side = F.broadcast(anti_side)
        survivors = current.join(anti_side, key, "left_anti")

        upserts = net_keyed.filter(F.col(op_col) != "D")
        aligned = upserts.select(
            *[
                F.col(f.name).cast(f.dataType)
                if f.name in upserts.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )
        merged = survivors.unionByName(aligned).withColumn(
            "_b", F.pmod(F.hash(F.col(key)), F.lit(num_buckets)).cast("int")
        )

        version = snap["version"] + 1
        out_rel = os.path.join("data", f"c{version}")
        out_dir = os.path.join(table.root, out_rel)
        (
            merged.repartition(max(1, len(dirty)), "_b")
            .write.mode("overwrite")
            .partitionBy("_b")
            .parquet(out_dir)
        )

        # -- 4. publish the snapshot ------------------------------------- #
        new_files: dict[int, list[str]] = {}
        for b in dirty:
            bucket_dir = os.path.join(out_dir, f"_b={b}")
            new_files[b] = [
                os.path.relpath(p, table.root)
                for p in sorted(glob.glob(os.path.join(bucket_dir, "*.parquet")))
            ]
        files = {int(b): fl for b, fl in snap["files"].items()}
        for b in dirty:
            fl = new_files.get(b, [])
            if fl:
                files[b] = fl
            else:
                files.pop(b, None)  # bucket fully deleted
        watermarks = {int(b): int(w) for b, w in snap["watermarks"].items()}
        for r in stats:
            b = int(r["_bucket"])
            watermarks[b] = max(watermarks.get(b, -1), int(r["max_seq"]))

        wall_ms = int((time.monotonic() - t0) * 1000)
        partitions = [
            {
                "bucket": int(r["_bucket"]),
                "max_seq": int(r["max_seq"]),
                "n_events": int(r["n_events"]),
                "n_upserts": int(r["n_upserts"]),
                "n_deletes": int(r["n_deletes"]),
            }
            for r in stats
        ]
        snap["version"] = version
        snap["files"] = {str(b): fl for b, fl in sorted(files.items())}
        snap["watermarks"] = {str(b): w for b, w in sorted(watermarks.items())}
        snap["epochs"][stream_id] = epoch_id
        snap["lineage"].append(
            {
                "kind": "merge",
                "stream_id": stream_id,
                "epoch_id": epoch_id,
                "version": version,
                "wall_ms": wall_ms,
                "partitions": partitions,
            }
        )
        table._write_snapshot(snap)
        return MergeResult(
            applied=True,
            epoch_id=epoch_id,
            version=version,
            n_net=n_net,
            n_dirty_buckets=len(dirty),
            wall_ms=wall_ms,
            partitions=partitions,
        )
    finally:
        net.unpersist()
