"""Bucket-pruned copy-on-write MERGE INTO for :class:`LakeTable`.

Semantics — the Iceberg ``MERGE INTO`` the north rule names, built from
scratch on DataFrame ops, with per-row LWW versioning:

    MERGE INTO target t USING net s ON t.<key> = s.<key>
    WHEN MATCHED AND s.seq > t._seq AND s.op  = 'D' THEN DELETE
    WHEN MATCHED AND s.seq > t._seq AND s.op != 'D' THEN UPDATE SET *
    WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *

``net`` must be *net changes*: at most one row per key (the output of
:func:`binlake_spark.operators.compaction.compact_lww`).  Compacting before
the merge is the analog of the reference's packet batching
(ProtobufConverter.formatByRows, ProtobufConverter.java:549-729): MERGE
sees ≤ |keys| rows regardless of how many raw events the batch carried,
which bounds copy-on-write amplification at 10^10-event scale.

Exactly-once / duplicate handling is layered:

1. **Epoch guard** — a foreachBatch epoch replayed after a crash is
   detected via the ``epochs`` map committed in the same snapshot as the
   data, and skipped.
2. **Per-row LWW (`_seq`)** — every row stores the seq of the event that
   wrote it; an incoming winner applies only if its seq is strictly
   newer.  Re-merging any already-applied change is therefore a no-op
   even if the epoch guard is bypassed, and a stale retransmit can never
   clobber newer state.  (Reference parity: consumers dedup by GTID
   compare after an at-least-once failover, doc/binlake-arc.md:27 — we
   move that compare into the sink, making it exactly-once.)
3. **Optional per-bucket seq fence** (``enforce_watermark=True``) — drops
   whole retransmitted prefixes before the join.  Only valid when the
   source guarantees bucket-monotone seqs across epochs (true for a
   binlog replayed in commit order); off by default because a fresh
   out-of-order event with a seq below another doc's watermark would be
   wrongly fenced.

Tombstone contract: an applied delete WRITES a ``_tombstone=true`` row
(key + ``_seq``, data columns NULL) rather than merely dropping the row
— the row's version must keep existing so layer 2's LWW compare stays
TOTAL.  Suffix replays alone are not the only reordering in practice:
Spark's file source orders new files by modification time, ties resolve
by listing order, and after a resume the engine can legitimately
receive epoch k+1's batch before epoch k's; a vanished delete would let
epoch k's stale upsert resurrect the doc (observed ~1/16 demo runs
before this contract).  Tombstones are invisible to every user-facing
read and are reclaimed by :func:`purge_tombstones` once the operator
can bound the redelivery horizon (Iceberg equality-delete retention /
Kafka ``delete.retention.ms`` analog).

Physical execution — ONE Spark job per merge plus metadata-only work,
the shape that survives 100×:

- job A: ``dirty buckets`` = distinct bucket ids of the (persisted,
  compacted) net side — tiny.
- job B: the rewrite.  Survivors and stale-key filtering are joins of the
  dirty-bucket scan against the net side; AQE picks broadcast vs
  sort-merge by actual size (no forced broadcast: net is a whole epoch's
  key set and may be large at scale).  Epoch-level op counts ride on a
  ``Observation`` attached to the applied branch — measured during the
  write, zero extra passes.
- per-bucket offsets (row counts + max ``_seq``) come from the parquet
  footers of the files just written — driver-side metadata reads, the
  same trick as Iceberg's manifest column stats.  No stats job.
"""

from __future__ import annotations

import glob
import os
import time
from dataclasses import dataclass, field

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, Observation, SparkSession
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


def _footer_stats(path: str, seq_field: str = "_seq") -> tuple[int, int]:
    """(num_rows, max _seq) from parquet footer metadata — no data read."""
    md = pq.read_metadata(path)
    idx = md.schema.to_arrow_schema().get_field_index(seq_field)
    mx = -1
    for rg in range(md.num_row_groups):
        col = md.row_group(rg).column(idx)
        if col.statistics is not None and col.statistics.has_min_max:
            mx = max(mx, int(col.statistics.max))
    return md.num_rows, mx


def merge_into(
    spark: SparkSession,
    table: LakeTable,
    net: DataFrame,
    *,
    epoch_id: int = 0,
    stream_id: str = "default",
    seq_col: str = "seq",
    op_col: str = "op",
    enforce_watermark: bool = False,
    dirty: list[int] | None = None,
    bucket_max_seq: dict[int, int] | None = None,
    assume_persisted: bool = False,
    bucket_aligned: bool = False,
    extra_lineage: dict | None = None,
) -> MergeResult:
    """Apply one compacted change batch to the table, exactly once.

    ``dirty`` / ``bucket_max_seq`` / ``assume_persisted``: the engine
    precomputes the dirty bucket list and each bucket's own max incoming
    seq in the same metadata job that detects schema evolution, and hands
    over an already-persisted ``net`` (with ``_bucket`` attached), so the
    merge adds no extra pass of its own; when absent they are computed
    here in one small aggregation over ``net``.  The watermark fence
    advances each bucket by *its own* max — never the epoch-global max,
    which would wrongly fence fresh events from sources that are only
    per-bucket monotone.  ``extra_lineage`` fields (e.g. per-phase stage
    delays, the PerformanceUtils analog) are embedded in the committed
    lineage entry.
    """
    t0 = time.monotonic()
    snap = table.snapshot()
    key = snap["key_col"]
    num_buckets = snap["num_buckets"]

    # -- 1. epoch idempotence guard ------------------------------------- #
    if epoch_id <= int(snap["epochs"].get(stream_id, -1)):
        return MergeResult(
            applied=False, epoch_id=epoch_id, skipped_reason="epoch-already-applied"
        )

    if "_bucket" not in net.columns:
        net = net.withColumn(
            "_bucket", F.pmod(F.hash(F.col(key)), F.lit(num_buckets)).cast("int")
        )

    # -- 2. optional retransmit fence (bucket-monotone sources only) ----- #
    if enforce_watermark and snap["watermarks"]:
        wm = table.watermarks_df(spark)
        net = (
            net.join(F.broadcast(wm), "_bucket", "left")
            .filter(F.col(seq_col) > F.coalesce(F.col("_wm"), F.lit(-1)))
            .drop("_wm")
        )
        dirty = None  # fence may empty buckets; recompute
        bucket_max_seq = None

    own_persist = not assume_persisted
    if own_persist:
        net = net.persist()
    try:
        # job A: which buckets does this epoch touch, and each bucket's own
        # incoming max seq? (skipped when the caller already knows from its
        # metadata job)
        if dirty is None or bucket_max_seq is None:
            rows = (
                net.groupBy("_bucket").agg(F.max(F.col(seq_col)).alias("_mx")).collect()
            )
            if dirty is None:
                dirty = sorted(int(r["_bucket"]) for r in rows)
            else:
                dirty = sorted(int(b) for b in dirty)
            bucket_max_seq = {
                int(r["_bucket"]): int(r["_mx"]) for r in rows if r["_mx"] is not None
            }
        else:
            dirty = sorted(int(b) for b in dirty)
        if not dirty:
            # nothing to apply: still commit the epoch marker so a replay
            # of this epoch stays a no-op.
            snap["version"] += 1
            snap["epochs"][stream_id] = epoch_id
            snap["lineage"].append(
                {
                    "kind": "merge",
                    "stream_id": stream_id,
                    "epoch_id": epoch_id,
                    "version": snap["version"],
                    "wall_ms": int((time.monotonic() - t0) * 1000),
                    "n_events": 0,
                    "n_upserts": 0,
                    "n_deletes": 0,
                    "partitions": [],
                    **(extra_lineage or {}),
                }
            )
            table._write_snapshot(snap)
            return MergeResult(
                applied=True,
                epoch_id=epoch_id,
                version=snap["version"],
                skipped_reason="empty-batch",
            )

        # -- 3. merge body: one job over dirty buckets only --------------- #
        # Tombstones ride along: `current` includes prior delete
        # tombstones (they fence stale upserts exactly like live rows —
        # without them a delete leaves NOTHING to out-sequence an older
        # upsert delivered later, e.g. when two source files with
        # colliding mtimes list in either order after a resume, and the
        # doc silently resurrects), and an applied delete is WRITTEN as
        # a `_tombstone=true` row instead of vanishing.  User-facing
        # reads filter them; `purge_tombstones` reclaims them once the
        # source can no longer deliver older seqs.
        schema = T.StructType.fromJson(snap["schema"])
        current = table.read(
            spark, buckets=dirty, with_seq=True, with_tombstones=True
        )
        cur_seq = F.coalesce(F.col("_seq"), F.lit(-1))
        net_small = net.select(key, F.col(seq_col).alias("_in_seq"))

        # existing rows that survive: no incoming row, or incoming is
        # stale/equal (LWW keeps the newer version)
        survivors = (
            current.join(net_small, key, "left")
            .filter(F.col("_in_seq").isNull() | (F.col("_in_seq") <= cur_seq))
            .drop("_in_seq")
        )
        # incoming winners beaten by the existing row
        stale_keys = (
            current.select(key, "_seq")
            .join(net_small, key, "inner")
            .filter(cur_seq >= F.col("_in_seq"))
            .select(key)
        )
        applied = net.join(stale_keys, key, "left_anti")

        obs = Observation(f"merge-{stream_id}-{epoch_id}")
        applied = applied.observe(
            obs,
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col(op_col) != "D").cast("long")).alias("n_upserts"),
            F.sum((F.col(op_col) == "D").cast("long")).alias("n_deletes"),
        )
        is_del = F.col(op_col) == "D"

        def _aligned_col(f):
            src = F.col(f.name) if f.name in applied.columns else F.lit(None)
            if f.name != key:
                # data columns: NULL on tombstones (the key + _seq are
                # the whole fence; carrying a deleted doc's payload
                # would bloat the bucket for nothing)
                src = F.when(is_del, F.lit(None)).otherwise(src)
            return src.cast(f.dataType).alias(f.name)

        aligned = applied.select(
            *[_aligned_col(f) for f in schema.fields],
            F.col(seq_col).cast("long").alias("_seq"),
            is_del.alias("_tombstone"),
        )
        merged = survivors.unionByName(aligned).withColumn(
            "_b", F.pmod(F.hash(F.col(key)), F.lit(num_buckets)).cast("int")
        )

        version = snap["version"] + 1
        out_rel = os.path.join("data", f"c{version}")
        out_dir = os.path.join(table.root, out_rel)
        # bucket_aligned: the net side arrives clustered by bucket (the
        # compaction's repartition) and survivors stream straight from
        # bucket files through a broadcast-probe join, so the write needs
        # NO exchange — the existing table is never shuffled, at any
        # number of dirty buckets.  Unaligned callers (raw merge_into on
        # arbitrary nets) pay one clustering shuffle to avoid a file per
        # (task, bucket).
        writer = (
            merged if bucket_aligned else merged.repartition(max(1, len(dirty)), "_b")
        )
        tw = time.monotonic()
        writer.write.mode("overwrite").partitionBy("_b").parquet(out_dir)
        write_ms = int((time.monotonic() - tw) * 1000)
        try:
            metrics = obs.get
        except Exception:
            # a write whose plan is empty (e.g. a delete-only batch that
            # removes a bucket's last rows) can elide the observe node —
            # recompute the three counters directly over the persisted net
            row = applied.agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum((F.col(op_col) != "D").cast("long")).alias("n_upserts"),
                F.sum((F.col(op_col) == "D").cast("long")).alias("n_deletes"),
            ).collect()[0]
            metrics = row.asDict()
        n_net = int(metrics["n_events"] or 0)

        # -- 4. per-bucket offsets from parquet footers (metadata only) --- #
        tf = time.monotonic()
        new_files: dict[int, list[str]] = {}
        partitions: list[dict] = []
        for b in dirty:
            bucket_dir = os.path.join(out_dir, f"_b={b}")
            paths = sorted(glob.glob(os.path.join(bucket_dir, "*.parquet")))
            new_files[b] = [os.path.relpath(p, table.root) for p in paths]
            n_rows, max_seq = 0, -1
            for p in paths:
                nr, mx = _footer_stats(p)
                n_rows += nr
                max_seq = max(max_seq, mx)
            partitions.append({"bucket": b, "n_rows": n_rows, "max_seq": max_seq})
        footer_ms = int((time.monotonic() - tf) * 1000)

        files = {int(b): fl for b, fl in snap["files"].items()}
        for b in dirty:
            fl = new_files.get(b, [])
            if fl:
                files[b] = fl
            else:
                files.pop(b, None)  # bucket fully deleted
        watermarks = {int(b): int(w) for b, w in snap["watermarks"].items()}
        # file-footer max covers surviving rows; a delete can remove a
        # bucket's max row, so each bucket's fence also advances by that
        # bucket's own incoming max (per-bucket, so per-bucket-monotone
        # sources are never wrongly fenced by another bucket's seqs)
        for p in partitions:
            b = p["bucket"]
            watermarks[b] = max(
                watermarks.get(b, -1), p["max_seq"], bucket_max_seq.get(b, -1)
            )

        wall_ms = int((time.monotonic() - t0) * 1000)
        snap["version"] = version
        snap["files"] = {str(b): fl for b, fl in sorted(files.items())}
        snap["watermarks"] = {str(b): w for b, w in sorted(watermarks.items())}
        snap["epochs"][stream_id] = epoch_id
        lineage_entry = {
            "kind": "merge",
            "stream_id": stream_id,
            "epoch_id": epoch_id,
            "version": version,
            "wall_ms": wall_ms,
            "n_events": n_net,
            "n_upserts": int(metrics["n_upserts"] or 0),
            "n_deletes": int(metrics["n_deletes"] or 0),
            "partitions": partitions,
            **(extra_lineage or {}),
        }
        # finer stage delays (PerformanceUtils analog): the write job is
        # the parallel part; footer stats + the snapshot commit are the
        # DRIVER-SERIAL tail that bounds strong scaling at small epochs.
        # (The commit itself can't time itself into the entry it writes —
        # profilers take it as wall − materialize − evolve − write − footer.)
        ph = dict(lineage_entry.get("phase_ms") or {})
        ph.update(write_ms=write_ms, footer_ms=footer_ms)
        lineage_entry["phase_ms"] = ph
        snap["lineage"].append(lineage_entry)
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
        if own_persist:
            net.unpersist()


def merge_into_mor(
    spark: SparkSession,
    table: LakeTable,
    net: DataFrame,
    *,
    epoch_id: int = 0,
    stream_id: str = "default",
    seq_col: str = "seq",
    op_col: str = "op",
    dirty: list[int] | None = None,
    bucket_max_seq: dict[int, int] | None = None,
    assume_persisted: bool = False,
    bucket_aligned: bool = False,
    extra_lineage: dict | None = None,
) -> MergeResult:
    """Merge-on-read apply: append the compacted net changes (upserts AND
    delete tombstones) as per-bucket **delta files**; LWW resolution moves
    to read time (LakeTable.read) and to :func:`compact_buckets`.

    This is the scale path for the regime our COW bench exposed: when an
    epoch's keys touch every bucket (uniform key distribution — the common
    case for doc_id ingest), copy-on-write rewrites the *whole table* per
    epoch, so write cost grows with table size, not batch size.  MOR
    writes exactly |winners| rows per epoch regardless of table size, at
    the price of an LWW aggregation on read until compaction folds the
    deltas down (Iceberg v2 positional/equality deletes play the same
    trade).  Exactly-once layering is unchanged: epoch guard + per-row
    ``_seq`` (stale retransmitted deltas lose the read-time max_by; a
    replayed epoch is skipped outright).
    """
    t0 = time.monotonic()
    snap = table.snapshot()
    key = snap["key_col"]
    num_buckets = snap["num_buckets"]

    if epoch_id <= int(snap["epochs"].get(stream_id, -1)):
        return MergeResult(
            applied=False, epoch_id=epoch_id, skipped_reason="epoch-already-applied"
        )

    if "_bucket" not in net.columns:
        net = net.withColumn(
            "_bucket", F.pmod(F.hash(F.col(key)), F.lit(num_buckets)).cast("int")
        )
    own_persist = not assume_persisted
    if own_persist:
        net = net.persist()
    try:
        if dirty is None or bucket_max_seq is None:
            rows = (
                net.groupBy("_bucket").agg(F.max(F.col(seq_col)).alias("_mx")).collect()
            )
            if dirty is None:
                dirty = sorted(int(r["_bucket"]) for r in rows)
            else:
                dirty = sorted(int(b) for b in dirty)
            bucket_max_seq = {
                int(r["_bucket"]): int(r["_mx"]) for r in rows if r["_mx"] is not None
            }
        else:
            dirty = sorted(int(b) for b in dirty)
        schema = T.StructType.fromJson(snap["schema"])

        obs = Observation(f"mor-{stream_id}-{epoch_id}")
        staged = net.observe(
            obs,
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col(op_col) != "D").cast("long")).alias("n_upserts"),
            F.sum((F.col(op_col) == "D").cast("long")).alias("n_deletes"),
        )
        aligned = staged.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in staged.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ],
            F.col(seq_col).cast("long").alias("_seq"),
            F.when(F.col(op_col) == "D", "D").otherwise("U").alias("_op"),
            F.col("_bucket").alias("_b"),
        )

        version = snap["version"] + 1
        out_rel = os.path.join("data", f"d{version}")
        out_dir = os.path.join(table.root, out_rel)
        writer = (
            aligned if bucket_aligned else aligned.repartition(max(1, len(dirty)), "_b")
        )
        tw = time.monotonic()
        writer.write.mode("overwrite").partitionBy("_b").parquet(out_dir)
        write_ms = int((time.monotonic() - tw) * 1000)
        metrics = obs.get

        tf = time.monotonic()
        partitions: list[dict] = []
        deltas = {int(b): list(fl) for b, fl in snap.get("deltas", {}).items()}
        for b in dirty:
            bucket_dir = os.path.join(out_dir, f"_b={b}")
            paths = sorted(glob.glob(os.path.join(bucket_dir, "*.parquet")))
            if not paths:
                continue
            rel = [os.path.relpath(p, table.root) for p in paths]
            deltas.setdefault(b, []).extend(rel)
            n_rows, max_seq = 0, -1
            for p in paths:
                nr, mx = _footer_stats(p)
                n_rows += nr
                max_seq = max(max_seq, mx)
            partitions.append({"bucket": b, "n_rows": n_rows, "max_seq": max_seq})

        footer_ms = int((time.monotonic() - tf) * 1000)
        watermarks = {int(b): int(w) for b, w in snap["watermarks"].items()}
        # deltas carry tombstone rows too, so the footer max is already each
        # bucket's true applied max; the per-bucket incoming max covers
        # footers without stats.  Per-bucket (not epoch-global) so a
        # per-bucket-monotone source is never wrongly fenced.
        for p in partitions:
            b = p["bucket"]
            watermarks[b] = max(
                watermarks.get(b, -1), p["max_seq"], bucket_max_seq.get(b, -1)
            )

        wall_ms = int((time.monotonic() - t0) * 1000)
        snap["version"] = version
        snap["deltas"] = {str(b): fl for b, fl in sorted(deltas.items())}
        snap["watermarks"] = {str(b): w for b, w in sorted(watermarks.items())}
        snap["epochs"][stream_id] = epoch_id
        lineage_entry = {
            "kind": "merge",
            "mode": "mor",
            "stream_id": stream_id,
            "epoch_id": epoch_id,
            "version": version,
            "wall_ms": wall_ms,
            "n_events": int(metrics["n_events"] or 0),
            "n_upserts": int(metrics["n_upserts"] or 0),
            "n_deletes": int(metrics["n_deletes"] or 0),
            "partitions": partitions,
            **(extra_lineage or {}),
        }
        # same finer stage delays as the COW path (write job parallel;
        # footer walk + snapshot commit are the driver-serial tail)
        ph = dict(lineage_entry.get("phase_ms") or {})
        ph.update(write_ms=write_ms, footer_ms=footer_ms)
        lineage_entry["phase_ms"] = ph
        snap["lineage"].append(lineage_entry)
        table._write_snapshot(snap)
        return MergeResult(
            applied=True,
            epoch_id=epoch_id,
            version=version,
            n_net=int(metrics["n_events"] or 0),
            n_dirty_buckets=len(dirty),
            wall_ms=wall_ms,
            partitions=partitions,
        )
    finally:
        if own_persist:
            net.unpersist()


def compact_buckets(
    spark: SparkSession,
    table: LakeTable,
    min_deltas: int = 1,
    tombstone_horizon: int | None = None,
) -> dict:
    """Fold merge-on-read deltas into the base (the maintenance half of
    MOR — Iceberg's ``rewrite_data_files`` analog): buckets carrying at
    least ``min_deltas`` delta files are LWW-resolved (base ∪ deltas,
    max ``_seq`` per key, delete winners RETAINED as base ``_tombstone``
    rows — dropping them would let a reordered stale upsert resurrect
    the doc one compaction later) and rewritten; their delta list
    empties in the same atomic snapshot.  Amortized cost equals what COW
    would have paid spread over the delta window.

    ``tombstone_horizon``: fuse the retention pass into this rewrite —
    tombstones with ``_seq <= horizon`` are dropped from the compacted
    output, so a maintenance cycle pays ONE rewrite per delta bucket
    instead of compact-then-purge rewriting the same buckets twice.
    Buckets without deltas are untouched here; sweep those with
    :func:`purge_tombstones` (already-compacted buckets no longer carry
    dead tombstones and are skipped by its discovery scan).
    """
    snap = table.snapshot()
    todo = sorted(
        int(b) for b, fl in snap.get("deltas", {}).items() if len(fl) >= min_deltas
    )
    if not todo:
        return {"compacted_buckets": 0, "version": snap["version"]}
    # delete winners fold into the base AS TOMBSTONES — dropping them
    # here would let a stale upsert from a reordered/replayed batch
    # resurrect the doc right after compaction (reads filter them;
    # the explicit horizon below / purge_tombstones reclaims them)
    resolved = table.read(
        spark, buckets=todo, with_seq=True, with_tombstones=True
    ).withColumn(
        "_b",
        F.pmod(F.hash(F.col(snap["key_col"])), F.lit(snap["num_buckets"])).cast("int"),
    )
    if tombstone_horizon is not None:
        resolved = resolved.filter(
            ~(F.col("_tombstone") & (F.col("_seq") <= int(tombstone_horizon)))
        )
    version = snap["version"] + 1
    out_rel = os.path.join("data", f"c{version}")
    out_dir = os.path.join(table.root, out_rel)
    resolved.repartition(max(1, len(todo)), "_b").write.mode("overwrite").partitionBy(
        "_b"
    ).parquet(out_dir)

    files = {int(b): fl for b, fl in snap["files"].items()}
    deltas = {int(b): fl for b, fl in snap.get("deltas", {}).items()}
    for b, rel in _written_bucket_files(table, out_dir, todo).items():
        if rel:
            files[b] = rel
        else:
            files.pop(b, None)  # bucket fully deleted by tombstones
        deltas.pop(b, None)
    snap["version"] = version
    snap["files"] = {str(b): fl for b, fl in sorted(files.items())}
    snap["deltas"] = {str(b): fl for b, fl in sorted(deltas.items())}
    snap["lineage"].append(
        {"kind": "compact", "version": version, "buckets": todo}
    )
    table._write_snapshot(snap)
    return {"compacted_buckets": len(todo), "version": version}


def _written_bucket_files(
    table: LakeTable, out_dir: str, buckets: list[int]
) -> dict[int, list[str]]:
    """Post-write manifest collection shared by the bucket-rewrite
    maintenance ops (compact/rebucket/purge; merge_into and
    bootstrap_snapshot keep their own loops fused with footer-stat
    collection): the root-relative parquet paths under
    ``out_dir/_b=<b>`` for each bucket, empty list when the rewrite
    left the bucket with no rows."""
    out: dict[int, list[str]] = {}
    for b in buckets:
        paths = sorted(glob.glob(os.path.join(out_dir, f"_b={b}", "*.parquet")))
        out[int(b)] = [os.path.relpath(p, table.root) for p in paths]
    return out


def purge_tombstones(
    spark: SparkSession,
    table: LakeTable,
    horizon_seq: int,
) -> dict:
    """Reclaim delete tombstones with ``_seq <= horizon_seq`` (the
    retention half of tombstone-backed deletes — Kafka compaction's
    ``delete.retention.ms`` / Iceberg's delete-file expiry analog).

    A tombstone exists to out-sequence a STALE upsert that might still
    arrive (reordered spool files, a replayed prefix, a retransmitting
    source).  Once the operator can bound that horizon — e.g. the
    source's committed low watermark, or "no replay reaches below seq X
    after a checkpoint expiry" — tombstones at or below it are dead
    weight and are rewritten away here in one atomic snapshot.
    Choosing the horizon is deliberately the CALLER's judgment: the
    table cannot know what an external source may still deliver.

    MOR tables must fold their deltas first (:func:`compact_buckets`) —
    a purge can only reclaim what lives in BASE files, and reporting
    success while delta tombstones re-resolve on the next read would be
    a silent no-op for a retention/compliance caller, so outstanding
    deltas raise instead.

    Scale: one filter scan to find affected buckets, then a
    manifest-pruned rewrite of only those buckets.
    """
    snap = table.snapshot()
    key = snap["key_col"]
    num_buckets = int(snap["num_buckets"])
    outstanding = sorted(
        int(b) for b, fl in (snap.get("deltas") or {}).items() if fl
    )
    if outstanding:
        raise ValueError(
            f"purge_tombstones: buckets {outstanding} have unfolded delta "
            f"files — run compact_buckets first (a purge only reclaims "
            f"BASE rows; delta tombstones would re-resolve on the next "
            f"read while this call reported success)"
        )
    bexpr = F.pmod(F.hash(F.col(key)), F.lit(num_buckets)).cast("int")
    dead = F.col("_tombstone") & (F.col("_seq") <= int(horizon_seq))
    todo = sorted(
        r["_b"]
        for r in table.read(spark, with_seq=True, with_tombstones=True)
        .filter(dead)
        .select(bexpr.alias("_b"))
        .distinct()
        .collect()
    )
    if not todo:
        return {"purged_buckets": 0, "version": int(snap["version"])}
    version = int(snap["version"]) + 1
    out_dir = os.path.join(table.root, "data", f"c{version}")
    (
        # manifest-pruned: only the affected buckets' files are scanned
        # for the rewrite (the discovery scan above is the one full pass)
        table.read(spark, buckets=todo, with_seq=True, with_tombstones=True)
        .filter(~dead)
        .withColumn("_b", bexpr)
        .repartition(max(1, len(todo)), "_b")
        .write.mode("overwrite")
        .partitionBy("_b")
        .parquet(out_dir)
    )
    files = {int(b): fl for b, fl in snap["files"].items()}
    for b, rel in _written_bucket_files(table, out_dir, todo).items():
        if rel:
            files[b] = rel
        else:
            files.pop(b, None)  # bucket held only purged tombstones
    snap["version"] = version
    snap["files"] = {str(b): fl for b, fl in sorted(files.items())}
    snap["lineage"].append(
        {
            "kind": "purge_tombstones",
            "version": version,
            "buckets": [int(b) for b in todo],
            "horizon_seq": int(horizon_seq),
        }
    )
    table._write_snapshot(snap)
    return {"purged_buckets": len(todo), "version": version}


def rebucket(
    spark: SparkSession,
    table: LakeTable,
    new_num_buckets: int,
) -> dict:
    """Bucket-layout evolution (Iceberg partition-spec evolution analog;
    the reference's layout is frozen at ``hash & 1023``,
    IKeyGenerator.java:22 — a real deployment that outgrows its bucket
    count must redistribute): rewrite the live rows into
    ``new_num_buckets`` hash buckets in one atomic snapshot.

    At 10^10 rows this is the one full-table shuffle the engine ever
    performs, and it is *planned*, not incidental: one pass
    read → repartition(new_b) → bucket-partitioned write, no driver-side
    rows.  MOR deltas are LWW-folded in transit (the read resolves them),
    so the new layout starts delta-free.

    The per-bucket retransmit watermarks cannot be carried over exactly —
    a new bucket draws keys from many old buckets — so every new bucket
    gets the global **minimum** of the old fences: under-fencing only ever
    re-admits retransmits, which per-row ``_seq`` LWW absorbs, whereas
    carrying a too-high fence would silently drop fresh events.  Epoch
    guards (exactly-once) are unaffected.
    """
    snap = table.snapshot()
    old_b = int(snap["num_buckets"])
    if int(new_num_buckets) == old_b:
        return {"rebucketed": False, "version": int(snap["version"])}
    key = snap["key_col"]
    version = int(snap["version"]) + 1
    out_rel = os.path.join("data", f"c{version}")
    out_dir = os.path.join(table.root, out_rel)
    (
        # tombstones migrate to their new buckets with everything else —
        # the per-key fence must survive the layout change
        table.read(spark, with_seq=True, with_tombstones=True)
        .withColumn(
            "_b", F.pmod(F.hash(F.col(key)), F.lit(int(new_num_buckets))).cast("int")
        )
        .repartition(int(new_num_buckets), "_b")
        .write.mode("overwrite")
        .partitionBy("_b")
        .parquet(out_dir)
    )
    files = {
        b: rel
        for b, rel in _written_bucket_files(
            table, out_dir, list(range(int(new_num_buckets)))
        ).items()
        if rel
    }
    old_wms = [int(w) for w in snap["watermarks"].values()]
    floor_wm = min(old_wms) if old_wms else None
    snap["version"] = version
    snap["num_buckets"] = int(new_num_buckets)
    snap["files"] = {str(b): fl for b, fl in sorted(files.items())}
    snap["deltas"] = {}
    # EVERY new bucket is fenced, including ones the rewrite left empty
    # (a bucket can be empty because its only keys were deleted — a
    # retransmitted prefix must still not resurrect them; same rule as
    # bootstrap_snapshot)
    snap["watermarks"] = (
        {str(b): floor_wm for b in range(int(new_num_buckets))}
        if floor_wm is not None
        else {}
    )
    snap["lineage"].append(
        {
            "kind": "rebucket",
            "version": version,
            "from_buckets": old_b,
            "to_buckets": int(new_num_buckets),
        }
    )
    table._write_snapshot(snap)
    return {
        "rebucketed": True,
        "version": version,
        "num_buckets": int(new_num_buckets),
    }


def bootstrap_snapshot(
    spark: SparkSession,
    table: LakeTable,
    snapshot_df: DataFrame,
    *,
    as_of_seq: int,
    seq_col: str | None = None,
    stream_id: str = "default",
) -> MergeResult:
    """Initial load: seed an empty table from a point-in-time snapshot of
    the upstream table, then hand off to incremental replay.

    This is the Debezium-style snapshot mode the reference's deployment
    assumes exists upstream (BinLake ships only *changes*; the base rows
    must already be in the sink — doc/binlake-arc.md describes dump from
    a checkpointed position, DirectLogFetcher.java:38-120 fetches the log
    over a JDBC connection from that position).  Spark-native shape: the
    snapshot arrives as any DataFrame (``spark.read.jdbc`` partitioned by
    key range in production; any source in tests), is hash-clustered by
    the table's key into its bucket layout in ONE shuffle, and written
    with no Python in the path.  Every bucket's watermark is fenced to
    ``as_of_seq`` — the snapshot is authoritative for all state at or
    below that position, so a subsequent replay from ``as_of_seq + 1``
    (or a full replay under the watermark fence) converges to exactly the
    state a from-scratch replay produces.

    ``seq_col``: optional per-row version column in the snapshot (kept as
    the row's ``_seq`` for LWW); otherwise every row gets ``as_of_seq``,
    which is equivalent for correctness because replayed events carry
    seqs strictly greater than the snapshot position.

    Scale posture: the one shuffle is sized to the snapshot (unavoidable
    for an initial load) and parallelized across ``num_buckets``; at
    100 TB you raise ``num_buckets`` at create time and the write fans
    out accordingly.  No collect, no per-row Python.
    """
    t0 = time.monotonic()
    snap = table.snapshot()
    if snap["files"] or snap.get("deltas") or snap["watermarks"]:
        raise ValueError(
            "bootstrap_snapshot requires an empty table — it seeds initial "
            "state, it does not merge (use apply_batch/merge_into for that)"
        )
    key = snap["key_col"]
    num_buckets = snap["num_buckets"]

    # snapshot-authoritative additive evolution: columns the snapshot
    # carries beyond the create-time schema are added (the reference's
    # add-column-only rule, TableMeta.duplicateAndAddColumn)
    schema = T.StructType.fromJson(snap["schema"])
    known = {f.name for f in schema.fields}
    extra = [
        (f.name, f.dataType.simpleString())
        for f in snapshot_df.schema.fields
        if f.name not in known and f.name != seq_col
    ]
    if extra:
        table.add_columns(extra)
        snap = table.snapshot()
        schema = T.StructType.fromJson(snap["schema"])

    seq_expr = (
        F.col(seq_col).cast("long") if seq_col else F.lit(int(as_of_seq)).cast("long")
    )
    aligned = snapshot_df.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            if f.name in snapshot_df.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ],
        seq_expr.alias("_seq"),
    ).withColumn("_b", F.pmod(F.hash(F.col(key)), F.lit(num_buckets)).cast("int"))

    version = snap["version"] + 1
    out_rel = os.path.join("data", f"c{version}")
    out_dir = os.path.join(table.root, out_rel)
    aligned.repartition(num_buckets, "_b").write.mode("overwrite").partitionBy(
        "_b"
    ).parquet(out_dir)

    files: dict[int, list[str]] = {}
    partitions: list[dict] = []
    n_rows_total = 0
    for bucket_dir in sorted(glob.glob(os.path.join(out_dir, "_b=*"))):
        b = int(os.path.basename(bucket_dir).split("=", 1)[1])
        paths = sorted(glob.glob(os.path.join(bucket_dir, "*.parquet")))
        if not paths:
            continue
        files[b] = [os.path.relpath(p, table.root) for p in paths]
        n_rows = sum(_footer_stats(p)[0] for p in paths)
        n_rows_total += n_rows
        partitions.append({"bucket": b, "n_rows": n_rows, "max_seq": int(as_of_seq)})

    wall_ms = int((time.monotonic() - t0) * 1000)
    snap["version"] = version
    snap["files"] = {str(b): fl for b, fl in sorted(files.items())}
    # EVERY bucket is fenced at the snapshot position, including buckets
    # the snapshot happened to leave empty — state below as_of_seq is
    # fully represented, so replaying any event at or below it must no-op
    snap["watermarks"] = {str(b): int(as_of_seq) for b in range(num_buckets)}
    snap["lineage"].append(
        {
            "kind": "bootstrap",
            "stream_id": stream_id,
            "version": version,
            "as_of_seq": int(as_of_seq),
            "wall_ms": wall_ms,
            "n_rows": n_rows_total,
            "partitions": partitions,
        }
    )
    table._write_snapshot(snap)
    return MergeResult(
        applied=True,
        epoch_id=-1,
        version=version,
        n_net=n_rows_total,
        n_dirty_buckets=len(files),
        wall_ms=wall_ms,
        partitions=partitions,
    )
