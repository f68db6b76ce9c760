"""CdcEngine — the end-to-end ingest pipeline.

One micro-batch (the rebuild of the reference's hot loop, SURVEY §3.2):

    readStream(change-log envelope)
      → Arrow decode + invariant validation        (operators.decode)
      → additive schema evolution (extra → column) (LakeTable.add_columns)
      → per-key LWW net-change compaction          (operators.compaction)
      → bucket-pruned COW MERGE + lineage commit   (lake.merge)

Exactly-once: Structured Streaming's checkpoint gives at-least-once
delivery of each epoch to ``foreachBatch``; the LakeTable commit makes the
apply idempotent (epoch guard + seq watermark fence), so a killed and
resumed job replays to the identical final table — the upgrade over the
reference's at-least-once contract (doc/binlake-arc.md:27).

Schema evolution: a Structured Streaming source schema is fixed for the
life of the query, so new columns ride the ``extra`` map in the envelope
(SURVEY §7 hard-point 2) and are promoted to real table columns inside
``foreachBatch``, where batch DataFrames have no such restriction.  This
mirrors the reference's additive-only rule (BinlogWorker.java:1079).

Scale posture: the only shuffle per epoch is the compaction's groupBy on
``doc_id`` (explicit hash partitioning on the business key — the
BUSINESS_KEY_ORDER grade, IKeyGenerator.java:48-76); with ``salt`` set the
hot-key case becomes two shuffles of strictly decreasing size.  The MERGE
reads only dirty buckets and broadcasts the net-change key set, so the
existing table is never shuffled.  Backpressure = ``maxFilesPerTrigger``
(the token-throttle analog, BinlogWorker.java:214-218).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
from binlake_spark.lake.merge import (
    MergeResult,
    compact_buckets,
    merge_into,
    merge_into_mor,
)
from binlake_spark.lake.table import LakeTable
from binlake_spark.operators.compaction import compact_lww, compact_lww_bucketed
from binlake_spark.operators.decode import (
    decode_and_validate,
    decode_and_validate_batch,
    decoded_schema,
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


class CdcEngine:
    def __init__(
        self,
        table: LakeTable,
        stream_id: str = "cdc",
        salt: int | None = None,
        decode_payload: bool = True,
        promote_extra: bool = True,
        decode_partitions: int | None = None,
        expire_every: int | None = 16,
        expire_keep_last: int = 4,
        mode: str = "cow",
        mor_compact_every: int = 8,
    ):
        """``salt``: two-stage compaction for pathological key skew.  Note
        that ordinary hot keys are already absorbed by ``max_by``'s
        map-side partial aggregation (each map task pre-combines a hot key
        to one row before the shuffle), so the default is off; the salt
        path is for adversarial skew where single keys dominate whole scan
        partitions *and* the combine itself is the bottleneck.

        ``decode_partitions``: optional coalesce of the Arrow decode stage.
        By default decode runs at the compaction's shuffle parallelism
        (every core busy); set this lower only when winners per epoch are
        tiny and the fixed Python-worker/Arrow handshake (~50-100 ms/task)
        dominates.

        ``expire_every`` / ``expire_keep_last``: run
        :meth:`LakeTable.expire_snapshots` after every Nth committed table
        version, keeping the last K snapshots for time travel and
        concurrent readers (None disables — snapshots then accumulate a
        dead copy of every dirty bucket per epoch).

        ``mode``: ``"cow"`` (default, the north-rule contract) rewrites
        dirty buckets each epoch — read-optimal, write cost grows with
        table size when keys are uniform.  ``"mor"`` appends per-bucket
        delta files (write cost = |winners|, independent of table size)
        with LWW at read; deltas fold down via
        :func:`binlake_spark.lake.merge.compact_buckets` every
        ``mor_compact_every`` epochs.  Final state is identical
        (property of per-row ``_seq`` LWW); pick by epoch-dirtiness.
        """
        self.table = table
        self.stream_id = stream_id
        self.salt = salt
        self.decode_payload = decode_payload
        self.promote_extra = promote_extra
        self.decode_partitions = decode_partitions
        self.expire_every = expire_every
        self.expire_keep_last = expire_keep_last
        if mode not in ("cow", "mor"):
            raise ValueError("mode must be 'cow' or 'mor'")
        self.mode = mode
        self.mor_compact_every = mor_compact_every

    # ------------------------------------------------------------------ #
    @classmethod
    def create_table(
        cls, root: str, num_buckets: int = 16, schema: T.StructType = DOCS_SCHEMA
    ) -> LakeTable:
        return LakeTable.create(root, schema, key_col="doc_id", num_buckets=num_buckets)

    # ------------------------------------------------------------------ #
    def apply_batch(self, batch_df: DataFrame, epoch_id: int) -> MergeResult:
        """Apply one change-log micro-batch to the table, exactly once.

        Operator order is chosen for scale: validation is a JVM predicate
        (`octet_length(payload) == 4*n_tok` — codegen, pushed at the scan),
        compaction runs on the *raw* payload bytes, and the Arrow decode
        pass only ever sees the |distinct keys| winning rows — per-row
        Python work is proportional to keys, not events.  At 10^10 events
        with ~10^7 live keys that is a 1000× cut of the Python boundary.

        Job structure per epoch (exactly two passes over the winners):

        1. **materialize** — scan → validate → compact → decode, persisted;
           one metadata aggregation over the cached winners yields the
           dirty-bucket list *and* the set of new ``extra`` keys together
           (driver sees ≤ num_buckets × keys rows).
        2. **merge** — survivors ∪ winners written bucket-partitioned, all
           inputs read from the cache; offsets from parquet footers.

        Per-phase wall times are committed into the lineage entry
        (``phase_ms``) — the stage-delay monitor analog
        (PerformanceUtils.java:13-45).
        """
        spark = batch_df.sparkSession
        df = batch_df
        has_payload = self.decode_payload and "payload" in df.columns

        # 1. column pruning + vectorized validation (the event-type filter
        #    + token-invariant check, all whole-stage-codegen JVM)
        keep = ["doc_id", "seq", "op", "n_tok", "source"]
        if has_payload:
            keep.append("payload")
        elif "tokens" in df.columns:
            keep.append("tokens")
        if "extra" in df.columns:
            keep.append("extra")
        df = df.select(*[c for c in keep if c in df.columns])
        df = df.filter(F.col("op").isin("I", "U", "D"))
        if has_payload:
            df = df.filter(F.octet_length("payload") == F.col("n_tok") * 4)
        elif "tokens" in df.columns:
            df = df.filter(F.size("tokens") == F.col("n_tok"))

        # 2. net-change compaction FIRST: one winner per doc_id (LWW by
        #    seq).  Default path (`compact_lww_bucketed`): winner keys only
        #    through the aggregation, payloads fetched by join-back, and
        #    the winners land repartitioned by their storage bucket — the
        #    ONE wide shuffle of the epoch; the write then needs no
        #    exchange at all.  The salted two-stage agg remains available
        #    for adversarial skew (see __init__).
        bucket_aligned = False
        if self.salt:
            net = compact_lww(
                df, key="doc_id", seq_col="seq", salt=self.salt, strategy="agg"
            )
            if has_payload:
                if self.decode_partitions:
                    net = net.coalesce(self.decode_partitions)
                net = decode_and_validate(net)
        else:
            # payload decode fused into the dedup's Arrow pass: winners
            # cross the JVM↔Python boundary exactly once per epoch
            batch_fn = out_schema = None
            if has_payload:
                bucketed_schema = T.StructType(
                    list(df.schema.fields)
                    + [T.StructField("_bucket", T.IntegerType(), True)]
                )
                out_schema = decoded_schema(bucketed_schema)
                batch_fn = decode_and_validate_batch
            net = compact_lww_bucketed(
                df,
                key="doc_id",
                seq_col="seq",
                bucket_col_expr=self.table.bucket_expr(),
                num_partitions=int(self.table.snapshot()["num_buckets"]),
                batch_fn=batch_fn,
                out_schema=out_schema,
            )
            bucket_aligned = True

        # attach the target bucket (bucketed compaction already carries it)
        # so one metadata job covers dirty buckets + schema evolution
        if "_bucket" not in net.columns:
            net = net.withColumn("_bucket", self.table.bucket_expr())

        phases: dict[str, int] = {}
        t0 = time.monotonic()
        cached = net = net.persist()
        try:
            has_extra = self.promote_extra and "extra" in net.columns
            if has_extra:
                meta = (
                    net.select(
                        "_bucket", F.explode_outer(F.map_keys("extra")).alias("k")
                    )
                    .distinct()
                    .collect()
                )
                dirty = sorted({int(r["_bucket"]) for r in meta})
                keys = sorted({r["k"] for r in meta if r["k"] is not None})
            else:
                dirty = sorted(
                    int(r["_bucket"])
                    for r in net.select("_bucket").distinct().collect()
                )
                keys = []
            phases["materialize_ms"] = int((time.monotonic() - t0) * 1000)

            # 4. additive schema evolution on winners: promote new `extra`
            #    keys to real columns (add-column-only, BinlogWorker.java:1079)
            t1 = time.monotonic()
            if keys:
                self.table.add_columns([(k, "string") for k in keys])
                for k in keys:
                    net = net.withColumn(k, F.col("extra")[k])
            if has_extra:
                net = net.drop("extra")
            phases["evolve_ms"] = int((time.monotonic() - t1) * 1000)

            # 5. idempotent MERGE + lineage, committed atomically —
            #    copy-on-write rewrite or merge-on-read delta append
            merge_fn = merge_into if self.mode == "cow" else merge_into_mor
            result = merge_fn(
                spark,
                self.table,
                net,
                epoch_id=int(epoch_id),
                stream_id=self.stream_id,
                dirty=dirty,
                assume_persisted=True,
                bucket_aligned=bucket_aligned,
                extra_lineage={"phase_ms": phases},
            )
            # 6. periodic maintenance, in the engine loop like the
            #    reference's 60 s checkpoint timer: fold MOR deltas down,
            #    expire dead COW rewrites (keep_last stay readable for
            #    time travel / concurrent readers)
            if result.applied and result.version:
                if (
                    self.mode == "mor"
                    and self.mor_compact_every
                    and (int(epoch_id) + 1) % self.mor_compact_every == 0
                ):
                    compact_buckets(spark, self.table)
                if (
                    self.expire_every
                    and self.table.snapshot()["version"] % self.expire_every == 0
                ):
                    self.table.expire_snapshots(keep_last=self.expire_keep_last)
            return result
        finally:
            cached.unpersist()

    # ------------------------------------------------------------------ #
    def run_batch_replay(self, spark: SparkSession, source_dir: str) -> MergeResult:
        """Bounded replay as a single batch (FileLogFetcher analog,
        FileLogFetcher.java:1-158) — the correctness harness path."""
        df = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(source_dir)
        return self.apply_batch(df, epoch_id=self.table.last_epoch(self.stream_id) + 1)

    def run_stream(
        self,
        spark: SparkSession,
        source_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        available_now: bool = True,
        stop_after_epochs: int | None = None,
        timeout_s: int = 300,
    ):
        """Tail the change log with Structured Streaming.

        ``available_now=True`` drains everything currently in the source
        and terminates (Trigger.AvailableNow — the terminal-GTID analog,
        BinlogWorker.java:938-945).  ``stop_after_epochs`` kills the query
        mid-stream after N commits — the failover-injection hook used by
        the kill/resume tests.
        """
        reader = spark.readStream.schema(CHANGE_LOG_SCHEMA)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
        stream = reader.parquet(source_dir)

        def feb(batch_df: DataFrame, epoch_id: int):
            self.apply_batch(batch_df, epoch_id)

        writer = (
            stream.writeStream.foreachBatch(feb)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now and stop_after_epochs is None:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        try:
            if stop_after_epochs is not None:
                deadline = time.monotonic() + timeout_s
                while time.monotonic() < deadline:
                    if self.table.last_epoch(self.stream_id) >= stop_after_epochs - 1:
                        break
                    time.sleep(0.2)
                q.stop()
                q.awaitTermination(timeout_s)
            else:
                q.awaitTermination()
        finally:
            if q.isActive:
                q.stop()
        return q

    # ------------------------------------------------------------------ #
    def read_state(self, spark: SparkSession) -> DataFrame:
        return self.table.read(spark)

    def lineage(self, spark: SparkSession) -> DataFrame:
        return self.table.lineage_df(spark)


def default_table_root(base: str) -> str:
    return os.path.join(base, "docs_table")
