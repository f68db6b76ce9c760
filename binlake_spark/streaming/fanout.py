"""Rule fan-out: one change stream, N filtered destinations.

The reference multicasts every event to a ForkJoin task per configured
rule — filter chains + converter + its own topic (RuleTask.compute,
RuleTask.java:31-54; BinlogHandler.invoke, BinlogHandler.java:102-110;
rule filter chain MQRule.convert, MQRule.java:107-151).  The Spark rebuild
is one ``foreachBatch`` that applies each rule's predicate/projection and
merges into that rule's own :class:`LakeTable`, sharing a single persisted
scan of the micro-batch across rules (the reference duplicates the Carrier
per rule, RuleTask.java:27 — here the cache plays that role with zero
copies).

Each rule keeps its own epoch guard (stream_id = rule name), so a crash
mid-fan-out replays the batch and only the rules that had not committed
re-apply — per-rule exactly-once without cross-rule coordination.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
from binlake_spark.lake.merge import MergeResult
from binlake_spark.lake.table import LakeTable
from binlake_spark.streaming.engine import CdcEngine


@dataclass
class Rule:
    """One fan-out destination (the MQRule analog).

    ``predicate``: SQL filter over the envelope (white/black filter chain,
    MQFilter.java:56-220), or None for all events.  ``columns``: envelope
    projection (reserved-column bitmap, MQRule.handleMsgColumn,
    MQRule.java:356-410) — must keep the engine's required columns
    (doc_id, seq, op, n_tok + payload/tokens).
    """

    name: str
    table: LakeTable
    predicate: str | None = None
    columns: list[str] | None = None


class FanoutCdc:
    def __init__(self, rules: list[Rule], salt: int | None = None):
        if len({r.name for r in rules}) != len(rules):
            raise ValueError("rule names must be unique (they key the epoch guard)")
        self.rules = rules
        self.engines = {
            r.name: CdcEngine(r.table, stream_id=r.name, salt=salt) for r in rules
        }

    def apply_batch(self, batch_df: DataFrame, epoch_id: int) -> dict[str, MergeResult]:
        cached = batch_df.persist()
        try:
            results = {}
            for r in self.rules:
                df = cached
                if r.predicate:
                    df = df.filter(r.predicate)
                if r.columns:
                    df = df.select(*r.columns)
                results[r.name] = self.engines[r.name].apply_batch(df, epoch_id)
            return results
        finally:
            cached.unpersist()

    def run_stream(
        self,
        spark: SparkSession,
        source_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        timeout_s: int = 300,
    ):
        reader = spark.readStream.schema(CHANGE_LOG_SCHEMA)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
        stream = reader.parquet(source_dir)

        q = (
            stream.writeStream.foreachBatch(
                lambda df, eid: self.apply_batch(df, eid) and None
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
                deadline = time.monotonic() + 30
                while q.isActive and time.monotonic() < deadline:
                    time.sleep(0.2)
        return q
