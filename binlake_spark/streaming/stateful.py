"""Cross-batch stateful dedup — ``applyInPandasWithState``.

The engine's default exactly-once story needs no per-key streaming state:
per-epoch LWW compaction + the per-row ``_seq`` fence in the MERGE make
any replay a no-op (lake/merge.py).  This module adds the *in-stream*
variant: a key-partitioned stateful operator that remembers the highest
``seq`` applied per key across micro-batches and drops stale or duplicate
events before they reach the sink at all.

Reference parity: this is the consumer-side GTID compare BinLake delegates
to its downstream after an at-least-once failover (doc/binlake-arc.md:27,
GTIDUtils.compare GTIDUtils.java:73-94) — here moved into the stream as a
first-class operator.  The state layout (one long per key) is the smallest
possible; at 10^7 live keys that is ~hundreds of MB of state cluster-wide,
well inside the HDFS/RocksDB state-store budget, and the stream stays
hash-partitioned on the key exactly like the reference's producer queues
(BinlogWorker.initPartition:250-258).

All row-level work is pandas-vectorized per Arrow group batch — no per-row
Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def dedup_by_seq_stateful(
    events: DataFrame,
    key: str = "doc_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Streaming per-key monotone-seq filter.

    Emits only events whose ``seq`` is strictly greater than every seq
    previously *emitted* for the same key (across all prior micro-batches
    — the state survives in the checkpoint).  Within one batch, multiple
    still-increasing events for a key all pass, preserving the full change
    history for downstream compaction; exact duplicates and stale
    retransmits are dropped.

    Input must be a streaming DataFrame; output schema = input schema.
    """
    out_schema = events.schema
    state_schema = T.StructType([T.StructField("max_seq", T.LongType())])
    cols = [f.name for f in out_schema.fields]

    def fence(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (max_seq,) = state.get if state.exists else (-1,)
        # A key's rows within one micro-batch can arrive split across
        # multiple Arrow chunks that are NOT globally seq-ordered, so the
        # fence must see the whole group before filtering — otherwise a
        # legitimate lower-seq event in a later chunk is silently dropped.
        # A single key's batch slice is bounded by the micro-batch size, so
        # the concat stays small.
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(seq_col, kind="stable")
            fresh = pdf[pdf[seq_col] > max_seq]
            # drop equal-seq duplicates inside the batch too
            fresh = fresh[~fresh[seq_col].duplicated(keep="first")]
            if len(fresh):
                max_seq = int(fresh[seq_col].iloc[-1])
                yield fresh[cols]
        state.update((max_seq,))

    return events.groupBy(key).applyInPandasWithState(
        fence,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
