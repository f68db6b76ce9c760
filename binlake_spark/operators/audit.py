"""Before-image reconciliation — UPDATE (before, after) row-pair audit.

The reference carries both images for every UPDATE (RowsLogEvent.java:
112-168; entry.proto RowData before/afterColumns :75-117; update-diff
flagging TableRowsParser.java:102-244) so downstreams can verify that the
row they are about to overwrite is the row the producer saw.  The rebuild
makes that an opt-in audit pass: every U event's ``before_payload`` must
equal the payload of the key's chain predecessor — the previous event in
the batch, or the table's current row for the head of the chain.

Semantics contract: the audit assumes the change log is delivered in seq
order per key across micro-batches (a real binlog's property; the
generator's ``shuffle_window`` must not straddle epoch files for the
head-of-chain check to be exact).  A diverging before-image means the
producer and the table disagree about history — the engine surfaces it
(:class:`BeforeImageMismatch`) instead of silently applying the change.

All row-level work is pandas-vectorized per key group (no per-row
Python); the group shuffle is the same doc_id hash partitioning the
compaction uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class BeforeImageMismatch(ValueError):
    """A change batch carried a before-image that contradicts history."""


def find_before_image_violations(
    events: DataFrame,
    current_state: DataFrame | None = None,
    key: str = "doc_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Return (key, seq, kind) for every U event whose ``before_payload``
    disagrees with its chain predecessor.

    ``kind``: ``"chain"`` — predecessor is an earlier event in this batch;
    ``"head"`` — predecessor is the table's current row (``current_state``
    must be read with ``with_seq=True`` so state rows sort into the chain
    at their true ``_seq`` position).  U events with NULL before images or
    unknowable predecessors (key absent from batch and state) pass.
    """
    cols = [key, seq_col, "op", "payload", "before_payload"]
    ev = events.select(*cols).filter(F.col("op").isin("I", "U", "D"))
    has_state = current_state is not None
    if has_state:
        st = current_state.select(
            F.col(key),
            F.col("_seq").cast("long").alias(seq_col),
            F.lit("S").alias("op"),
            F.lit(None).cast("binary").alias("payload"),
            F.lit(None).cast("binary").alias("before_payload"),
            F.col("tokens").alias("_state_tokens"),
        )
        ev = ev.withColumn(
            "_state_tokens", F.lit(None).cast("array<int>")
        ).unionByName(st)

    out_schema = T.StructType(
        [
            T.StructField(key, T.StringType()),
            T.StructField(seq_col, T.LongType()),
            T.StructField("kind", T.StringType()),
        ]
    )

    def check(pdf):
        import numpy as np

        pdf = pdf.sort_values(seq_col, kind="stable")
        pdf = pdf[~pdf[seq_col].duplicated(keep="first")]  # retransmits
        if has_state:
            m = pdf["op"] == "S"
            if m.any():
                pdf.loc[m, "payload"] = pdf.loc[m, "_state_tokens"].map(
                    lambda a: np.asarray(a, dtype="<i4").tobytes()
                )
        prev_payload = pdf["payload"].shift(1)
        prev_op = pdf["op"].shift(1)
        checkable = (
            (pdf["op"] == "U")
            & pdf["before_payload"].notna()
            & prev_payload.notna()
        )
        bad = checkable & (pdf["before_payload"] != prev_payload)
        out = pdf.loc[bad, [key, seq_col]].copy()
        out["kind"] = np.where(prev_op.loc[bad] == "S", "head", "chain")
        return out

    return ev.groupBy(key).applyInPandas(check, schema=out_schema)
