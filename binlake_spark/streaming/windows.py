"""Event-time windowed aggregation with watermarks.

The reference has **no watermarks and no event-time windows** — its
source is a totally ordered log, so late data cannot exist (SURVEY §2,
relational checklist).  The rebuild's streams are micro-batched and
parallel, so event-time semantics become meaningful; this module provides
the standard windowed rollups over the change stream — per-window change
rates, per-(window, op) counts — with a watermark bounding state and
discarding data later than the allowed lateness, exactly Spark's
documented semantics.

These are observability aggregations (the streaming twin of the batch
``evt_hourly_rollup`` driver query); the ingest path itself needs no
watermark because per-key LWW by ``seq`` is order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_change_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    op_col: str = "op",
) -> DataFrame:
    """Tumbling-window change-rate rollup with bounded state.

    Returns (window_start, window_end, op, n_events, n_docs) per closed
    window; events arriving later than ``watermark`` past the window end
    are dropped and the window's state is reclaimed.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(op_col).alias("op"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("doc_id").alias("n_docs"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "op",
            "n_events",
            "n_docs",
        )
    )
