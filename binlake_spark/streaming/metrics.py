"""Streaming progress metrics — the stage-delay monitor rebuilt.

The reference hooks per-stage delay gauges into its pipeline
(PerformanceUtils.java:13-45; emit sites BinlogWorker.java:841-845,
ProduceTask.java:63-64).  The Spark rebuild has two metric planes:

1. per-epoch phase/offset metrics committed *with the data* in the
   LakeTable lineage (lake/table.py lineage_df / bucket_offsets_df);
2. this module: a ``StreamingQueryListener`` appending one JSON line per
   micro-batch progress event — input rate, processing rate, batch
   durations by stage — the live-gauge half.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogger(StreamingQueryListener):
    """Append query-progress JSON lines to ``path`` (one object per batch)."""

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def onQueryStarted(self, event):  # noqa: N802 (Spark API casing)
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs or {}),
            }
        )

    def onQueryTerminated(self, event):  # noqa: N802
        self._write({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def _write(self, obj: dict) -> None:
        with self._lock, open(self.path, "a") as f:
            f.write(json.dumps(obj) + "\n")


def attach_progress_logger(spark: SparkSession, path: str) -> ProgressLogger:
    """Attach (and return) a progress logger; detach with
    ``spark.streams.removeListener(logger)``."""
    logger = ProgressLogger(path)
    spark.streams.addListener(logger)
    return logger
