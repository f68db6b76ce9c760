from binlake_spark.streaming.engine import CdcEngine, DOCS_SCHEMA
from binlake_spark.streaming.stateful import dedup_by_seq_stateful

__all__ = ["CdcEngine", "DOCS_SCHEMA", "dedup_by_seq_stateful"]
