from binlake_spark.streaming.engine import CdcEngine, DOCS_SCHEMA

__all__ = ["CdcEngine", "DOCS_SCHEMA"]
