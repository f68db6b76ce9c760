"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC LWW query on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family (binlake_spark/plans/driver_queries.py), each with a DuckDB oracle
whose result is engine-exact (decimal sums, rounded doubles, quantized
embeddings, portable md5-based hashes).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from binlake_spark.plans import QUERIES, render_oracles  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["cdc_lww_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries — the harness records at most 50 CORRECTNESS
    rows, so one query per operator family; near-twin variants live in
    binlake_spark.plans.EXTRA_QUERIES (pytest-oracle-checked)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles with sf-dependent fixture paths rendered for the
    scale under test: sf0.01 (the driver's compare scale) by default;
    set BINLAKE_ORACLE_SF=0.1 to cross-check another sf — the Spark
    queries derive the same fixture from their sf_dir argument."""
    return render_oracles()
