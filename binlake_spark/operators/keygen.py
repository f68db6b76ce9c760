"""Order-grade key generators — the reference's six ordering levels as
partitioning expressions.

Reference: Meta.OrderType (Meta.java:719-726) defines NO_ORDER,
BUSINESS_KEY_ORDER, TABLE_ORDER, TRANSACTION_ORDER, DB_ORDER,
INSTANCE_ORDER; each maps to an IKeyGenerator that emits the bytes whose
murmur3 hash (& 1023, IKeyGenerator.java:22; HashUtils.java:30-133) picks
the producer queue and Kafka partition — i.e. the *shuffle key*.
BUSINESS_KEY_ORDER falls back Business→Table→Db→Instance when hash-key
columns are absent (IKeyGenerator.java:48-76).

In Spark the shuffle key is just a column expression handed to
``repartition``/``groupBy`` — same Murmur3 family under the hood.
NO_ORDER's random spreading is exactly salting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ORDER_GRADES = (
    "NO_ORDER",
    "BUSINESS_KEY_ORDER",
    "TABLE_ORDER",
    "TRANSACTION_ORDER",
    "DB_ORDER",
    "INSTANCE_ORDER",
)


def order_key(
    df: DataFrame,
    grade: str,
    business_cols: list[str] | None = None,
    table_col: str = "table",
    db_col: str = "db",
    trx_col: str = "trx_id",
    instance: str = "instance",
    salt: int = 1024,
) -> Column:
    """The shuffle-key expression for an order grade, with the reference's
    Business→Table→Db→Instance fallback chain."""
    grade = grade.upper()
    if grade == "NO_ORDER":
        # random spread == salting (IKeyGenerator.java:32-46 uses
        # random+timestamp keys for the same purpose)
        return F.pmod(F.floor(F.rand() * salt).cast("long"), F.lit(salt))
    if grade == "BUSINESS_KEY_ORDER":
        cols = [c for c in (business_cols or []) if c in df.columns]
        if cols:
            return F.concat_ws("\x01", *[F.col(c).cast("string") for c in cols])
        grade = "TABLE_ORDER"  # fallback chain
    if grade == "TABLE_ORDER":
        if table_col in df.columns:
            return F.concat_ws(".", F.col(db_col), F.col(table_col)) \
                if db_col in df.columns else F.col(table_col)
        grade = "DB_ORDER"
    if grade == "TRANSACTION_ORDER":
        return F.col(trx_col)
    if grade == "DB_ORDER":
        if db_col in df.columns:
            return F.col(db_col)
        grade = "INSTANCE_ORDER"
    if grade == "INSTANCE_ORDER":
        return F.lit(instance)
    raise ValueError(f"unknown order grade: {grade}")


def repartition_by_grade(df: DataFrame, grade: str, num_partitions: int, **kw) -> DataFrame:
    """Explicit hash partitioning on the grade's key — the IRepartition
    ``hash % queues`` stage (BinlogWorker.initPartition:250-258)."""
    return df.repartition(num_partitions, order_key(df, grade, **kw))
