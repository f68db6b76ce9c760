"""Event-stream filters & projections — the reference's rule chain as
Catalyst predicates.

Reference chain per rule (MQRule.convert, MQRule.java:107-151):
table regex white/black filter (MQFilter.filterTable :132-134, Aviator
regex :16-121) → event-type filter (BitSet, MQFilter.java:56-123) →
column white/black projection (reserved-column bitmap, MQRule.java:356-410)
→ fake (virtual) constant columns (Carrier.addFakeColumn :306-321) —
plus the unconditional pt-online-schema-change temp-table drop
(BinlogWorker.java:90, :910-912).

Here every one of those is a declarative DataFrame op, so Catalyst pushes
the predicates into the parquet scan and prunes columns for free —
``.explain`` shows them under PushedFilters/ReadSchema, which is the whole
point of expressing them this way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PT_OSC_PATTERN = r"^_.*_(old|new)$"


def filter_tables(
    df: DataFrame,
    white: str | None = None,
    black: str | None = None,
    db_col: str = "db",
    table_col: str = "table",
) -> DataFrame:
    """Regex white/black filter on `db.table` (white wins if both given,
    matching the reference's precedence: whites checked first,
    MQFilter.java:125-139)."""
    full = F.concat_ws(".", F.col(db_col), F.col(table_col))
    if white:
        df = df.filter(full.rlike(white))
    elif black:
        df = df.filter(~full.rlike(black))
    return df


def drop_pt_osc_tables(df: DataFrame, table_col: str = "table") -> DataFrame:
    return df.filter(~F.col(table_col).rlike(PT_OSC_PATTERN))


def filter_event_types(
    df: DataFrame, allowed: list[str], op_col: str = "op"
) -> DataFrame:
    """Event-type membership (the BitSet filter, MQFilter.java:56-123)."""
    return df.filter(F.col(op_col).isin(*allowed))


def project_columns(
    df: DataFrame,
    keep: list[str] | None = None,
    drop: list[str] | None = None,
) -> DataFrame:
    """Column white/black projection → Catalyst column pruning
    (MQRule.handleMsgColumn, MQRule.java:356-410)."""
    if keep is not None:
        return df.select(*[c for c in df.columns if c in set(keep)])
    if drop is not None:
        return df.select(*[c for c in df.columns if c not in set(drop)])
    return df


def with_fake_columns(df: DataFrame, constants: dict[str, str]) -> DataFrame:
    """Constant virtual columns appended per rule
    (ProtobufConverter.getFakeColumns, ProtobufConverter.java:738-750)."""
    for k, v in constants.items():
        df = df.withColumn(k, F.lit(v))
    return df
