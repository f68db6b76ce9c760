"""Binlog event-type catalog: every event id the reference's dispatch
enumerates, with the action the pipeline takes for each.

The reference's ``LogEvent`` defines the full MySQL event enum (ids
0-35, LogEvent.java:91-165) plus the MariaDB family (ids 160-163,
LogEvent.java:167-189: ANNOTATE_ROWS / BINLOG_CHECKPOINT / MARIA_GTID /
GTID_LIST), and its decoder *tolerates* the MariaDB events — they are
recognized and skipped, never an error (LogDecoder.java's default arm
returns UnknownLogEvent only for ids outside the catalog).  The rebuild
keeps the same contract: a MariaDB-flavored stream must flow through
with its extra events classified ``skip`` (known, no data), while a
genuinely unknown id is flagged ``unknown`` so monitoring can alarm on
a protocol drift instead of silently dropping data.

Actions:

- ``rows``       — row images; becomes I/U/D change rows
- ``statement``  — statement/DDL text (QUERY, ROWS_QUERY, USER_VAR, …)
- ``control``    — stream plumbing (FORMAT_DESCRIPTION, ROTATE, GTID,
                   XID, TABLE_MAP, HEARTBEAT, …); consumed by the
                   engine, never emitted as data
- ``skip``       — known but carries nothing the pipeline needs
                   (MariaDB family, LOAD/SLAVE legacy, INCIDENT, …)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: id → (name, action); ids and names follow LogEvent.java:91-189
EVENT_CATALOG: dict[int, tuple[str, str]] = {
    0: ("UNKNOWN_EVENT", "skip"),
    1: ("START_EVENT_V3", "control"),
    2: ("QUERY_EVENT", "statement"),
    3: ("STOP_EVENT", "control"),
    4: ("ROTATE_EVENT", "control"),
    5: ("INTVAR_EVENT", "statement"),
    6: ("LOAD_EVENT", "skip"),
    7: ("SLAVE_EVENT", "skip"),
    8: ("CREATE_FILE_EVENT", "skip"),
    9: ("APPEND_BLOCK_EVENT", "skip"),
    10: ("EXEC_LOAD_EVENT", "skip"),
    11: ("DELETE_FILE_EVENT", "skip"),
    12: ("NEW_LOAD_EVENT", "skip"),
    13: ("RAND_EVENT", "statement"),
    14: ("USER_VAR_EVENT", "statement"),
    15: ("FORMAT_DESCRIPTION_EVENT", "control"),
    16: ("XID_EVENT", "control"),
    17: ("BEGIN_LOAD_QUERY_EVENT", "skip"),
    18: ("EXECUTE_LOAD_QUERY_EVENT", "statement"),
    19: ("TABLE_MAP_EVENT", "control"),
    20: ("PRE_GA_WRITE_ROWS_EVENT", "skip"),
    21: ("PRE_GA_UPDATE_ROWS_EVENT", "skip"),
    22: ("PRE_GA_DELETE_ROWS_EVENT", "skip"),
    23: ("WRITE_ROWS_EVENT_V1", "rows"),
    24: ("UPDATE_ROWS_EVENT_V1", "rows"),
    25: ("DELETE_ROWS_EVENT_V1", "rows"),
    26: ("INCIDENT_EVENT", "skip"),
    27: ("HEARTBEAT_LOG_EVENT", "control"),
    28: ("IGNORABLE_LOG_EVENT", "skip"),
    29: ("ROWS_QUERY_LOG_EVENT", "statement"),
    30: ("WRITE_ROWS_EVENT", "rows"),
    31: ("UPDATE_ROWS_EVENT", "rows"),
    32: ("DELETE_ROWS_EVENT", "rows"),
    33: ("GTID_LOG_EVENT", "control"),
    34: ("ANONYMOUS_GTID_LOG_EVENT", "control"),
    35: ("PREVIOUS_GTIDS_LOG_EVENT", "control"),
    # MariaDB family (LogEvent.java:167-189): recognized and tolerated —
    # a MySQL-only pipeline sees none of these, a MariaDB master emits
    # them freely and they must not alarm or abort
    160: ("ANNOTATE_ROWS_EVENT", "skip"),
    161: ("BINLOG_CHECKPOINT_EVENT", "skip"),
    162: ("MARIA_GTID_EVENT", "skip"),
    163: ("MARIA_GTID_LIST_EVENT", "skip"),
}

#: event ids that carry row images, with the change op they map to
ROWS_EVENT_OP: dict[int, str] = {
    23: "I", 24: "U", 25: "D", 30: "I", 31: "U", 32: "D",
}


def _lookup(col: Column, table: dict[int, str]) -> Column:
    """Literal int→string map lookup (NULL when absent) — a constant
    create_map stays in JVM codegen and broadcasts with the plan."""
    pairs = [x for k, v in table.items() for x in (F.lit(k), F.lit(v))]
    return F.element_at(F.create_map(*pairs), col)


def classify_events(df: DataFrame, type_col: str = "event_type") -> DataFrame:
    """Annotate a stream of raw events with (event_name, action, op):
    one literal-map projection, pure JVM codegen, no shuffle and no
    Python — safe at any scale.  Unknown ids classify as
    ('UNKNOWN(<id>)', 'unknown') so a protocol drift is visible to the
    alarm rules rather than silently dropped."""
    c = F.col(type_col).cast("int")
    name = F.coalesce(
        _lookup(c, {k: n for k, (n, _) in EVENT_CATALOG.items()}),
        F.concat(F.lit("UNKNOWN("), c.cast("string"), F.lit(")")),
    )
    action = F.coalesce(
        _lookup(c, {k: a for k, (_, a) in EVENT_CATALOG.items()}),
        F.lit("unknown"),
    )
    op = _lookup(c, ROWS_EVENT_OP)
    return (
        df.withColumn("event_name", name)
        .withColumn("action", action)
        .withColumn("op", op)
    )
