"""Event-type dispatch parity: every id the reference's LogEvent
enumerates (MySQL 0-35 + MariaDB 160-163, LogEvent.java:91-189) is
known, MariaDB events are tolerated-and-skipped rather than errors, and
a genuinely unknown id is flagged, never silently dropped."""

from binlake_spark.functions.event_catalog import (
    EVENT_CATALOG,
    ROWS_EVENT_OP,
    classify_events,
)


def test_catalog_covers_reference_enum():
    assert set(range(36)) <= set(EVENT_CATALOG), "MySQL ids 0-35 all known"
    maria = {160, 161, 162, 163}
    assert maria <= set(EVENT_CATALOG), "MariaDB family known"
    assert all(EVENT_CATALOG[i][1] == "skip" for i in maria), (
        "MariaDB events are tolerated (skip), never an error"
    )
    assert set(ROWS_EVENT_OP) == {23, 24, 25, 30, 31, 32}
    assert {EVENT_CATALOG[i][1] for i in ROWS_EVENT_OP} == {"rows"}


def test_classify_events_dataframe(spark):
    rows = [(i,) for i in sorted(EVENT_CATALOG)] + [(99,), (200,)]
    df = spark.createDataFrame(rows, "event_type int")
    got = {r.event_type: (r.event_name, r.action, r.op)
           for r in classify_events(df).collect()}
    assert got[30] == ("WRITE_ROWS_EVENT", "rows", "I")
    assert got[31] == ("UPDATE_ROWS_EVENT", "rows", "U")
    assert got[32] == ("DELETE_ROWS_EVENT", "rows", "D")
    assert got[160] == ("ANNOTATE_ROWS_EVENT", "skip", None)
    assert got[162] == ("MARIA_GTID_EVENT", "skip", None)
    assert got[2] == ("QUERY_EVENT", "statement", None)
    assert got[29] == ("ROWS_QUERY_LOG_EVENT", "statement", None)
    assert got[27] == ("HEARTBEAT_LOG_EVENT", "control", None)
    # unknown ids surface loudly for the alarm rules
    assert got[99] == ("UNKNOWN(99)", "unknown", None)
    assert got[200] == ("UNKNOWN(200)", "unknown", None)
    # the classification is a pure projection: no exchange in the plan
    plan = classify_events(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
