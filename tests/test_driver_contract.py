"""Mimic the driver's correctness gate: every queries() entry vs its
DuckDB oracle at sf0.01 — row count, schema (column names), and exact
values after column-name sort + row sort.  EXTRA_QUERIES (near-twins
demoted out of the 50-row driver registry) are held to the identical
bar here, so consolidation never weakens coverage."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

# default: the driver's compare scale.  Override BOTH the table dir and
# the oracle fixture sf in one knob for cross-scale checks, e.g.
#   BINLAKE_CONTRACT_SF_DIR=/root/testdata/sf0.1 pytest tests/test_driver_contract.py
import os

SF_DIR = os.environ.get("BINLAKE_CONTRACT_SF_DIR", "/root/testdata/sf0.01")
os.environ.setdefault(
    "BINLAKE_ORACLE_SF", os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
)
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df


def _cmp_cell(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # Deliberately NO int<->float coercion: the driver's value hash is
    # type-sensitive (an int64 Spark column vs a float64 oracle column is a
    # hash mismatch even when values are numerically equal), so the in-repo
    # gate must be at least as strict.
    return type(a) is type(b) and a == b


from binlake_spark.plans import EXTRA_QUERIES, render_oracles  # noqa: E402

ALL_QUERIES = {**entry_mod.queries(), **EXTRA_QUERIES}
ALL_ORACLES = {**entry_mod.oracle_sql(), **render_oracles(extra=True)}
NAMES = sorted(ALL_ORACLES)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = ALL_QUERIES[name]
    sql = ALL_ORACLES[name]
    got = _norm(q(spark, SF_DIR).toPandas())
    exp = _norm(ddb.sql(sql).df())
    assert list(got.columns) == list(exp.columns), (list(got.columns), list(exp.columns))
    assert len(got) == len(exp), (len(got), len(exp))
    for col in got.columns:
        ga, ea = got[col].tolist(), exp[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(ga, ea)) if not _cmp_cell(x, y)
        ]
        assert not bad, f"{name}.{col}: first mismatches {bad[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
