"""Bucket-layout evolution: `rebucket` redistributes the table into a new
hash-bucket count in one atomic snapshot (Iceberg partition-spec
evolution analog; the reference's layout is frozen at `hash & 1023`).
"""

import pytest
from pyspark.sql import functions as F

from binlake_spark.changelog import (
    GenSpec,
    generate_change_log,
    oracle_final_state,
    write_change_log,
)
from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
from binlake_spark.lake import rebucket
from binlake_spark.streaming import CdcEngine
from tests.test_engine_replay import assert_state_equals_oracle


def _log_df(spark, tmp_path, pdf, name="log"):
    src = str(tmp_path / name)
    write_change_log(pdf, src)
    return spark.read.schema(CHANGE_LOG_SCHEMA).parquet(src)


def _state(spark, table):
    rows = table.read(spark, with_seq=True).collect()
    return {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"], r["_seq"])
        for r in rows
    }


@pytest.mark.parametrize("mor", [False, True], ids=["cow", "mor"])
def test_rebucket_preserves_state_and_folds_deltas(spark, tmp_path, mor):
    pdf = generate_change_log(GenSpec(n_docs=40, n_events=700))
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table, mode="mor" if mor else "cow", mor_compact_every=10**6)
    engine.apply_batch(df, epoch_id=0)

    before = _state(spark, table)
    if mor:
        assert table.snapshot()["deltas"]  # outstanding deltas going in
    res = rebucket(spark, table, 16)
    assert res["rebucketed"] and res["num_buckets"] == 16

    snap = table.snapshot()
    assert snap["num_buckets"] == 16
    assert snap["deltas"] == {}  # LWW-folded in transit
    assert _state(spark, table) == before


def test_rebucket_noop_and_watermark_floor(spark, tmp_path):
    pdf = generate_change_log(GenSpec(n_docs=30, n_events=400))
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    CdcEngine(table).apply_batch(df, epoch_id=0)
    old_wms = [int(w) for w in table.snapshot()["watermarks"].values()]

    v = int(table.snapshot()["version"])
    assert rebucket(spark, table, 4) == {"rebucketed": False, "version": v}

    rebucket(spark, table, 8)
    snap = table.snapshot()
    new_wms = {int(w) for w in snap["watermarks"].values()}
    # conservative fence: every new bucket gets the global minimum (under-
    # fencing re-admits retransmits, which per-row _seq LWW absorbs)
    assert new_wms == {min(old_wms)}
    # ... and EVERY bucket is fenced, including ones the rewrite left
    # empty — a deleted key's bucket must still reject retransmitted
    # prefixes (same rule as bootstrap_snapshot)
    assert set(snap["watermarks"]) == {str(b) for b in range(8)}


def test_ingest_continues_after_rebucket(spark, tmp_path):
    pdf = generate_change_log(GenSpec(n_docs=50, n_events=1000, retransmit_frac=0.1))
    cut = int(pdf["seq"].quantile(0.5))
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    engine.apply_batch(df.filter(F.col("seq") <= cut), epoch_id=0)
    rebucket(spark, table, 16)
    engine.apply_batch(df.filter(F.col("seq") > cut), epoch_id=1)
    # merges pick the new layout up from the snapshot; final state exact
    assert_state_equals_oracle(spark, engine, pdf)
    assert table.snapshot()["num_buckets"] == 16


def test_change_feed_across_rebucket_boundary(spark, tmp_path):
    from tests.test_change_feed import _expected_diff

    pdf = generate_change_log(GenSpec(n_docs=40, n_events=800))
    cut = int(pdf["seq"].quantile(0.5))
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    engine.apply_batch(df.filter(F.col("seq") <= cut), epoch_id=0)
    v_a = int(table.snapshot()["version"])
    rebucket(spark, table, 16)
    engine.apply_batch(df.filter(F.col("seq") > cut), epoch_id=1)

    # pruning is undefined across the layout change …
    with pytest.raises(ValueError, match="rebucket"):
        table.changed_buckets(v_a)
    # … but the feed itself degrades to an unpruned scan and stays exact
    got = {
        r["doc_id"]: (r["_change_op"], int(r["_seq"]))
        for r in table.read_changes(spark, from_version=v_a).collect()
    }
    assert got == _expected_diff(pdf, cut)


def test_expire_reclaims_old_layout(spark, tmp_path):
    import glob as _glob
    import os

    pdf = generate_change_log(GenSpec(n_docs=30, n_events=400))
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    CdcEngine(table).apply_batch(df, epoch_id=0)
    before = _state(spark, table)
    rebucket(spark, table, 8)
    stats = table.expire_snapshots(keep_last=1)
    assert stats["files_removed"] > 0  # old 4-bucket layout reclaimed
    live = _glob.glob(os.path.join(str(tmp_path / "docs"), "data", "**", "*.parquet"),
                      recursive=True)
    snap = table.snapshot()
    reachable = {p for fl in snap["files"].values() for p in fl}
    assert {os.path.relpath(p, str(tmp_path / "docs")) for p in live} == reachable
    assert _state(spark, table) == before
