"""M1: end-to-end batch replay → exact token-array equality vs the oracle.

This is the correctness gate of BASELINE.json input_hint: replay the
change log, compare the engine's final table against the pandas oracle on
exact per-doc_id token arrays, across every generator scenario.
"""

import numpy as np
import pytest

from binlake_spark.changelog import (
    GenSpec,
    generate_change_log,
    oracle_final_state,
    write_change_log,
)
from binlake_spark.streaming import CdcEngine


def assert_state_equals_oracle(spark, engine, log_pdf, check_lang=False):
    expected = oracle_final_state(log_pdf)
    got = engine.read_state(spark).orderBy("doc_id").collect()
    assert len(got) == len(expected), (len(got), len(expected))
    for row, (_, ref) in zip(got, expected.iterrows()):
        assert row.doc_id == ref.doc_id
        assert np.array_equal(np.array(row.tokens, dtype=np.int32), ref.tokens), row.doc_id
        assert row.n_tok == ref.n_tok
        assert row.source == ref.source
        if check_lang:
            assert row.lang == (ref.lang if ref.lang is not None else None)


SCENARIOS = {
    "clean": GenSpec(n_docs=100, n_events=1500),
    "retransmit": GenSpec(n_docs=100, n_events=1500, retransmit_frac=0.2),
    "hot_key": GenSpec(n_docs=50, n_events=1500, hot_keys=3, hot_frac=0.4),
    "delete_reinsert": GenSpec(n_docs=10, n_events=1500),  # dense ops per key
    "multi_server": GenSpec(n_docs=100, n_events=1500, n_servers=4),
    "corrupt": GenSpec(n_docs=80, n_events=1000, corrupt_frac=0.1),
}


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_batch_replay_matches_oracle(spark, tmp_path, name):
    spec = SCENARIOS[name]
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table, salt=8 if name == "hot_key" else None)
    res = engine.run_batch_replay(spark, src)
    assert res.applied
    assert_state_equals_oracle(spark, engine, pdf)


def test_batch_replay_with_evolution(spark, tmp_path):
    spec = GenSpec(n_docs=60, n_events=1200, evolution_at=600)
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    engine.run_batch_replay(spark, src)
    assert "lang" in [f.name for f in table.schema().fields]
    assert_state_equals_oracle(spark, engine, pdf, check_lang=True)


def test_delete_then_reinsert_ordering(spark, tmp_path):
    import pandas as pd

    base = generate_change_log(GenSpec(n_docs=5, n_events=20))
    # hand-crafted tombstone ordering on one key
    extra_rows = base.iloc[:3].copy()
    extra_rows["doc_id"] = "doc000001"
    extra_rows["seq"] = [1000, 1001, 1002]
    extra_rows["op"] = ["D", "I", "U"]
    pdf = pd.concat([base, extra_rows], ignore_index=True)
    pdf["epoch_hint"] = 0
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    engine.run_batch_replay(spark, src)
    assert_state_equals_oracle(spark, engine, pdf)
    live = {r.doc_id for r in engine.read_state(spark).collect()}
    assert "doc000001" in live  # reinserted after delete


def test_auto_expiry_bounds_storage_and_keeps_state(spark, tmp_path):
    """Engine-driven expire_snapshots: storage stays bounded across many
    epochs and the final state is still oracle-exact."""
    import os

    spec = GenSpec(n_docs=60, n_events=1200, events_per_epoch=150, retransmit_frac=0.1)
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table, expire_every=3, expire_keep_last=2)
    engine.run_stream(spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert table.last_epoch("cdc") >= 7
    # snapshots bounded: at most keep_last + expire_every versions on disk
    assert len(table.versions()) <= 2 + 3
    # dead data dirs are gone too: commit dirs on disk ≤ kept versions
    data_dirs = os.listdir(os.path.join(str(tmp_path / "docs"), "data"))
    assert len(data_dirs) <= 2 + 3
    assert_state_equals_oracle(spark, engine, pdf)


def test_mor_mode_matches_oracle_and_compacts(spark, tmp_path):
    """Merge-on-read: delta appends + read-time LWW + periodic compaction
    land on the identical final state as COW, oracle-exact, including
    tombstones, retransmits, hot keys, and mid-stream schema evolution."""
    from binlake_spark.lake.merge import compact_buckets

    spec = GenSpec(
        n_docs=80, n_events=1600, events_per_epoch=200,
        retransmit_frac=0.15, hot_keys=3, hot_frac=0.3, evolution_at=800,
    )
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table, mode="mor", mor_compact_every=3)
    engine.run_stream(spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert table.last_epoch("cdc") >= 7
    # mid-state: some deltas outstanding or just compacted; state exact
    assert_state_equals_oracle(spark, engine, pdf, check_lang=True)
    # replaying an applied epoch is a no-op in MOR too
    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA

    df = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(src)
    assert engine.apply_batch(df, epoch_id=0).skipped_reason == "epoch-already-applied"
    # full compaction folds every delta; state unchanged, read path clean
    compact_buckets(spark, table)
    assert table.snapshot().get("deltas", {}) == {}
    assert_state_equals_oracle(spark, engine, pdf, check_lang=True)


def test_mor_write_cost_independent_of_table_size(spark, tmp_path):
    """The MOR claim itself: an epoch's delta bytes track the batch, not
    the table — while COW rewrites dirty buckets whole."""
    import os

    spec = GenSpec(n_docs=2000, n_events=8000, events_per_epoch=1000)
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    t_mor = CdcEngine.create_table(str(tmp_path / "mor"), num_buckets=4)
    e_mor = CdcEngine(t_mor, mode="mor", mor_compact_every=0, expire_every=None)
    e_mor.run_stream(spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert_state_equals_oracle(spark, e_mor, pdf)
    # every merge's written rows ≈ winners of that epoch (≤ events/epoch),
    # never the accumulated live-table size
    merges = [e for e in t_mor._all_lineage() if e.get("kind") == "merge"]
    live = t_mor.read(spark).count()
    for m in merges[1:]:
        written = sum(p["n_rows"] for p in m["partitions"])
        assert written <= 1000  # bounded by the batch
    assert live > 1200  # table grew well past one epoch's batch


def test_no_broadcast_replay_matches_oracle(spark, tmp_path):
    """The unbounded-replay regime: the event-count hint exceeds
    broadcast_winner_limit, so the engine unpins the winner broadcast and
    lets AQE/bloom pick the join — final state must be identical."""
    spec = GenSpec(n_docs=100, n_events=1500, retransmit_frac=0.1, evolution_at=700)
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table, broadcast_winner_limit=100)
    res = engine.run_batch_replay(spark, src)
    assert res.applied
    assert_state_equals_oracle(spark, engine, pdf, check_lang=True)


def test_ddl_event_drives_schema_evolution(spark, tmp_path):
    """QUERY/DDL events in the log evolve the table schema end-to-end:
    `lang` arrives via DDL + extra-promote, `quality` via DDL only (all
    NULL), and the final state stays oracle-exact."""
    spec = GenSpec(n_docs=60, n_events=1200, evolution_at=600, ddl_events=True)
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    engine.run_batch_replay(spark, src)
    names = [f.name for f in table.schema().fields]
    assert "lang" in names and "quality" in names
    state = engine.read_state(spark)
    assert state.filter(state.quality.isNotNull()).count() == 0
    assert any(e.get("kind") == "alter" for e in table._all_lineage())
    assert_state_equals_oracle(spark, engine, pdf, check_lang=True)

    # with the extra-promote path disabled, the columns still appear —
    # proving the DDL path alone evolves the schema
    t2 = CdcEngine.create_table(str(tmp_path / "docs2"), num_buckets=8)
    e2 = CdcEngine(t2, promote_extra=False)
    e2.run_batch_replay(spark, src)
    n2 = [f.name for f in t2.schema().fields]
    assert "quality" in n2 and "lang" in n2


def test_before_image_audit(spark, tmp_path):
    """Before-image reconciliation: a clean log with (before, after) pairs
    replays oracle-exact under audit (chain + head-vs-table checks), and a
    tampered before image is surfaced as BeforeImageMismatch, never
    silently applied."""
    from pyspark.sql import functions as F

    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
    from binlake_spark.operators.audit import BeforeImageMismatch

    spec = GenSpec(
        n_docs=40, n_events=800, events_per_epoch=400,
        before_images=True, shuffle_window=1,
    )
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table, audit_before_images=True)
    log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(src)
    # per-epoch apply so epoch 1's chain heads are audited against the
    # table state epoch 0 committed
    for i in range(2):
        engine.apply_batch(log.filter(F.col("epoch_hint") == i), epoch_id=i)
    assert_state_equals_oracle(spark, engine, pdf)

    bad = pdf.copy()
    u_idx = bad.index[(bad.op == "U") & bad.before_payload.notna()][0]
    bad.at[u_idx, "before_payload"] = b"\x00\x01\x02\x03"
    src2 = str(tmp_path / "log2")
    write_change_log(bad, src2)
    t2 = CdcEngine.create_table(str(tmp_path / "docs2"), num_buckets=4)
    e2 = CdcEngine(t2, audit_before_images=True)
    with pytest.raises(BeforeImageMismatch):
        e2.run_batch_replay(spark, src2)


def test_position_bootstrap_and_resume_fence(spark, tmp_path):
    """Position bootstrap (dump-from-seq / from-timestamp) replays exactly
    the suffix, and resuming a table against a log that no longer covers
    its applied seqs fails fast instead of silently no-opping."""
    from binlake_spark.streaming.engine import ResumeAheadOfLog

    spec = GenSpec(n_docs=40, n_events=800, events_per_epoch=400)
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)

    t1 = CdcEngine.create_table(str(tmp_path / "t1"), num_buckets=4)
    e1 = CdcEngine(t1)
    e1.run_batch_replay(spark, src, from_seq=401)
    assert_state_equals_oracle(spark, e1, pdf[pdf.seq >= 401])

    cut = pdf.loc[pdf.seq == 401, "ts"].iloc[0].to_pydatetime()
    t2 = CdcEngine.create_table(str(tmp_path / "t2"), num_buckets=4)
    e2 = CdcEngine(t2)
    e2.run_batch_replay(spark, src, from_ts=cut)
    assert_state_equals_oracle(spark, e2, pdf[pdf.seq >= 401])

    t3 = CdcEngine.create_table(str(tmp_path / "t3"), num_buckets=4)
    e3 = CdcEngine(t3)
    e3.run_batch_replay(spark, src)
    trunc = str(tmp_path / "trunc")
    write_change_log(pdf[pdf.epoch_hint == 0], trunc)
    with pytest.raises(ResumeAheadOfLog):
        e3.run_stream(spark, trunc, str(tmp_path / "ckpt"))


def test_ddl_only_epoch_applies_alter_and_commits(spark, tmp_path):
    """An epoch whose only event is a QUERY/DDL statement still applies
    the ALTER and commits the epoch marker (empty-batch path), so a
    replay of that epoch is a no-op."""
    import pandas as pd

    from binlake_spark.changelog.generator import (
        CHANGE_LOG_SCHEMA,
        DDL_STATEMENT,
    )

    base = generate_change_log(GenSpec(n_docs=5, n_events=10))
    ddl_row = base.iloc[:1].copy()
    ddl_row["seq"] = [999]
    ddl_row["op"] = ["Q"]
    ddl_row["doc_id"] = [""]
    ddl_row["tokens"] = [[]]
    ddl_row["n_tok"] = [0]
    ddl_row["payload"] = [b""]
    ddl_row["extra"] = [[("ddl", DDL_STATEMENT)]]
    src = str(tmp_path / "log")
    write_change_log(pd.concat([ddl_row], ignore_index=True), src)

    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(src)
    res = engine.apply_batch(log, epoch_id=0)
    assert res.applied and res.skipped_reason == "empty-batch"
    names = [f.name for f in table.schema().fields]
    assert "lang" in names and "quality" in names
    assert engine.apply_batch(log, epoch_id=0).skipped_reason == "epoch-already-applied"


def test_snapshot_bootstrap_handoff_matches_full_replay(spark, tmp_path):
    """Initial-load handoff: bootstrap an empty table from the engine's
    own prefix state (the JDBC-snapshot stand-in), replay only the
    suffix, and land on exactly the full-replay state — across
    retransmits, hot keys, and the mid-stream evolution point (which is
    after the cut, so evolution happens on the incremental side)."""
    from pyspark.sql import functions as F

    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA

    spec = GenSpec(
        n_docs=80, n_events=1500, retransmit_frac=0.15, hot_keys=2,
        hot_frac=0.3, evolution_at=1000,
    )
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(src)
    cut = 700  # before the evolution point

    upstream = CdcEngine(
        CdcEngine.create_table(str(tmp_path / "primary"), num_buckets=8)
    )
    upstream.apply_batch(log.filter(F.col("seq") <= cut), epoch_id=0)
    snapshot_df = upstream.table.read(spark, with_seq=True)

    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    res = engine.bootstrap_from_snapshot(
        spark, snapshot_df, as_of_seq=cut, seq_col="_seq"
    )
    assert res.applied and res.n_net == snapshot_df.count()
    # every bucket fenced at the snapshot position
    wms = set(table.snapshot()["watermarks"].values())
    assert wms == {cut}
    assert [e for e in table._all_lineage() if e["kind"] == "bootstrap"]

    engine.run_batch_replay(spark, src, from_seq=cut + 1)
    assert_state_equals_oracle(spark, engine, pdf, check_lang=True)


def test_snapshot_bootstrap_requires_empty_table(spark, tmp_path):
    from pyspark.sql import functions as F

    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA

    pdf = generate_change_log(GenSpec(n_docs=20, n_events=200))
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(src)

    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    engine.run_batch_replay(spark, src)
    with pytest.raises(ValueError, match="empty table"):
        engine.bootstrap_from_snapshot(
            spark, engine.read_state(spark), as_of_seq=10**9
        )


def test_snapshot_bootstrap_full_replay_converges_via_fence(spark, tmp_path):
    """Replaying the FULL log over a bootstrapped table (no from_seq)
    must also converge: the per-bucket fence at as_of_seq plus per-row
    LWW make the prefix a no-op."""
    from pyspark.sql import functions as F

    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA

    pdf = generate_change_log(GenSpec(n_docs=40, n_events=800, retransmit_frac=0.2))
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(src)
    cut = 400

    upstream = CdcEngine(
        CdcEngine.create_table(str(tmp_path / "primary"), num_buckets=4)
    )
    upstream.apply_batch(log.filter(F.col("seq") <= cut), epoch_id=0)

    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    engine.bootstrap_from_snapshot(
        spark, upstream.table.read(spark, with_seq=True), as_of_seq=cut,
        seq_col="_seq",
    )
    engine.run_batch_replay(spark, src)  # full log, no position
    assert_state_equals_oracle(spark, engine, pdf)


@pytest.mark.parametrize("mode,order_kind", [
    ("cow", "pairwise"), ("mor", "pairwise"),
    ("cow", "reversed"), ("mor", "reversed"),
])
def test_out_of_order_epoch_batches_keep_deletes(
    spark, tmp_path, mode, order_kind
):
    """Exactly-once under batch REORDERING: pairwise-swapped epoch files
    applied as sequential epochs must still land the oracle state.

    This is the flake the replay demo exposed (~1/16 runs): Spark's file
    stream orders new files by mtime, ties resolve by listing order, and
    a resume handed file k+1's batch to the engine before file k's.  LWW
    absorbs reordered UPSERTS, but a delete that merely removed its row
    left nothing to out-sequence file k's stale upsert — the doc
    silently resurrected (285 vs 282 live docs).  Delete TOMBSTONES
    (lake/merge.py, lake/table.py `_tombstone`) make LWW total; this
    test replays every adjacent epoch pair in the wrong order, in both
    engine modes, with a mid-sequence compaction on MOR so tombstones
    also survive the delta→base fold."""
    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
    from binlake_spark.lake.merge import compact_buckets

    spec = GenSpec(n_docs=40, n_events=1600, events_per_epoch=200,
                   retransmit_frac=0.1)
    pdf = generate_change_log(spec)
    # the scenario only bites if docs deleted in epoch 2k+1 have an
    # earlier upsert in epoch 2k — assert the fixture actually carries it
    last = pdf.sort_values("seq").groupby("doc_id").tail(1)
    dels = last[last.op == "D"]
    vulnerable = 0
    for _, d in dels.iterrows():
        pre = pdf[(pdf.doc_id == d.doc_id) & (pdf.seq < d.seq)
                  & (pdf.epoch_hint == d.epoch_hint - 1)]
        if d.epoch_hint % 2 == 1 and len(pre):
            vulnerable += 1
    assert vulnerable > 0, "fixture lost its delete-after-upsert pairs"

    src = str(tmp_path / "log")
    files = sorted(write_change_log(pdf, src))
    if order_kind == "reversed":
        # worst case: EVERY batch arrives before every batch that should
        # precede it — each doc's full history replays newest-first
        order = list(range(len(files)))[::-1]
    else:
        from binlake_spark.changelog.generator import pairwise_swapped_order

        order = pairwise_swapped_order(len(files))

    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table) if mode == "cow" else CdcEngine(
        table, mode="mor"
    )
    for eid, fidx in enumerate(order):
        df = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(files[fidx])
        res = engine.apply_batch(df, epoch_id=eid)
        assert res.applied
        if mode == "mor" and eid == len(order) // 2:
            compact_buckets(spark, engine.table)  # tombstones must survive
    if mode == "mor":
        compact_buckets(spark, engine.table)
    assert_state_equals_oracle(spark, engine, pdf)


def test_purge_tombstones_reclaims_below_horizon(spark, tmp_path):
    """Tombstone retention: purge drops only tombstones at/below the
    caller's horizon, never live rows; the logical table is unchanged."""
    from pyspark.sql import functions as F

    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
    from binlake_spark.lake.merge import purge_tombstones

    pdf = generate_change_log(GenSpec(n_docs=30, n_events=900))
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    engine.run_batch_replay(spark, src)

    live_before = engine.read_state(spark).count()
    raw = table.read(spark, with_seq=True, with_tombstones=True)
    n_tomb = raw.filter(F.col("_tombstone")).count()
    assert n_tomb > 0  # the generator deletes docs
    max_seq = int(pdf["seq"].max())

    out = purge_tombstones(spark, table, horizon_seq=max_seq)
    assert out["purged_buckets"] > 0
    raw2 = table.read(spark, with_seq=True, with_tombstones=True)
    assert raw2.filter(F.col("_tombstone")).count() == 0
    assert engine.read_state(spark).count() == live_before
    # idempotent / no-op when nothing qualifies
    out2 = purge_tombstones(spark, table, horizon_seq=max_seq)
    assert out2["purged_buckets"] == 0


def test_purge_tombstones_refuses_unfolded_deltas(spark, tmp_path):
    """A purge can only reclaim BASE rows — on a MOR table with
    outstanding delta files it must raise (reporting success while the
    delta tombstones re-resolve on the next read would be a silent
    no-op for a retention/compliance caller), and succeed after
    compaction folds them down."""
    from pyspark.sql import functions as F

    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
    from binlake_spark.lake.merge import compact_buckets, purge_tombstones

    pdf = generate_change_log(GenSpec(n_docs=20, n_events=400))
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table, mode="mor")
    engine.run_batch_replay(spark, src)
    assert any(fl for fl in table.snapshot().get("deltas", {}).values())
    with pytest.raises(ValueError, match="compact_buckets first"):
        purge_tombstones(spark, table, horizon_seq=int(pdf["seq"].max()))
    compact_buckets(spark, table)
    live = engine.read_state(spark).count()
    out = purge_tombstones(spark, table, horizon_seq=int(pdf["seq"].max()))
    assert out["purged_buckets"] > 0
    assert engine.read_state(spark).count() == live
    raw = table.read(spark, with_seq=True, with_tombstones=True)
    assert raw.filter(F.col("_tombstone")).count() == 0


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_tombstone_fences_stale_upsert(spark, tmp_path, mode):
    """The distilled resurrection case (red pre-tombstones, bit-exact
    repro of the demo flake): epoch 0 applies the LATER batch (insert
    doc-b seq3, DELETE doc-a seq4), epoch 1 applies the EARLIER one
    (stale insert doc-a seq1).  Without a tombstone the delete leaves no
    row to out-sequence seq1 and doc-a comes back from the dead; with
    it, the stale upsert loses the LWW comparison against the tombstone
    row.  MOR additionally compacts between the two epochs so the
    tombstone must survive the delta→base fold."""
    import datetime

    from pyspark.sql import Row

    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
    from binlake_spark.lake.merge import compact_buckets

    def ev(seq, op, doc, toks):
        payload = b"".join(int(t).to_bytes(4, "little") for t in toks)
        return Row(seq=seq, server_uuid="u", gno=seq, trx_id=seq,
                   ts=datetime.datetime(2026, 1, 1), op=op, doc_id=doc,
                   tokens=None, n_tok=len(toks), source="s",
                   payload=bytearray(payload), before_payload=None,
                   schema_ver=1, extra=None, epoch_hint=0)

    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=2)
    engine = CdcEngine(table) if mode == "cow" else CdcEngine(table, mode="mor")
    engine.apply_batch(
        spark.createDataFrame(
            [ev(3, "I", "doc-b", [7]), ev(4, "D", "doc-a", [])],
            CHANGE_LOG_SCHEMA,
        ),
        epoch_id=0,
    )
    if mode == "mor":
        compact_buckets(spark, engine.table)  # tombstone now lives in base
    engine.apply_batch(
        spark.createDataFrame([ev(1, "I", "doc-a", [5])], CHANGE_LOG_SCHEMA),
        epoch_id=1,
    )
    if mode == "mor":
        compact_buckets(spark, engine.table)
    live = sorted(r.doc_id for r in engine.read_state(spark).collect())
    assert live == ["doc-b"], f"doc-a resurrected: {live}"
    # the tombstone is physically present and carries the delete's seq
    from pyspark.sql import functions as F

    raw = table.read(spark, with_seq=True, with_tombstones=True)
    tomb = raw.filter(F.col("_tombstone")).collect()
    assert [(t.doc_id, t._seq) for t in tomb] == [("doc-a", 4)]


def test_engine_purge_entry_folds_mor_first(spark, tmp_path):
    """CdcEngine.purge_tombstones: COW delegates straight through (the
    purge sweep rewrites the dead buckets); MOR fuses the retention
    pass INTO the delta compaction — one rewrite per delta bucket — so
    the trailing sweep finds nothing left to purge.  Both modes end
    with zero tombstones and an unchanged logical table."""
    from pyspark.sql import functions as F

    pdf = generate_change_log(GenSpec(n_docs=20, n_events=400))
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    horizon = int(pdf["seq"].max())
    for mode in ("cow", "mor"):
        table = CdcEngine.create_table(str(tmp_path / mode), num_buckets=4)
        engine = CdcEngine(table) if mode == "cow" else CdcEngine(table, mode="mor")
        engine.run_batch_replay(spark, src)
        live = engine.read_state(spark).count()
        out = engine.purge_tombstones(spark, horizon_seq=horizon)
        if mode == "cow":
            assert out["purged_buckets"] > 0
        else:
            # the fused compact(tombstone_horizon=...) already reclaimed
            # every dead tombstone; the sweep must confirm-as-no-op, not
            # rewrite the same buckets a second time
            assert out["purged_buckets"] == 0
            assert table.snapshot().get("deltas", {}) == {}
        assert engine.read_state(spark).count() == live
        raw = table.read(spark, with_seq=True, with_tombstones=True)
        assert raw.filter(F.col("_tombstone")).count() == 0, mode
