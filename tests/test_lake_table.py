"""LakeTable: snapshots, atomic commits, schema evolution, bucket pruning."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binlake_spark.lake import LakeTable, merge_into
from binlake_spark.lake.table import CommitConflict

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def _net(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, seq long, op string, tokens array<int>, n_tok int, source string"
    )


def test_create_read_empty(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=4)
    assert t.read(spark).count() == 0
    assert t.schema() == SCHEMA


def test_merge_insert_update_delete(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=4)
    r1 = merge_into(
        spark, t, _net(spark, [("a", 1, "I", [1, 2], 2, "web"), ("b", 2, "I", [3], 1, "web")]),
        epoch_id=0,
    )
    assert r1.applied and r1.n_net == 2
    assert t.read(spark).count() == 2

    r2 = merge_into(
        spark, t,
        _net(spark, [("a", 3, "U", [9, 9, 9], 3, "web"), ("b", 4, "D", None, None, None)]),
        epoch_id=1,
    )
    assert r2.applied
    rows = {r.doc_id: r for r in t.read(spark).collect()}
    assert set(rows) == {"a"}
    assert rows["a"].tokens == [9, 9, 9]


def test_epoch_idempotence_guard(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=4)
    net = _net(spark, [("a", 1, "I", [1], 1, "web")])
    assert merge_into(spark, t, net, epoch_id=5).applied
    v = t.snapshot()["version"]
    replay = merge_into(spark, t, net, epoch_id=5)
    assert not replay.applied and replay.skipped_reason == "epoch-already-applied"
    assert t.snapshot()["version"] == v


def test_watermark_fence_blocks_retransmit(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=4)
    merge_into(spark, t, _net(spark, [("a", 10, "U", [7], 1, "web")]), epoch_id=0)
    # stale retransmit arrives in a LATER epoch with an OLDER seq
    merge_into(spark, t, _net(spark, [("a", 3, "U", [1, 1], 2, "web")]), epoch_id=1)
    rows = t.read(spark).collect()
    assert rows[0].tokens == [7]  # old write did not clobber newer state


def test_bucket_pruning_rewrites_only_dirty(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=8)
    rows = [(f"d{i}", i + 1, "I", [i], 1, "web") for i in range(64)]
    merge_into(spark, t, _net(spark, rows), epoch_id=0)
    before = t.snapshot()["files"]
    # touch a single key → only its bucket's file list may change
    r = merge_into(spark, t, _net(spark, [("d0", 100, "U", [99], 1, "web")]), epoch_id=1)
    assert r.n_dirty_buckets == 1
    after = t.snapshot()["files"]
    changed = [b for b in after if after[b] != before.get(b)]
    assert len(changed) == 1


def test_schema_evolution_nulls_for_old_files(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=4)
    merge_into(spark, t, _net(spark, [("a", 1, "I", [1], 1, "web")]), epoch_id=0)
    assert t.add_columns([("lang", "string")])
    assert not t.add_columns([("lang", "string")])  # idempotent
    df = t.read(spark)
    assert "lang" in df.columns
    assert df.filter(F.col("lang").isNull()).count() == 1
    # new writes can populate it
    net = spark.createDataFrame(
        [("b", 2, "I", [2], 1, "web", "en")],
        "doc_id string, seq long, op string, tokens array<int>, n_tok int, source string, lang string",
    )
    merge_into(spark, t, net, epoch_id=1)
    rows = {r.doc_id: r.lang for r in t.read(spark).collect()}
    assert rows == {"a": None, "b": "en"}


def test_commit_conflict_single_winner(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=4)
    snap1 = t.snapshot()
    snap2 = json.loads(json.dumps(snap1))
    snap1["version"] += 1
    snap2["version"] += 1
    t._write_snapshot(snap1)
    with pytest.raises(CommitConflict):
        t._write_snapshot(snap2)


def test_lineage_records_per_bucket(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=4)
    merge_into(
        spark, t,
        _net(spark, [("a", 1, "I", [1], 1, "web"), ("b", 2, "D", None, None, None)]),
        epoch_id=0, stream_id="s1",
    )
    lin = t.lineage_df(spark).collect()
    assert sum(r.n_events for r in lin) == 2
    assert sum(r.n_deletes for r in lin) == 1
    assert all(r.stream_id == "s1" and r.epoch_id == 0 for r in lin)
    offs = t.bucket_offsets_df(spark).collect()
    # physical rows: "a" live + "b"'s delete TOMBSTONE (the seq fence
    # that keeps a reordered stale upsert from resurrecting "b");
    # logically only "a" is visible
    assert sum(r.n_rows for r in offs) == 2
    assert [r.doc_id for r in t.read(spark).collect()] == ["a"]
    # non-empty buckets carry footer stats; fully-deleted buckets are -1
    assert all(r.max_seq >= 1 for r in offs if r.n_rows > 0)
    # the watermark fence advanced each touched bucket by ITS OWN max
    # incoming seq — not the epoch-global max (a per-bucket-monotone
    # source must never be fenced by another bucket's seqs)
    wm = {int(b): int(w) for b, w in t.snapshot()["watermarks"].items()}
    b_a, b_b = (
        spark.range(1)
        .select(
            *[
                F.pmod(F.hash(F.lit(k)), F.lit(4)).cast("int").alias(k)
                for k in ("a", "b")
            ]
        )
        .collect()[0]
    )
    assert wm[b_b] == 2  # the delete's own bucket
    if b_a != b_b:
        assert wm[b_a] == 1  # "a"'s bucket fences at its own seq, not 2
    assert os.path.exists(os.path.join(str(tmp_path / "t"), "_meta", "CURRENT"))


def test_lineage_rolls_to_side_log(spark, tmp_path):
    from binlake_spark.lake.table import LINEAGE_KEEP, LINEAGE_LOG

    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=2)
    n_epochs = LINEAGE_KEEP + 10
    for ep in range(n_epochs):
        merge_into(
            spark, t, _net(spark, [("a", ep + 1, "U", [ep], 1, "web")]), epoch_id=ep
        )
    snap = t.snapshot()
    assert len(snap["lineage"]) <= LINEAGE_KEEP
    assert os.path.exists(os.path.join(t.meta_dir, LINEAGE_LOG))
    led = t.lineage_df(spark)
    assert led.count() == n_epochs
    assert led.agg(F.min("epoch_id"), F.max("epoch_id")).collect()[0] == (
        0,
        n_epochs - 1,
    )
    # offsets survive the roll too
    offs = t.bucket_offsets_df(spark)
    assert offs.filter(F.col("epoch_id") == 0).count() == 1


def test_time_travel_read(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=2)
    merge_into(spark, t, _net(spark, [("a", 1, "I", [1], 1, "web")]), epoch_id=0)
    v1 = t.snapshot()["version"]
    merge_into(spark, t, _net(spark, [("a", 2, "U", [2], 1, "web")]), epoch_id=1)
    assert t.read(spark).collect()[0].tokens == [2]
    assert t.read(spark, version=v1).collect()[0].tokens == [1]
    assert v1 in t.versions()


def test_expire_snapshots(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=2)
    for ep in range(6):
        merge_into(
            spark, t, _net(spark, [("a", ep + 1, "U", [ep], 1, "web")]), epoch_id=ep
        )
    before = t.versions()
    assert len(before) == 7  # v0 create + 6 merges
    stats = t.expire_snapshots(keep_last=2)
    assert stats["snapshots_removed"] == 5
    assert stats["files_removed"] > 0
    # current state intact, history beyond keep_last gone
    assert t.read(spark).collect()[0].tokens == [5]
    assert t.read(spark, version=t.versions()[0]).count() == 1
    with pytest.raises(FileNotFoundError):
        t.snapshot(before[0])


def test_crash_healing_adopts_linked_snapshot(spark, tmp_path):
    """A crash between the snapshot link and the CURRENT flip must not
    lose the commit: the link is the commit point."""
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=2)
    merge_into(spark, t, _net(spark, [("a", 1, "I", [1], 1, "web")]), epoch_id=0)
    cur = t.snapshot()["version"]
    # simulate the crash window: roll CURRENT back one version
    with open(os.path.join(t.meta_dir, "CURRENT"), "w") as f:
        f.write(str(cur - 1))
    assert t.snapshot()["version"] == cur  # healed by adoption
    assert t.read(spark).count() == 1


def test_enforce_watermark_fences_retransmitted_prefix(spark, tmp_path):
    """Optional per-bucket seq fence: with a bucket-monotone source, a
    replayed (stale) prefix is dropped before the join; fresh events pass."""
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=2)
    merge_into(
        spark, t,
        _net(spark, [("a", 10, "I", [1], 1, "web"), ("b", 20, "I", [2], 1, "web")]),
        epoch_id=0,
    )
    wm_before = dict(t.snapshot()["watermarks"])
    # epoch 1 re-sends the old events (stale seqs) plus one fresh event
    batch = _net(
        spark,
        [
            ("a", 10, "I", [9, 9], 2, "web"),   # stale retransmit (altered payload
            ("b", 20, "I", [8, 8], 2, "web"),   #  would be wrong to apply)
            ("c", 30, "I", [3], 1, "web"),      # fresh
        ],
    )
    r = merge_into(spark, t, batch, epoch_id=1, enforce_watermark=True)
    assert r.applied
    rows = {x.doc_id: x.tokens for x in t.read(spark).collect()}
    assert rows == {"a": [1], "b": [2], "c": [3]}
    # no fence retreats: every prior watermark still holds or advanced
    wm_after = t.snapshot()["watermarks"]
    for b, w in wm_before.items():
        assert int(wm_after[b]) >= int(w)


def test_admin_set_epoch_and_reset_watermarks(spark, tmp_path):
    """Control-plane overrides (tower SetBinlogPosHandler analog): rewind
    the epoch guard to force re-apply — state stays exact via per-row
    _seq LWW — and clear watermark fences; both commit as auditable
    'admin' lineage entries."""
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=4)
    net = _net(spark, [("a", 1, "I", [1, 2], 2, "web"), ("b", 2, "I", [3], 1, "web")])
    merge_into(spark, t, net, epoch_id=0)
    merge_into(
        spark, t, _net(spark, [("a", 5, "U", [9], 1, "web")]), epoch_id=1
    )
    # replaying an applied epoch is refused...
    res = merge_into(spark, t, net, epoch_id=0)
    assert res.skipped_reason == "epoch-already-applied"
    # ...until an operator rewinds the guard
    prev = t.set_stream_epoch("default", -1)
    assert prev == 1
    res = merge_into(spark, t, net, epoch_id=0)
    assert res.applied
    rows = {r.doc_id: r for r in t.read(spark, with_seq=True).collect()}
    assert rows["a"]._seq == 5 and list(rows["a"].tokens) == [9]  # LWW held
    assert rows["b"]._seq == 2

    cleared = t.reset_watermarks()
    assert cleared and t.snapshot()["watermarks"] == {}
    kinds = [e.get("op") for e in t._all_lineage() if e.get("kind") == "admin"]
    assert kinds == ["set_stream_epoch", "reset_watermarks"]


def test_lookup_point_read_bucket_pruned(spark, tmp_path):
    """lookup returns exactly the live rows for the requested keys, scans
    only those keys' bucket files, and pushes the key predicate into the
    parquet scan."""
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=16)
    rows = [(f"doc{i:03d}", i + 1, "I", [i], 1, "web") for i in range(200)]
    merge_into(spark, t, _net(spark, rows), epoch_id=0)
    # delete one of the keys we will look up
    merge_into(
        spark, t, _net(spark, [("doc003", 1000, "D", None, None, None)]), epoch_id=1
    )

    keys = ["doc001", "doc003", "doc077", "no-such-key"]
    out = t.lookup(spark, keys)
    got = {r.doc_id: r.tokens for r in out.collect()}
    assert got == {"doc001": [1], "doc077": [77]}  # live keys only

    # bucket pruning: scanned files ⊆ files of the keys' buckets
    snap = t.snapshot()
    from binlake_spark.lake.table import _bucket_expr

    kdf = spark.createDataFrame([(k,) for k in keys], "doc_id string")
    target = {
        r[0] for r in kdf.select(_bucket_expr("doc_id", 16).alias("b")).collect()
    }
    allowed = set()
    for b in target:
        for p in snap["files"].get(str(b), []):
            allowed.add(os.path.join(t.root, p))
    scanned = {f.replace("file://", "").replace("file:", "") for f in out.inputFiles()}
    assert scanned and scanned <= allowed
    assert len(target) < 16  # the prune is real, not all-buckets

    # predicate pushdown: the In filter reaches the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan.split("PushedFilters", 1)[1][:200]


def test_lookup_resolves_mor_deltas(spark, tmp_path):
    from binlake_spark.lake import merge_into_mor

    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=8)
    merge_into(
        spark, t, _net(spark, [("a", 1, "I", [1], 1, "web"), ("b", 2, "I", [2], 1, "web")]),
        epoch_id=0,
    )
    merge_into_mor(
        spark, t, _net(spark, [("a", 3, "U", [7, 8], 2, "web")]), epoch_id=1
    )
    out = {r.doc_id: r.tokens for r in t.lookup(spark, ["a"]).collect()}
    assert out == {"a": [7, 8]}  # delta wins LWW through the lookup path


def test_tags_pin_snapshots_and_block_expiry(spark, tmp_path):
    """Iceberg snapshot-tag analog: a named ref reads the pinned version
    through every read path, survives expire_snapshots, and refuses to
    move silently."""
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=4)
    merge_into(spark, t, _net(spark, [("a", 1, "I", [1], 1, "web")]), epoch_id=0)
    t.tag("baseline")
    v_tag = t.tags()["baseline"]

    for i in range(1, 5):
        merge_into(
            spark, t, _net(spark, [("a", i + 1, "U", [i] * i, i, "web")]), epoch_id=i
        )

    # tag reads resolve to the pinned version via read()/snapshot()
    assert [r.tokens for r in t.read(spark, version="baseline").collect()] == [[1]]
    assert int(t.snapshot("baseline")["version"]) == v_tag

    # expiry keeps the tagged snapshot alive while dropping untagged ones
    res = t.expire_snapshots(keep_last=1)
    assert res["snapshots_removed"] > 0
    assert [r.tokens for r in t.read(spark, version="baseline").collect()] == [[1]]

    # moving a tag requires replace=True; dropping unpins it
    with pytest.raises(FileExistsError):
        t.tag("baseline")
    t.tag("baseline", replace=True)  # now at CURRENT
    assert t.tags()["baseline"] == int(t.snapshot()["version"])
    t.drop_tag("baseline")
    with pytest.raises(FileNotFoundError):
        t.snapshot("baseline")


def test_tag_rejects_unsafe_names(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), SCHEMA, "doc_id", num_buckets=4)
    for bad in ["", ".hidden", "a/b", "rel.tmp.1", "-x"]:
        with pytest.raises(ValueError):
            t.tag(bad)


def test_rollback_restores_state_and_reingest_is_exact(spark, tmp_path):
    """rollback(tag): the new CURRENT carries the target's exact data +
    fences (auditable commit, files shared); the change feed across the
    rollback emits the undo diff; re-applying the suffix log converges to
    the identical original final state; expiry keeps the rolled-back
    state readable."""
    from binlake_spark.changelog import GenSpec, generate_change_log, write_change_log
    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
    from binlake_spark.streaming import CdcEngine

    pdf = generate_change_log(
        GenSpec(n_docs=60, n_events=1200, events_per_epoch=300, retransmit_frac=0.1)
    )
    write_change_log(pdf, str(tmp_path / "log"))
    log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(str(tmp_path / "log"))
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)

    def state():
        return {
            r.doc_id: (tuple(r.tokens or ()), r.n_tok, r.source)
            for r in table.read(spark).collect()
        }

    epochs = sorted(int(e) for e in pdf["epoch_hint"].unique())
    engine.apply_batch(log.filter(F.col("epoch_hint") == epochs[0]), epoch_id=0)
    table.tag("good")
    good_state = state()
    good_wms = dict(table.snapshot()["watermarks"])
    for i, ep in enumerate(epochs[1:], start=1):
        engine.apply_batch(log.filter(F.col("epoch_hint") == ep), epoch_id=i)
    final_state = state()
    assert final_state != good_state
    pre_rollback = int(table.snapshot()["version"])

    new_v = table.rollback("good")
    assert new_v == pre_rollback + 1
    assert state() == good_state
    snap = table.snapshot()
    assert dict(snap["watermarks"]) == good_wms
    assert snap["lineage"][-1]["op"] == "rollback"

    # the feed across the rollback is the undo diff: every emitted row's
    # to-side equals the good state (I/U) or is a delete of a doc the
    # rollback removed
    undo = table.read_changes(spark, from_version=pre_rollback).collect()
    assert undo
    for r in undo:
        if r._change_op == "D":
            assert r.doc_id not in good_state
        else:
            assert good_state[r.doc_id] == (tuple(r.tokens or ()), r.n_tok, r.source)

    # re-ingest the suffix: epoch fences are back at the target's values,
    # so the replay applies and converges to the original final state
    for i, ep in enumerate(epochs[1:], start=1):
        res = engine.apply_batch(log.filter(F.col("epoch_hint") == ep), epoch_id=i)
        assert res.applied
    assert state() == final_state

    # expiry after a fresh rollback keeps the rolled-back files readable
    table.rollback("good")
    table.expire_snapshots(keep_last=1)
    assert state() == good_state
