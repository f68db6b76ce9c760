"""Change data feed: `LakeTable.read_changes` between snapshot versions.

The read-side completion of the reference's produce path (a downstream
consumer re-derives row-level changes from committed versions instead of
tailing the binlog): diff two snapshots into I/U/D rows, pruned at the
manifest level to buckets whose file lists moved.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from binlake_spark.changelog import GenSpec, generate_change_log, write_change_log
from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
from binlake_spark.streaming import CdcEngine


def _expected_diff(pdf: pd.DataFrame, cut: int) -> dict[str, tuple[str, int]]:
    """Independent pandas diff: doc_id -> (change_op, winner_seq)."""

    def state(df):
        df = df[df["op"].isin(["I", "U", "D"])]
        df = df[df["tokens"].map(len).to_numpy() == df["n_tok"].to_numpy()]
        df = df.sort_values("seq", kind="stable").drop_duplicates(
            subset=["doc_id", "seq"], keep="first"
        )
        last = df.groupby("doc_id", sort=True).tail(1)
        live = last[last["op"] != "D"]
        return dict(zip(live["doc_id"], live["seq"]))

    a, b = state(pdf[pdf["seq"] <= cut]), state(pdf)
    out = {}
    for k, seq in b.items():
        if k not in a:
            out[k] = ("I", int(seq))
        elif a[k] != seq:
            out[k] = ("U", int(seq))
    for k, seq in a.items():
        if k not in b:
            out[k] = ("D", int(seq))
    return out


def _log_df(spark, tmp_path, pdf, name="log"):
    src = str(tmp_path / name)
    write_change_log(pdf, src)
    return spark.read.schema(CHANGE_LOG_SCHEMA).parquet(src)


def _replay_split(spark, tmp_path, pdf, cut, mor=False):
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table, mode="mor" if mor else "cow")
    engine.apply_batch(df.filter(F.col("seq") <= cut), epoch_id=0)
    v_a = int(table.snapshot()["version"])
    engine.apply_batch(df.filter(F.col("seq") > cut), epoch_id=1)
    return table, v_a


@pytest.mark.parametrize("mor", [False, True], ids=["cow", "mor"])
def test_change_feed_matches_pandas_diff(spark, tmp_path, mor):
    pdf = generate_change_log(
        GenSpec(n_docs=40, n_events=900, retransmit_frac=0.15, hot_keys=2, hot_frac=0.3)
    )
    cut = int(pdf["seq"].quantile(0.5))
    table, v_a = _replay_split(spark, tmp_path, pdf, cut, mor=mor)

    got = {
        r["doc_id"]: (r["_change_op"], int(r["_seq"]))
        for r in table.read_changes(spark, from_version=v_a).collect()
    }
    assert got == _expected_diff(pdf, cut)


def test_change_feed_values_and_unchanged_keys(spark, tmp_path):
    pdf = generate_change_log(GenSpec(n_docs=30, n_events=600))
    cut = int(pdf["seq"].quantile(0.5))
    table, v_a = _replay_split(spark, tmp_path, pdf, cut)

    rows = table.read_changes(spark, from_version=v_a).collect()
    valid = pdf[pdf["op"].isin(["I", "U", "D"])]
    by_seq = valid.set_index("seq", drop=False)
    for r in rows:
        ev = by_seq.loc[int(r["_seq"])]
        if isinstance(ev, pd.DataFrame):  # retransmit duplicates share seq
            ev = ev.iloc[0]
        assert ev["doc_id"] == r["doc_id"]
        if r["_change_op"] in ("I", "U"):
            # values are the to-side winner's row image
            assert np.array_equal(
                np.asarray(r["tokens"], dtype=np.int32),
                np.asarray(ev["tokens"], dtype=np.int32),
            )
            assert r["n_tok"] == int(ev["n_tok"])
        else:
            # D rows carry the from-side (pre-delete) image: the winner at
            # the cut, which is by definition an I/U event
            assert ev["op"] != "D" or r["tokens"] is not None

    # a key untouched by the suffix must not be emitted
    emitted = {r["doc_id"] for r in rows}
    suffix_keys = set(pdf[pdf["seq"] > cut]["doc_id"])
    assert emitted <= suffix_keys


def test_change_feed_bucket_pruning(spark, tmp_path):
    """Suffix touching a single key must scan only that key's bucket."""
    pdf = generate_change_log(GenSpec(n_docs=40, n_events=800))
    # suffix = events of exactly one doc; apply all other events first
    one = pdf["doc_id"].iloc[0]
    prefix = pdf[pdf["doc_id"] != one]
    suffix = pdf[pdf["doc_id"] == one]

    df_p = _log_df(spark, tmp_path, prefix, "log_p")
    df_s = _log_df(spark, tmp_path, suffix, "log_s")
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    engine.apply_batch(df_p, epoch_id=0)
    v_a = int(table.snapshot()["version"])
    engine.apply_batch(df_s, epoch_id=1)

    changed = table.changed_buckets(v_a)
    assert len(changed) == 1  # manifest-level pruning: one dirty bucket

    feed = table.read_changes(spark, from_version=v_a)
    assert {r["doc_id"] for r in feed.collect()} <= {one}


def test_change_feed_across_schema_evolution(spark, tmp_path):
    """from-version predates the additive column: old side surfaces NULL,
    I/U rows carry the evolved column."""
    pdf = generate_change_log(GenSpec(n_docs=30, n_events=800, evolution_at=400))
    cut = int(pdf["seq"].iloc[390])  # cut before the evolution point
    table, v_a = _replay_split(spark, tmp_path, pdf, cut)

    feed = table.read_changes(spark, from_version=v_a)
    assert "lang" in feed.columns
    got = {r["doc_id"]: r for r in feed.collect()}
    assert got  # evolution scenario always changes rows after the cut
    for r in got.values():
        if r["_change_op"] == "D":
            assert r["lang"] is None  # pre-evolution image


def test_change_feed_empty_and_identity(spark, tmp_path):
    pdf = generate_change_log(GenSpec(n_docs=20, n_events=300))
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    CdcEngine(table).apply_batch(df, epoch_id=0)
    v = int(table.snapshot()["version"])
    assert table.changed_buckets(v, v) == []
    assert table.read_changes(spark, from_version=v, to_version=v).count() == 0


# --------------------------------------------------------------------- #
# ChangeFeedReader — checkpointed at-least-once consumption
# --------------------------------------------------------------------- #
def test_feed_reader_end_to_end(spark, tmp_path):
    from binlake_spark.lake import ChangeFeedReader

    pdf = generate_change_log(
        GenSpec(n_docs=40, n_events=800, retransmit_frac=0.1)
    )
    cut = int(pdf["seq"].quantile(0.5))
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    engine.apply_batch(df.filter(F.col("seq") <= cut), epoch_id=0)

    reader = ChangeFeedReader(table, consumer_id="c1")
    # initial snapshot: whole current table as 'I' rows
    out, cur = reader.poll(spark)
    rows = out.collect()
    assert {r["_change_op"] for r in rows} == {"I"}
    live_at_cut = {
        k for k, (op, _) in _expected_diff(pdf[pdf["seq"] <= cut], -1).items()
        if op == "I"
    }
    assert {r["doc_id"] for r in rows} == live_at_cut

    # nothing acked by polling: a crashed consumer re-polls the same window
    out2, cur2 = reader.poll(spark)
    assert cur2 == cur and out2.count() == len(rows)

    reader.commit(cur)
    assert reader.poll(spark) is None  # caught up: zero Spark jobs

    engine.apply_batch(df.filter(F.col("seq") > cut), epoch_id=1)
    out, cur = reader.poll(spark)
    got = {r["doc_id"]: (r["_change_op"], int(r["_seq"])) for r in out.collect()}
    assert got == _expected_diff(pdf, cut)
    reader.commit(cur)
    assert reader.poll(spark) is None
    with pytest.raises(ValueError, match="behind"):
        reader.commit(cur - 1)

    # a second consumer has its own independent position
    other = ChangeFeedReader(table, consumer_id="c2")
    out, _ = other.poll(spark)
    assert {r["_change_op"] for r in out.collect()} == {"I"}


def test_feed_reader_initial_current(spark, tmp_path):
    from binlake_spark.lake import ChangeFeedReader

    pdf = generate_change_log(GenSpec(n_docs=25, n_events=500))
    cut = int(pdf["seq"].quantile(0.5))
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    engine.apply_batch(df.filter(F.col("seq") <= cut), epoch_id=0)

    reader = ChangeFeedReader(table, consumer_id="tail", initial="current")
    assert reader.poll(spark) is None  # skips history
    assert reader.position() == int(table.snapshot()["version"])

    engine.apply_batch(df.filter(F.col("seq") > cut), epoch_id=1)
    out, cur = reader.poll(spark)
    got = {r["doc_id"]: (r["_change_op"], int(r["_seq"])) for r in out.collect()}
    assert got == _expected_diff(pdf, cut)


def test_feed_reader_behind_retention(spark, tmp_path):
    from binlake_spark.lake import ChangeFeedReader, FeedBehindRetention

    pdf = generate_change_log(GenSpec(n_docs=25, n_events=600))
    thirds = pdf["seq"].quantile([0.33, 0.66]).astype(int).tolist()
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table, expire_every=None)
    engine.apply_batch(df.filter(F.col("seq") <= thirds[0]), epoch_id=0)

    reader = ChangeFeedReader(table, consumer_id="slow", initial="current")
    reader.poll(spark)  # commits at current

    engine.apply_batch(
        df.filter((F.col("seq") > thirds[0]) & (F.col("seq") <= thirds[1])),
        epoch_id=1,
    )
    engine.apply_batch(df.filter(F.col("seq") > thirds[1]), epoch_id=2)
    table.expire_snapshots(keep_last=1)  # reclaims the reader's base

    with pytest.raises(FeedBehindRetention, match="re-bootstrap"):
        reader.poll(spark)

    reader.reset()
    reader2 = ChangeFeedReader(table, consumer_id="slow")  # snapshot mode
    out, cur = reader2.poll(spark)
    final_live = {
        k for k, (op, _) in _expected_diff(pdf, -1).items() if op == "I"
    }
    assert {r["doc_id"] for r in out.collect()} == final_live


def test_feed_reader_materializes_exact_state_under_redelivery(spark, tmp_path):
    """A consumer applying polled windows as idempotent upserts — with
    deliberate crash/redelivery (poll without commit, then poll again) —
    must converge to the exact source-table state: at-least-once delivery
    of a *net keyed diff* composes to exactly-once materialization."""
    from binlake_spark.lake import ChangeFeedReader

    pdf = generate_change_log(
        GenSpec(n_docs=50, n_events=1200, events_per_epoch=300,
                retransmit_frac=0.1, evolution_at=600)
    )
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    reader = ChangeFeedReader(table, consumer_id="mat")

    materialized: dict[str, tuple] = {}

    def apply_window(out):
        for r in out.collect():
            if r["_change_op"] == "D":
                materialized.pop(r["doc_id"], None)
            else:
                materialized[r["doc_id"]] = (
                    tuple(r["tokens"]), r["n_tok"], r["source"], int(r["_seq"])
                )

    epochs = sorted(pdf["epoch_hint"].unique())
    for i, ep in enumerate(epochs):
        engine.apply_batch(df.filter(F.col("epoch_hint") == int(ep)), epoch_id=i)
        polled = reader.poll(spark)
        assert polled is not None
        out, cur = polled
        apply_window(out)
        if i % 2 == 0:
            # crash before commit: the window redelivers; applying it twice
            # must be a no-op (keyed net diff)
            out2, cur2 = reader.poll(spark)
            assert cur2 == cur
            apply_window(out2)
        reader.commit(cur)

    src = {
        r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["source"], int(r["_seq"]))
        for r in table.read(spark, with_seq=True).collect()
    }
    assert materialized == src


def test_change_feed_lifecycle_edges(spark, tmp_path):
    """Hand-built event sequences crossing the cut:
    - key created after the cut then deleted before `to`  -> not emitted
    - key deleted before the cut, reinserted after        -> I
    - key alive at cut, deleted and reinserted in suffix  -> U (net)
    - key whose suffix events all lose LWW to the prefix  -> not emitted
    """
    import numpy as np
    import pandas as pd

    def ev(seq, op, doc, toks):
        t = np.asarray(toks, dtype=np.int32)
        return {
            "seq": seq, "server_uuid": "s0", "gno": seq, "trx_id": seq,
            "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=seq),
            "op": op, "doc_id": doc, "tokens": t, "n_tok": len(t),
            "source": "web", "payload": t.astype("<i4").tobytes(),
            "before_payload": None, "schema_ver": 0,
            "extra": [], "epoch_hint": 0 if seq <= 100 else 1,
        }

    events = [
        # ephemeral: born and dies inside the suffix
        ev(10, "I", "stay", [1, 2]), ev(110, "I", "eph", [3]), ev(120, "D", "eph", [3]),
        # deleted pre-cut, reborn post-cut -> I
        ev(20, "I", "reborn", [4]), ev(30, "D", "reborn", [4]), ev(130, "I", "reborn", [5, 6]),
        # alive at cut, delete+reinsert in suffix -> net U with new image
        ev(40, "I", "churn", [7]), ev(140, "D", "churn", [7]), ev(150, "I", "churn", [8, 9]),
        # suffix arrivals that LOSE LWW (retransmit of an old seq) -> no change
        ev(50, "U", "stale", [10, 11]), ev(50, "U", "stale", [10, 11]),
    ]
    # deliver the second retransmit LATE (epoch 1) with its original seq:
    # it must lose LWW against the already-applied winner and not be a change
    events[-1]["epoch_hint"] = 1
    pdf = pd.DataFrame(events)

    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    engine.apply_batch(df.filter(F.col("epoch_hint") == 0), epoch_id=0)
    v_a = int(table.snapshot()["version"])
    engine.apply_batch(df.filter(F.col("epoch_hint") == 1), epoch_id=1)

    got = {
        r["doc_id"]: (r["_change_op"], int(r["_seq"]), tuple(r["tokens"]))
        for r in table.read_changes(spark, from_version=v_a).collect()
    }
    assert got == {
        "reborn": ("I", 130, (5, 6)),
        "churn": ("U", 150, (8, 9)),
    }


def test_feed_replication_lake_to_lake(spark, tmp_path):
    """apply_to replicates A -> B across epochs (incl. schema evolution),
    and a crash between B's merge commit and the position commit re-merges
    the same window idempotently — B converges to A exactly."""
    from binlake_spark.lake import ChangeFeedReader, LakeTable, merge_into

    pdf = generate_change_log(
        GenSpec(n_docs=40, n_events=1000, events_per_epoch=250,
                retransmit_frac=0.1, evolution_at=500)
    )
    df = _log_df(spark, tmp_path, pdf)
    src_table = CdcEngine.create_table(str(tmp_path / "src"), num_buckets=8)
    engine = CdcEngine(src_table)
    dst = LakeTable.create(
        str(tmp_path / "dst"),
        schema=src_table.schema(),
        key_col="doc_id",
        num_buckets=4,  # destination layout is independent of the source's
    )
    reader = ChangeFeedReader(src_table, consumer_id="repl")

    def state(t):
        return {
            r["doc_id"]: (tuple(r["tokens"]), r["n_tok"], r["source"], int(r["_seq"]))
            for r in t.read(spark, with_seq=True).collect()
        }

    epochs = sorted(pdf["epoch_hint"].unique())
    for i, ep in enumerate(epochs):
        engine.apply_batch(df.filter(F.col("epoch_hint") == int(ep)), epoch_id=i)
        if i == 1:
            # crash path: merge the window into dst but die before the
            # position commit — the next apply_to redelivers and re-merges
            out, _cur = reader.poll_for_merge(spark)
            merge_into(
                spark, dst, out,
                epoch_id=dst.last_epoch("feed:repl") + 1, stream_id="feed:repl",
                seq_col="_seq", op_col="_change_op",
            )
        res = reader.apply_to(spark, dst)
        assert res is not None and res.applied
        assert state(dst) == state(src_table)  # in lockstep every epoch

    assert reader.apply_to(spark, dst) is None  # caught up
    # evolution propagated additively
    assert {f.name for f in dst.schema().fields} == {
        f.name for f in src_table.schema().fields
    }


def test_feed_replication_survives_seq_regression(spark, tmp_path):
    """A key whose winning seq REGRESSES at the source must still
    replicate: poll_for_merge re-stamps the regressed-U at the window
    watermark so strict LWW at the destination cannot drop it.

    Constructing the regression now takes one more step than it used
    to: a delete leaves a TOMBSTONE, so a fresh lower-seq insert loses
    LWW against it (uniform with how a live row at seq 150 would fence
    it — the pre-tombstone admit was an inconsistency of vanished
    rows, fixed with the reordering bug).  After the operator PURGES
    tombstones at/below the delete's seq, the lower-seq insert is
    admissible again and the winning image regresses — the feed path
    this test pins."""
    from binlake_spark.lake import (
        ChangeFeedReader,
        LakeTable,
        merge_into,
        purge_tombstones,
    )

    from binlake_spark.streaming.engine import DOCS_SCHEMA

    src = LakeTable.create(str(tmp_path / "src"), schema=DOCS_SCHEMA,
                           key_col="doc_id", num_buckets=4)
    dst = LakeTable.create(str(tmp_path / "dst"), schema=DOCS_SCHEMA,
                           key_col="doc_id", num_buckets=4)
    reader = ChangeFeedReader(src, consumer_id="regr")

    def net(rows):
        return spark.createDataFrame(
            rows,
            "doc_id string, seq long, op string, tokens array<int>, n_tok int, "
            "source string",
        )

    merge_into(spark, src, net([("a", 100, "I", [1, 2], 2, "web")]), epoch_id=0)
    assert reader.apply_to(spark, dst).applied

    # source: delete at 150; purge its tombstone (operator-bounded
    # horizon); then a FRESH lower-seq insert at 60 is admissible again
    # (the retransmit fence is opt-in) — the key's winning seq regresses
    merge_into(spark, src, net([("a", 150, "D", None, None, None)]), epoch_id=1)
    purge_tombstones(spark, src, horizon_seq=150)
    merge_into(spark, src, net([("a", 60, "I", [9], 1, "books")]), epoch_id=2)

    assert reader.apply_to(spark, dst).applied
    got = {r.doc_id: (r.tokens, r.source) for r in dst.read(spark).collect()}
    assert got == {"a": ([9], "books")}  # the regressed image replicated


def test_feed_sees_no_changes_across_purge(spark, tmp_path):
    """Tombstone maintenance is invisible to consumers: a purge commit
    rewrites bucket files (so changed_buckets flags them — an allowed
    false positive), but the row-level diff across it must be EMPTY and
    a feed consumer polling over it must see nothing to apply."""
    from pyspark.sql import functions as F

    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
    from binlake_spark.lake import ChangeFeedReader, purge_tombstones
    from binlake_spark.changelog import GenSpec, generate_change_log, write_change_log
    from binlake_spark.streaming import CdcEngine

    pdf = generate_change_log(GenSpec(n_docs=30, n_events=900))
    src_dir = str(tmp_path / "log")
    write_change_log(pdf, src_dir)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    engine.run_batch_replay(spark, src_dir)
    v_before = int(table.snapshot()["version"])
    assert (
        table.read(spark, with_seq=True, with_tombstones=True)
        .filter(F.col("_tombstone")).count() > 0
    )

    out = purge_tombstones(spark, table, horizon_seq=int(pdf["seq"].max()))
    assert out["purged_buckets"] > 0
    v_after = int(table.snapshot()["version"])

    # manifest-level: the purged buckets ARE flagged (rewrite = new files)
    assert table.changed_buckets(v_before, v_after)
    # row-level: the diff across the purge commit is empty
    assert table.read_changes(spark, v_before, v_after).count() == 0
    # consumer-level: a reader caught up to v_before has nothing to apply
    dst = CdcEngine.create_table(str(tmp_path / "dst"), num_buckets=4)
    reader = ChangeFeedReader(table, consumer_id="purge-watch")
    assert reader.apply_to(spark, dst) is not None  # catches up the data
    assert reader.apply_to(spark, dst) is None      # ...then sees nothing
