"""Incremental view maintenance over the change feed: the rollup must
track a from-scratch recompute exactly across epochs (inserts, updates
with changed sums, deletes, group moves), survive crash-before-publish,
and never rescan the base table on refresh."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from binlake_spark.changelog.generator import (
    CHANGE_LOG_SCHEMA,
    GenSpec,
    generate_change_log,
    write_change_log,
)
from binlake_spark.lake import FeedAggregate
from binlake_spark.streaming import CdcEngine


def _log_df(spark, tmp_path, pdf, sub="log"):
    write_change_log(pdf, str(tmp_path / sub))
    return spark.read.schema(CHANGE_LOG_SCHEMA).parquet(str(tmp_path / sub))


def _recompute(spark, table):
    return {
        tuple(r)
        for r in table.read(spark)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("sum_n_tok"),
        )
        .collect()
    }


def test_ivm_tracks_recompute_across_epochs(spark, tmp_path):
    pdf = generate_change_log(
        GenSpec(n_docs=60, n_events=1500, events_per_epoch=300,
                retransmit_frac=0.1, evolution_at=750)
    )
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    agg = FeedAggregate(
        table, str(tmp_path / "ivm"), ["source"], {"sum_n_tok": "n_tok"}
    )

    epochs = sorted(pdf["epoch_hint"].unique())
    for i, ep in enumerate(epochs):
        engine.apply_batch(df.filter(F.col("epoch_hint") == int(ep)), epoch_id=i)
        assert agg.refresh(spark) is True
        got = {tuple(r) for r in agg.read(spark).collect()}
        assert got == _recompute(spark, table), f"diverged at epoch {i}"

    assert agg.refresh(spark) is False  # caught up


def test_ivm_group_moves_and_deletes(spark, tmp_path):
    """Hand-built sequence: an update that MOVES a row between groups
    must adjust both groups; deleting a group's last row drops it."""

    def ev(seq, op, doc, toks, source):
        t = np.asarray(toks, dtype=np.int32)
        return {
            "seq": seq, "server_uuid": "s0", "gno": seq, "trx_id": seq,
            "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=seq),
            "op": op, "doc_id": doc, "tokens": t, "n_tok": len(t),
            "source": source, "payload": t.astype("<i4").tobytes(),
            "before_payload": None, "schema_ver": 0,
            "extra": [], "epoch_hint": 0 if seq <= 100 else 1,
        }

    events = [
        ev(10, "I", "a", [1, 2], "web"),
        ev(20, "I", "b", [3], "web"),
        ev(30, "I", "c", [4, 5, 6], "books"),
        # epoch 1: move `a` web -> books with a new size; delete `c`
        # (books' last original row); touch `b` in place
        ev(110, "U", "a", [7, 7, 7, 7], "books"),
        ev(120, "D", "c", [4, 5, 6], "books"),
        ev(130, "U", "b", [8, 9], "web"),
    ]
    pdf = pd.DataFrame(events)
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    agg = FeedAggregate(
        table, str(tmp_path / "ivm"), ["source"], {"sum_n_tok": "n_tok"}
    )

    engine.apply_batch(df.filter(F.col("epoch_hint") == 0), epoch_id=0)
    agg.refresh(spark)
    assert {tuple(r) for r in agg.read(spark).collect()} == {
        ("web", 2, 3), ("books", 1, 3),
    }

    engine.apply_batch(df.filter(F.col("epoch_hint") == 1), epoch_id=1)
    agg.refresh(spark)
    # web: only b (2 tok); books: only a (4 tok) — c's delete removed the
    # last original books row, a's move re-populated the group
    assert {tuple(r) for r in agg.read(spark).collect()} == {
        ("web", 1, 2), ("books", 1, 4),
    }


def test_ivm_crash_before_publish_is_idempotent(spark, tmp_path):
    pdf = generate_change_log(
        GenSpec(n_docs=30, n_events=600, events_per_epoch=300, retransmit_frac=0.1)
    )
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    agg = FeedAggregate(
        table, str(tmp_path / "ivm"), ["source"], {"sum_n_tok": "n_tok"}
    )
    engine.apply_batch(df.filter(F.col("epoch_hint") == 0), epoch_id=0)
    agg.refresh(spark)

    engine.apply_batch(df.filter(F.col("epoch_hint") == 1), epoch_id=1)
    # simulate a crash: state parquet written but marker never published —
    # emulate by pre-creating the next state dir with garbage
    import os
    nxt = os.path.join(str(tmp_path / "ivm"), "state.v1")
    os.makedirs(nxt, exist_ok=True)
    with open(os.path.join(nxt, "junk"), "w") as f:
        f.write("partial write from a dead run")

    assert agg.refresh(spark) is True  # rebuilds v1 from scratch
    assert {tuple(r) for r in agg.read(spark).collect()} == _recompute(spark, table)


def test_ivm_refresh_does_not_rescan_base_table(spark, tmp_path):
    """The refresh plan must read only the changed buckets' files (via
    the feed) and the old state — never the full base table."""
    import os

    pdf = generate_change_log(GenSpec(n_docs=60, n_events=1200))
    one = pdf["doc_id"].iloc[0]
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    engine.apply_batch(
        _log_df(spark, tmp_path, pdf[pdf["doc_id"] != one], "log_p"), epoch_id=0
    )
    agg = FeedAggregate(
        table, str(tmp_path / "ivm"), ["source"], {"sum_n_tok": "n_tok"}
    )
    agg.refresh(spark)
    v_a = int(table.snapshot()["version"])
    engine.apply_batch(
        _log_df(spark, tmp_path, pdf[pdf["doc_id"] == one], "log_s"), epoch_id=1
    )

    changed = table.changed_buckets(v_a)
    assert len(changed) == 1
    allowed = set()
    for v in (v_a, int(table.snapshot()["version"])):
        snap = table.snapshot(v)
        b = str(changed[0])
        for p in snap["files"].get(b, []) + (snap.get("deltas") or {}).get(b, []):
            allowed.add(os.path.join(table.root, p))
    # old state files are legitimate inputs too
    st = agg.read(spark)
    allowed |= {f.replace("file://", "").replace("file:", "") for f in st.inputFiles()}

    changes = table.read_changes(spark, from_version=v_a, with_preimage=True)
    window = agg._aggregate(agg._deltas(changes))
    merged = st.unionByName(window).groupBy("source").agg(
        F.sum("n_rows").alias("n_rows"), F.sum("sum_n_tok").alias("sum_n_tok")
    )
    scanned = {f.replace("file://", "").replace("file:", "") for f in merged.inputFiles()}
    assert scanned and scanned <= allowed


def test_ivm_per_key_rollup_groups_on_merge_key(spark, tmp_path):
    """group_cols may include the merge key itself (per-doc rollup): the
    key is top-level on both feed sides, so incremental refresh must not
    reach into _pre for it."""
    pdf = generate_change_log(
        GenSpec(n_docs=20, n_events=400, events_per_epoch=200, retransmit_frac=0.1)
    )
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    agg = FeedAggregate(
        table, str(tmp_path / "ivm"), ["doc_id"], {"sum_n_tok": "n_tok"}
    )
    for i, ep in enumerate(sorted(pdf["epoch_hint"].unique())):
        engine.apply_batch(df.filter(F.col("epoch_hint") == int(ep)), epoch_id=i)
        agg.refresh(spark)
    got = {(r["doc_id"], r["n_rows"], r["sum_n_tok"]) for r in agg.read(spark).collect()}
    want = {
        (r["doc_id"], 1, r["n_tok"])
        for r in table.read(spark).collect()
    }
    assert got == want


def test_ivm_behind_retention_raises_and_reset_recovers(spark, tmp_path):
    from binlake_spark.lake import FeedBehindRetention

    pdf = generate_change_log(
        GenSpec(n_docs=20, n_events=600, events_per_epoch=200)
    )
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    agg = FeedAggregate(
        table, str(tmp_path / "ivm"), ["source"], {"sum_n_tok": "n_tok"}
    )
    engine.apply_batch(df.filter(F.col("epoch_hint") == 0), epoch_id=0)
    agg.refresh(spark)
    for i, ep in enumerate(sorted(pdf["epoch_hint"].unique())[1:], start=1):
        engine.apply_batch(df.filter(F.col("epoch_hint") == int(ep)), epoch_id=i)
    table.expire_snapshots(keep_last=1)  # reclaims the rollup's base

    import pytest

    with pytest.raises(FeedBehindRetention):
        agg.refresh(spark)
    agg.reset()
    assert agg.refresh(spark) is True  # re-bootstraps from the full table
    assert {tuple(r) for r in agg.read(spark).collect()} == _recompute(spark, table)


def test_ivm_rejects_colliding_sum_names(spark, tmp_path):
    import pytest

    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    with pytest.raises(ValueError, match="collide"):
        FeedAggregate(table, str(tmp_path / "a"), ["source"], {"n_rows": "n_tok"})
    with pytest.raises(ValueError, match="collide"):
        FeedAggregate(table, str(tmp_path / "b"), ["source"], {"source": "n_tok"})


# ----------------------- token-vocabulary IVM -------------------------- #
def _vocab_recompute(spark, table):
    return {
        tuple(r)
        for r in table.read(spark)
        .select("doc_id", F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occ"),
        )
        .collect()
    }


def test_token_vocab_tracks_recompute_across_epochs(spark, tmp_path):
    from binlake_spark.lake import TokenVocabAggregate

    pdf = generate_change_log(
        GenSpec(n_docs=40, n_events=1000, events_per_epoch=250,
                retransmit_frac=0.1, evolution_at=500)
    )
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    agg = TokenVocabAggregate(table, str(tmp_path / "vocab"))

    for i, ep in enumerate(sorted(pdf["epoch_hint"].unique())):
        engine.apply_batch(df.filter(F.col("epoch_hint") == int(ep)), epoch_id=i)
        assert agg.refresh(spark) is True
        got = {tuple(r) for r in agg.vocab(spark).collect()}
        assert got == _vocab_recompute(spark, table), f"diverged at epoch {i}"
    assert agg.refresh(spark) is False


def test_token_vocab_hand_built_deltas(spark, tmp_path):
    """Hand-built sequence exercising every delta path: repeated tokens
    within a doc, an update that keeps/drops/adds tokens and changes a
    kept token's occurrence count, a delete that removes a token's last
    doc (the token must drop out of the state entirely)."""
    import numpy as np
    import pandas as pd

    from binlake_spark.lake import TokenVocabAggregate

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
        ev(10, "I", "a", [1, 1, 2]),       # tok 1 twice in one doc
        ev(20, "I", "b", [2, 3]),
        ev(30, "I", "c", [4]),
        # epoch 1: a keeps 1 (now once), drops 2, adds 5; c deleted
        # (tok 4's only doc); b untouched
        ev(110, "U", "a", [1, 5, 5]),
        ev(120, "D", "c", [4]),
    ]
    df = _log_df(spark, tmp_path, pd.DataFrame(events))
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
    engine = CdcEngine(table)
    agg = TokenVocabAggregate(table, str(tmp_path / "vocab"))

    engine.apply_batch(df.filter(F.col("epoch_hint") == 0), epoch_id=0)
    agg.refresh(spark)
    assert {tuple(r) for r in agg.vocab(spark).collect()} == {
        (1, 1, 2), (2, 2, 2), (3, 1, 1), (4, 1, 1),
    }

    engine.apply_batch(df.filter(F.col("epoch_hint") == 1), epoch_id=1)
    agg.refresh(spark)
    assert {tuple(r) for r in agg.vocab(spark).collect()} == {
        (1, 1, 1), (2, 1, 1), (3, 1, 1), (5, 1, 2),
    }


def test_token_vocab_refresh_does_not_rescan_base_table(spark, tmp_path):
    """The vocab window plan must read only the changed buckets' files
    (via the feed) and the old state — never the full base table."""
    import os

    from binlake_spark.lake import TokenVocabAggregate

    pdf = generate_change_log(GenSpec(n_docs=60, n_events=1200))
    one = pdf["doc_id"].iloc[0]
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    engine.apply_batch(
        _log_df(spark, tmp_path, pdf[pdf["doc_id"] != one], "log_p"), epoch_id=0
    )
    agg = TokenVocabAggregate(table, str(tmp_path / "vocab"))
    agg.refresh(spark)
    v_a = int(table.snapshot()["version"])
    engine.apply_batch(
        _log_df(spark, tmp_path, pdf[pdf["doc_id"] == one], "log_s"), epoch_id=1
    )

    changed = table.changed_buckets(v_a)
    assert len(changed) == 1
    allowed = set()
    for v in (v_a, int(table.snapshot()["version"])):
        snap = table.snapshot(v)
        b = str(changed[0])
        for p in snap["files"].get(b, []) + (snap.get("deltas") or {}).get(b, []):
            allowed.add(os.path.join(table.root, p))
    st = agg.read(spark)
    allowed |= {f.replace("file://", "").replace("file:", "") for f in st.inputFiles()}

    changes = table.read_changes(spark, from_version=v_a, with_preimage=True)
    window = agg._aggregate(agg._deltas(changes))
    merged = st.unionByName(window).groupBy("tok").agg(
        F.sum("n_rows").alias("n_rows"), F.sum("n_occ").alias("n_occ")
    )
    scanned = {f.replace("file://", "").replace("file:", "") for f in merged.inputFiles()}
    assert scanned and scanned <= allowed


def test_token_vocab_drift_equals_full_histogram_diff(spark, tmp_path):
    from binlake_spark.lake import token_vocab_drift

    pdf = generate_change_log(
        GenSpec(n_docs=40, n_events=1000, events_per_epoch=250,
                retransmit_frac=0.1, evolution_at=500)
    )
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    engine.apply_batch(df.filter(F.col("epoch_hint") == 0), epoch_id=0)
    v_a = int(table.snapshot()["version"])
    h_a = _vocab_recompute(spark, table)
    for i, ep in enumerate(sorted(pdf["epoch_hint"].unique())[1:], start=1):
        engine.apply_batch(df.filter(F.col("epoch_hint") == int(ep)), epoch_id=i)
    h_b = _vocab_recompute(spark, table)

    a = {t: (nd, no) for t, nd, no in h_a}
    b = {t: (nd, no) for t, nd, no in h_b}
    want = {}
    for t in set(a) | set(b):
        dd = b.get(t, (0, 0))[0] - a.get(t, (0, 0))[0]
        do = b.get(t, (0, 0))[1] - a.get(t, (0, 0))[1]
        if dd or do:
            want[t] = (dd, do)
    got = {
        r.tok: (r.d_docs, r.d_occ)
        for r in token_vocab_drift(spark, table, from_version=v_a).collect()
    }
    assert got == want


def test_window_index_ivm_tracks_batch_recompute(spark, tmp_path):
    """The incrementally-maintained substring-dedup index (wh → df) must
    equal the batch window_fingerprints recompute of the final table
    after every epoch — inserts, edits (pre-image retraction), and
    deletes included — and its dup/stop sets must match the batch
    detectors' candidate sets."""
    from binlake_spark.lake import WindowIndexAggregate
    from binlake_spark.operators.tokens import window_fingerprints

    pdf = generate_change_log(
        GenSpec(n_docs=40, n_events=1000, events_per_epoch=250,
                retransmit_frac=0.1, hot_keys=3, hot_frac=0.3)
    )
    df = _log_df(spark, tmp_path, pdf)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    W_, S_ = 8, 1
    agg = WindowIndexAggregate(
        table, str(tmp_path / "winidx"), window=W_, stride=S_
    )

    def batch_df_counts():
        fps = window_fingerprints(
            table.read(spark).select("doc_id", "tokens"), W_, S_
        )
        return {
            (r.wh, r.n) for r in
            fps.groupBy("wh").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    epochs = sorted(pdf["epoch_hint"].unique())
    for i, ep in enumerate(epochs):
        engine.apply_batch(df.filter(F.col("epoch_hint") == int(ep)), epoch_id=i)
        assert agg.refresh(spark) is True
        got = {(r.wh, r.n_rows) for r in agg.read(spark).collect()}
        assert got == batch_df_counts(), f"diverged at epoch {i}"
    assert agg.refresh(spark) is False  # caught up

    # plant clone documents (random token arrays never share an 8-token
    # span organically): 5 copies of one doc's tokens under new keys,
    # applied as a real CDC epoch so the index must pick the duplicated
    # spans up through the feed
    src = table.read(spark).filter(F.size("tokens") >= W_).limit(1).collect()[0]
    max_seq = int(pdf["seq"].max())
    clones = pd.DataFrame(
        {
            "seq": [max_seq + 1 + i for i in range(5)],
            "server_uuid": ["u"] * 5,
            "gno": [max_seq + 1 + i for i in range(5)],
            "trx_id": [1] * 5,
            "ts": [pd.Timestamp("2026-01-01")] * 5,
            "op": ["I"] * 5,
            "doc_id": [f"clone-{i}" for i in range(5)],
            "tokens": [list(src.tokens)] * 5,
            "n_tok": [len(src.tokens)] * 5,
            "source": ["web"] * 5,
            "payload": [np.asarray(src.tokens, dtype="<i4").tobytes()] * 5,
            "before_payload": [None] * 5,
            "schema_ver": [1] * 5,
            "extra": [None] * 5,
            "epoch_hint": [len(epochs)] * 5,
        }
    )
    engine.apply_batch(_log_df(spark, tmp_path, clones, sub="clones"),
                       epoch_id=len(epochs))
    assert agg.refresh(spark) is True
    got = {(r.wh, r.n_rows) for r in agg.read(spark).collect()}
    assert got == batch_df_counts(), "diverged after planted clones"

    # the consumer surfaces match the batch detectors' candidate sets
    dup = {r.wh for r in agg.dup_windows(spark).collect()}
    batch_dup = {wh for wh, n in batch_df_counts() if n >= 2}
    assert dup == batch_dup and len(dup) > 0
    stop = {r.wh for r in agg.stop_windows(spark, max_df=3).collect()}
    batch_stop = {wh for wh, n in batch_df_counts() if n > 3}
    assert stop == batch_stop and len(stop) > 0  # 6 carriers > 3
