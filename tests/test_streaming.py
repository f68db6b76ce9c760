"""M2: Structured Streaming — kill/resume to identical state, exactly-once."""

import numpy as np
from pyspark.sql import functions as F

from binlake_spark.changelog import (
    GenSpec,
    generate_change_log,
    oracle_final_state,
    write_change_log,
)
from binlake_spark.streaming import CdcEngine


def _assert_matches(spark, engine, pdf):
    expected = oracle_final_state(pdf)
    got = engine.read_state(spark).orderBy("doc_id").collect()
    assert len(got) == len(expected)
    for row, (_, ref) in zip(got, expected.iterrows()):
        assert row.doc_id == ref.doc_id
        assert np.array_equal(np.array(row.tokens, dtype=np.int32), ref.tokens)


def test_stream_drain_matches_oracle(spark, tmp_path):
    spec = GenSpec(n_docs=80, n_events=1200, events_per_epoch=300, retransmit_frac=0.1)
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    engine.run_stream(spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert table.last_epoch("cdc") >= 3
    _assert_matches(spark, engine, pdf)


def test_kill_and_resume_identical_final_state(spark, tmp_path):
    spec = GenSpec(
        n_docs=80, n_events=1500, events_per_epoch=250,
        retransmit_frac=0.1, evolution_at=750,
    )
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)

    # phase 1: kill after 2 committed epochs (failover injection)
    engine.run_stream(
        spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1, stop_after_epochs=2
    )
    mid_epoch = table.last_epoch("cdc")
    assert 0 <= mid_epoch < 6

    # phase 2: resume from checkpoint, drain
    engine.run_stream(spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert table.last_epoch("cdc") > mid_epoch
    _assert_matches(spark, engine, pdf)
    # evolution column survived the restart
    assert "lang" in [f.name for f in table.schema().fields]

    # phase 3: re-drain an already-drained checkpoint — no new commits
    v = table.snapshot()["version"]
    engine.run_stream(spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    assert table.snapshot()["version"] == v


def test_lineage_covers_all_epochs(spark, tmp_path):
    spec = GenSpec(n_docs=40, n_events=800, events_per_epoch=200)
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    engine.run_stream(spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1)
    lin = engine.lineage(spark)
    n_epochs = lin.select("epoch_id").distinct().count()
    assert n_epochs == table.last_epoch("cdc") + 1
    # lineage accounting: per-epoch applied net rows; each epoch applies at
    # most its distinct keys, and upserts bound the live rows
    rows = lin.collect()
    per_epoch_keys = pdf.groupby("epoch_hint")["doc_id"].nunique()
    for r in rows:
        assert r.n_events <= per_epoch_keys.get(r.epoch_id, 0)
        assert r.n_events == r.n_upserts + r.n_deletes
    live = engine.read_state(spark).count()
    assert sum(r.n_upserts for r in rows) >= live
    # bucket offsets: final per-bucket PHYSICAL rows = live rows plus the
    # delete tombstones currently fencing stale replays (read() hides
    # them; purge_tombstones reclaims them under an explicit horizon)
    offs = table.bucket_offsets_df(spark)
    last_per_bucket = (
        offs.groupBy("partition_id")
        .agg(F.max_by("n_rows", "epoch_id").alias("final_rows"))
        .collect()
    )
    n_tomb = (
        table.read(spark, with_seq=True, with_tombstones=True)
        .filter(F.col("_tombstone"))
        .count()
    )
    assert n_tomb > 0  # the generator deletes docs
    assert sum(r.final_rows for r in last_per_bucket) == live + n_tomb


def test_stateful_dedup_by_seq(spark, tmp_path):
    """applyInPandasWithState fence: stale retransmits dropped across
    micro-batches, per-key monotone seq history preserved."""
    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
    from binlake_spark.streaming import dedup_by_seq_stateful

    spec = GenSpec(n_docs=40, n_events=800, events_per_epoch=200, retransmit_frac=0.3)
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)

    stream = (
        spark.readStream.schema(CHANGE_LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("doc_id", "seq", "op", "n_tok")
    )
    fenced = dedup_by_seq_stateful(stream)
    q = (
        fenced.writeStream.format("memory")
        .queryName("fenced")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT doc_id, seq FROM fenced").collect()
    # no duplicate (doc_id, seq) survives the fence
    assert len(got) == len({(r.doc_id, r.seq) for r in got})
    # the retransmit tail re-emits old seqs out of order; because epoch
    # files replay in order, stale re-sends must be dropped: within each
    # key the emitted seqs are exactly the distinct ones that were fresh
    # when first seen, i.e. every emitted seq is unique per key
    per_key = {}
    for r in got:
        per_key.setdefault(r.doc_id, []).append(r.seq)
    for k, seqs in per_key.items():
        assert len(seqs) == len(set(seqs))
    # winner per key must match the plain batch LWW winner
    import pandas as pd

    plain = pdf.drop_duplicates(subset=["seq"]).groupby("doc_id")["seq"].max()
    fenced_max = pd.Series(
        {k: max(v) for k, v in per_key.items()}, name="seq"
    ).sort_index()
    assert fenced_max.equals(plain.sort_index().astype(fenced_max.dtype))


def test_fanout_rules_per_table_exactly_once(spark, tmp_path):
    """Op 30 parity: one stream, two rule destinations — a filtered table
    and an unfiltered one — each with its own epoch guard."""
    from binlake_spark.streaming import FanoutCdc, Rule

    spec = GenSpec(n_docs=60, n_events=900, events_per_epoch=300, retransmit_frac=0.1)
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)

    t_all = CdcEngine.create_table(str(tmp_path / "all"), num_buckets=4)
    t_web = CdcEngine.create_table(str(tmp_path / "web"), num_buckets=4)
    fan = FanoutCdc(
        [
            Rule("all", t_all),
            Rule("web", t_web, predicate="source = 'web'"),
        ]
    )
    fan.run_stream(spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=2)

    expected = oracle_final_state(pdf)
    got_all = t_all.read(spark)
    assert got_all.count() == len(expected)
    # the filtered table's LWW runs over the filtered stream: its oracle is
    # the pandas oracle applied to only-web events
    web_expected = oracle_final_state(pdf[pdf.source == "web"].reset_index(drop=True))
    got_web = {r.doc_id for r in t_web.read(spark).collect()}
    assert got_web == set(web_expected.doc_id)
    # replaying an applied epoch is a no-op for every rule
    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA

    df = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(src)
    res = fan.apply_batch(df, epoch_id=0)
    assert all(not r.applied for r in res.values())


def test_progress_logger(spark, tmp_path):
    import os

    from binlake_spark.streaming import attach_progress_logger
    import json as _json

    spec = GenSpec(n_docs=20, n_events=200, events_per_epoch=100)
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    path = str(tmp_path / "progress.jsonl")
    logger = attach_progress_logger(spark, path)
    try:
        table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=4)
        CdcEngine(table).run_stream(spark, src, str(tmp_path / "ckpt"))
        spark.streams.resetTerminated()
        # listener delivery is asynchronous — poll until all rows reported
        import time as _time

        deadline = _time.monotonic() + 30
        rows = 0
        while _time.monotonic() < deadline:
            events = []
            if os.path.exists(path):
                with open(path) as f:
                    events = [_json.loads(l) for l in f if l.strip()]
            rows = sum(
                e.get("numInputRows", 0) for e in events if e["event"] == "progress"
            )
            if rows >= len(pdf):
                break
            _time.sleep(0.5)
    finally:
        spark.streams.removeListener(logger)
    # joinback compaction scans the file source twice per batch (winner
    # keys + payload probe), so numInputRows ≥ the event count
    assert rows >= len(pdf)


def test_windowed_change_counts_with_watermark(spark, tmp_path):
    """Event-time tumbling windows over the change stream: counts per
    (window, op) match a batch groupBy of the same data; the watermark
    keeps state bounded (append mode emits only closed windows)."""
    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
    from binlake_spark.streaming import windowed_change_counts

    spec = GenSpec(n_docs=40, n_events=900, events_per_epoch=300)
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)

    stream = (
        spark.readStream.schema(CHANGE_LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("doc_id", "ts", "op")
    )
    q = (
        windowed_change_counts(stream, window="1 minute", watermark="2 minutes")
        .writeStream.format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.window_start, r.op): r.n_events
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    # batch truth over the same file data (append mode withholds the final
    # not-yet-closed windows — every emitted window must match exactly)
    batch = (
        spark.read.schema(CHANGE_LOG_SCHEMA)
        .parquet(src)
        .groupBy(F.window("ts", "1 minute"), "op")
        .count()
        .select(F.col("window.start").alias("ws"), "op", "count")
        .collect()
    )
    truth = {(r.ws, r.op): r["count"] for r in batch}
    assert got, "no windows emitted"
    for k, v in got.items():
        assert truth[k] == v, k


def test_stream_consumers_track_table_through_kill_resume(spark, tmp_path):
    """Feed consumers passed to run_stream are refreshed per epoch and
    stay exact through a mid-stream kill + resume: their own atomic
    positions make the composition exactly-once."""
    from binlake_spark.lake import FeedAggregate, TokenVocabAggregate

    spec = GenSpec(
        n_docs=80, n_events=1500, events_per_epoch=250,
        retransmit_frac=0.1, evolution_at=750,
    )
    pdf = generate_change_log(spec)
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    agg = FeedAggregate(table, str(tmp_path / "ivm"), ["source"], {"sum_n_tok": "n_tok"})
    vocab = TokenVocabAggregate(table, str(tmp_path / "vocab"))

    engine.run_stream(
        spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1,
        stop_after_epochs=2, consumers=[agg, vocab],
    )
    # consumers were refreshed along the way; the kill may land between
    # the final table commit and its refresh (that window is healed by
    # the next refresh), so position trails CURRENT by at most one epoch
    assert agg.position() is not None
    assert agg.position() >= int(table.snapshot()["version"]) - 1

    engine.run_stream(
        spark, src, str(tmp_path / "ckpt"), max_files_per_trigger=1,
        consumers=[agg, vocab],
    )

    got_rollup = {tuple(r) for r in agg.read(spark).collect()}
    want_rollup = {
        tuple(r)
        for r in table.read(spark)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("sum_n_tok"),
        )
        .collect()
    }
    assert got_rollup == want_rollup

    got_vocab = {tuple(r) for r in vocab.vocab(spark).collect()}
    want_vocab = {
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
    assert got_vocab == want_vocab
