"""Physical-plan regression guards for the scale properties.

These assert the *plan shape* the 100 TB design depends on, so a future
refactor that silently reintroduces a wide payload shuffle or a table
exchange fails here, not in a cluster:

1. compaction: payloads cross at most ONE exchange (the winner-sized
   bucket repartition) — the winners aggregate exchanges only (key, seq);
2. survivors probe: broadcast hash join, no hash-exchange on the table
   scan side;
3. parquet scan: filters pushed, columns pruned.
"""

import re

from pyspark.sql import functions as F

from binlake_spark.changelog import GenSpec, generate_change_log, write_change_log
from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
from binlake_spark.operators.compaction import compact_lww_bucketed
from binlake_spark.streaming import CdcEngine


def _executed(df) -> str:
    df.count()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def _prep(spark, tmp_path, n=6000):
    pdf = generate_change_log(
        GenSpec(n_docs=400, n_events=n, events_per_epoch=n, evolution_at=n // 2)
    )
    src = str(tmp_path / "log")
    write_change_log(pdf, src)
    return spark.read.schema(CHANGE_LOG_SCHEMA).parquet(src)


def test_compaction_payload_crosses_one_exchange(spark, tmp_path):
    df = _prep(spark, tmp_path).select(
        "doc_id", "seq", "op", "n_tok", "source", "payload", "extra"
    )
    net = compact_lww_bucketed(
        df,
        bucket_col_expr=F.pmod(F.hash("doc_id"), F.lit(8)).cast("int"),
        num_partitions=8,
    )
    plan = _executed(net)
    # exchanges: winners agg (tiny rows) + bucket repartition (winners) +
    # ONE broadcast. No more.
    n_shuffle = len(re.findall(r"Exchange (?:hash|Round)", plan))
    n_broadcast = plan.count("BroadcastExchange")
    assert n_broadcast == 1, plan
    assert n_shuffle <= 2, f"unexpected extra shuffle:\n{plan}"
    # the winners-aggregate exchange must NOT carry the payload column
    agg_exchanges = [
        seg for seg in plan.split("Exchange") if "hashpartitioning(doc_id" in seg[:120]
    ]
    assert agg_exchanges, plan


def test_merge_survivors_probe_is_broadcast_no_table_shuffle(spark, tmp_path):
    df = _prep(spark, tmp_path)
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    engine.run_batch_replay(spark, str(tmp_path / "log"))

    cur = table.read(spark, with_seq=True)
    net_small = (
        df.groupBy("doc_id").agg(F.max("seq").alias("_in_seq"))
    )
    surv = (
        cur.join(net_small, "doc_id", "left")
        .filter(
            F.col("_in_seq").isNull()
            | (F.col("_in_seq") <= F.coalesce(F.col("_seq"), F.lit(-1)))
        )
        .drop("_in_seq")
    )
    plan = _executed(surv)
    assert "BroadcastHashJoin" in plan, plan
    # the table-scan side must stream into the join without an exchange:
    # every hash-exchange in the plan belongs to the net aggregate, whose
    # scan reads only (doc_id, seq)
    for seg in plan.split("Exchange hashpartitioning")[1:]:
        assert "payload" not in seg.split("Scan parquet")[0], plan


def test_scan_pushdown_and_pruning(spark, tmp_path):
    df = _prep(spark, tmp_path)
    q = df.select("doc_id", "seq").filter(F.col("op") == "I").filter(F.col("seq") > 100)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan\(seq", plan), plan
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(op,I\)", plan), plan
    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m and "payload" not in m.group(1) and "tokens" not in m.group(1), plan


def test_compaction_unpinned_winners_use_shuffle_join(spark, tmp_path):
    """The 10^7-winners regime (broadcast_winners=False): with the
    broadcast pin removed and broadcast ruled out by size (simulated by
    disabling the thresholds), the winner join-back must degrade to a
    shuffle join — never a driver-sized BroadcastExchange."""
    df = _prep(spark, tmp_path).select(
        "doc_id", "seq", "op", "n_tok", "source", "payload", "extra"
    )
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        net = compact_lww_bucketed(
            df,
            bucket_col_expr=F.pmod(F.hash("doc_id"), F.lit(8)).cast("int"),
            num_partitions=8,
            broadcast_winners=False,
        )
        plan = _executed(net)
        assert "BroadcastExchange" not in plan, plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ordered_produce_single_exchange_local_sort(spark, tmp_path):
    """ordered_produce must be exactly: one hash exchange on pt + a
    LOCAL (within-partition) sort + the fused Arrow encode — no global
    sort (which would add a range exchange) and no second shuffle."""
    from binlake_spark.streaming.produce import ordered_produce

    df = _prep(spark, tmp_path, n=4000)
    out = ordered_produce(df, num_partitions=8)
    plan = _executed(out)
    n_shuffle = len(re.findall(r"Exchange (?:hash|range|Round)", plan))
    assert n_shuffle == 1, f"expected exactly one exchange:\n{plan}"
    assert "rangepartitioning" not in plan, f"global sort leaked in:\n{plan}"
    # the sort node must be non-global (sortWithinPartitions)
    m = re.search(r"Sort \[[^\]]*\], (\w+)", plan)
    assert m and m.group(1) == "false", f"sort is global:\n{plan}"


def test_change_feed_scans_only_changed_bucket_files(spark, tmp_path):
    """read_changes must read exactly the changed bucket's files from the
    two snapshots — manifest pruning visible at the FileScan level, not
    just in the result."""
    import os

    pdf = generate_change_log(GenSpec(n_docs=60, n_events=1200))
    one = pdf["doc_id"].iloc[0]
    for name, part in [("p", pdf[pdf["doc_id"] != one]), ("s", pdf[pdf["doc_id"] == one])]:
        write_change_log(part, str(tmp_path / f"log_{name}"))
    table = CdcEngine.create_table(str(tmp_path / "docs"), num_buckets=8)
    engine = CdcEngine(table)
    engine.apply_batch(
        spark.read.schema(CHANGE_LOG_SCHEMA).parquet(str(tmp_path / "log_p")), epoch_id=0
    )
    v_a = int(table.snapshot()["version"])
    engine.apply_batch(
        spark.read.schema(CHANGE_LOG_SCHEMA).parquet(str(tmp_path / "log_s")), epoch_id=1
    )

    changed = table.changed_buckets(v_a)
    assert len(changed) == 1
    b = str(changed[0])
    allowed = set()
    for v in (v_a, int(table.snapshot()["version"])):
        snap = table.snapshot(v)
        for p in snap["files"].get(b, []) + (snap.get("deltas") or {}).get(b, []):
            allowed.add(os.path.join(table.root, p))

    feed = table.read_changes(spark, from_version=v_a)
    scanned = {f.replace("file://", "").replace("file:", "") for f in feed.inputFiles()}
    assert scanned and scanned <= allowed


def test_dup_token_windows_partial_agg_no_hot_key_window(spark):
    """Substring-dedup document frequency must be a partially-aggregated
    groupBy on the fingerprint, never a wh-partitioned Window: a window
    function funnels every carrier of one boilerplate fingerprint into a
    single sort task (straggler/OOM at 100× scale), while partial_count
    collapses the hot key per map task before the exchange.  The
    (corpus-sized) fingerprint set is derived once — a localCheckpoint —
    and the final plan carries only key-bounded shuffles plus the gated
    broadcast join-back."""
    from binlake_spark.operators.tokens import (
        dup_token_windows,
        tokenize,
        window_fingerprints,
    )

    d = tokenize(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
            "doc_id", "text"
        )
    )
    # the shared candidate generator explodes the corpus exactly once
    fp_plan = (
        window_fingerprints(d)._jdf.queryExecution().executedPlan().toString()
    )
    assert fp_plan.count("Generate") == 1, fp_plan

    out = dup_token_windows(d)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the hot-key df count is a partial-aggregated groupBy, NOT a Window
    assert "partial_count" in plan, plan
    assert "Window" not in plan, plan
    # post-checkpoint: the df-count exchange and the final doc groupBy —
    # the join-back itself is the gated broadcast (no wh re-shuffle of
    # the corpus-sized fingerprint side)
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_drop_duplicate_lines_corpus_never_shuffled(spark):
    """Boilerplate-line removal must decide keep/drop map-side: the df
    aggregation runs once up front (materialized, bounded by distinct
    lines), the drop set is folded to ONE broadcast array row, and the
    corpus side of the final plan is scan -> project -> broadcast cross
    join — ZERO hash exchanges.  An exchange here would reshuffle the
    whole corpus at 100x scale just to cut a handful of boilerplate
    lines (the same inversion ngram_jaccard_pairs' df-cap uses)."""
    from binlake_spark.operators.dedup import drop_duplicate_lines

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        drop_duplicate_lines(d, strategy="filter")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Generate" not in plan, plan  # no explode on the kept path
    # the large-drop-set strategy: broadcast-mark HASH join (set built
    # once per task, not per row) + exactly ONE corpus exchange (the
    # reassembly groupBy) — no join-back
    jplan = (
        drop_duplicate_lines(d, strategy="join")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert jplan.count("Exchange hashpartitioning") == 1, jplan
    assert "BroadcastHashJoin" in jplan, jplan
