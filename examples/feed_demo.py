"""Consumer-side demo: everything downstream of the CDC sink.

Streams a synthetic binlog into a LakeTable epoch by epoch, and after
each epoch drives all four consumer surfaces:

- **change data feed** (`read_changes` via `ChangeFeedReader`) — the
  committed-position poll/commit loop,
- **lake→lake replication** (`apply_to`) — a downstream LakeTable kept
  in lockstep, verified exactly every epoch,
- **incremental view maintenance** (`FeedAggregate`) — a per-source
  rollup refreshed from feed deltas only, verified against a
  from-scratch recompute every epoch,
- **token-vocabulary IVM** (`TokenVocabAggregate`) — the per-token
  (doc-freq, occurrences) histogram a tokenizer trainer reads, kept
  current from feed deltas only, verified against an explode recompute
  every epoch,
- **point lookup + snapshot tags** — bucket-pruned key reads and a
  pinned pre-replay tag read back at the end.

Run:  spark-submit examples/feed_demo.py   (or plain python)
Exit 0 iff every per-epoch check held.
"""

import sys
import tempfile

from pyspark.sql import functions as F

from binlake_spark.changelog import GenSpec, generate_change_log, write_change_log
from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
from binlake_spark.lake import (
    ChangeFeedReader,
    FeedAggregate,
    LakeTable,
    TokenVocabAggregate,
)
from binlake_spark.session import get_spark
from binlake_spark.streaming import CdcEngine


def state(spark, t):
    return {
        r["doc_id"]: (tuple(r["tokens"] or ()), r["n_tok"], r["source"])
        for r in t.read(spark).collect()
    }


def rollup(spark, t):
    return {
        tuple(r)
        for r in t.read(spark)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("sum_n_tok"),
        )
        .collect()
    }


def vocab_recompute(spark, t):
    return {
        tuple(r)
        for r in t.read(spark)
        .select("doc_id", F.explode("tokens").alias("tok"))
        .groupBy("tok")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occ"),
        )
        .collect()
    }


def main() -> int:
    work = tempfile.mkdtemp(prefix="binlake_feed_demo_")
    spark = get_spark("feed_demo", cpus=8, shuffle_partitions=8)

    pdf = generate_change_log(
        GenSpec(n_docs=200, n_events=3000, events_per_epoch=500,
                retransmit_frac=0.1, hot_keys=2, hot_frac=0.2, evolution_at=1500)
    )
    write_change_log(pdf, f"{work}/log")
    log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(f"{work}/log")

    src = CdcEngine.create_table(f"{work}/src", num_buckets=16)
    engine = CdcEngine(src)
    dst = LakeTable.create(
        f"{work}/dst", schema=src.schema(), key_col="doc_id", num_buckets=8
    )
    reader = ChangeFeedReader(src, consumer_id="repl")
    agg = FeedAggregate(src, f"{work}/ivm", ["source"], {"sum_n_tok": "n_tok"})
    vocab = TokenVocabAggregate(src, f"{work}/vocab")

    epochs = sorted(int(e) for e in pdf["epoch_hint"].unique())
    tagged = False
    for i, ep in enumerate(epochs):
        engine.apply_batch(log.filter(F.col("epoch_hint") == ep), epoch_id=i)
        if not tagged:
            src.tag("first-epoch")
            tagged = True

        res = reader.apply_to(spark, dst)
        assert res is not None and res.applied
        assert state(spark, dst) == state(spark, src), f"replica diverged at {i}"

        agg.refresh(spark)
        got = {tuple(r) for r in agg.read(spark).collect()}
        assert got == rollup(spark, src), f"rollup diverged at {i}"

        vocab.refresh(spark)
        got_v = {tuple(r) for r in vocab.vocab(spark).collect()}
        assert got_v == vocab_recompute(spark, src), f"vocab diverged at {i}"
        print(f"epoch {i}: replica exact ✓  rollup exact ✓  vocab exact ✓")

    # point lookup: live keys answer, tombstoned keys are absent
    keys = sorted(pdf["doc_id"].unique())[:10]
    live = state(spark, src)
    found = {r["doc_id"] for r in src.lookup(spark, keys).collect()}
    assert found == {k for k in keys if k in live}
    print(f"point lookup over {len(keys)} keys: {len(found)} live ✓")

    # the tag still reads the pinned first-epoch state after expiry
    n_tagged = src.read(spark, version="first-epoch").count()
    src.expire_snapshots(keep_last=1)
    assert src.read(spark, version="first-epoch").count() == n_tagged
    print(f"tag 'first-epoch' pinned through expiry ({n_tagged} rows) ✓")

    print("feed demo: all consumer surfaces exact ✓")
    return 0


if __name__ == "__main__":
    sys.exit(main())
