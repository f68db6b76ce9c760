"""End-to-end pretraining-data pipeline demo: the token ops composed.

Runs the full data-preparation chain a pretraining pipeline applies
between a raw document corpus and a trainer, over the driver test
tables, asserting each stage's invariant:

1. **tokenize** — deterministic word→id arrays (portable hash ids);
2. **exact dedup + duplicated-window screen** — drop exact clones
   (planted), report cross-doc repeated 8-token spans; then resolve
   near-dup pairs into clone families and keep the min-id survivor
   (planted leaks fold into their originals), and flag planted
   boilerplate via the intra-doc repetition rule;
2d. **release hygiene** — PII scrub (emails/phones/IPs redacted,
   idempotent) and cross-corpus duplicate-line cut (planted shared
   boilerplate line removed from every carrier);
3. **contamination screen** — drop documents whose 5-gram containment
   against a benchmark split exceeds threshold (planted leaks);
4. **mixture weights** — α=1/2 temperature-scaled per-source sampling
   weights over the surviving corpus;
5. **stratified sample** — deterministic hash sample at each source's
   allocation rate;
6. **shard assignment** — hash-sharded balance report;
7. **sequence packing** — concat-then-chunk into fixed 512-token
   training windows, token conservation checked.

Run:  spark-submit examples/pipeline_demo.py   (or plain python)
Exit 0 iff every stage invariant held.
"""

import sys

from pyspark.sql import functions as F

from binlake_spark.operators.text import repetition_score
from binlake_spark.operators.tokens import (
    collapse_clusters,
    contamination,
    dup_doc_pairs,
    dup_token_windows,
    mixture_weights,
    pack_sequences,
    shard_assign,
    stratified_sample,
    tokenize,
)
from binlake_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
SEQ_LEN = 512


def main() -> int:
    spark = get_spark("pipeline_demo", cpus=8, shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    n0 = docs.count()

    # plant adversarial inputs the pipeline must catch: exact clones and
    # benchmark leaks (prefixed so they are near- but not exact dupes)
    bench = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") % 89 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "source"
    )
    leaks = bench.join(docs.select("doc_id", "source"), "doc_id").select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.lit("leak "), F.col("text")).alias("text"),
        "source",
    )
    corpus = docs.unionByName(clones).unionByName(leaks)

    # 1-2. exact dedup: keep the lowest doc_id per identical text
    keep = corpus.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    deduped = corpus.join(keep, ["doc_id", "text"], "left_semi")
    n_clones = corpus.count() - deduped.count()
    assert n_clones == clones.count(), (n_clones, clones.count())
    print(f"exact dedup: dropped {n_clones} planted clones ✓")

    t = tokenize(deduped)
    flagged = dup_token_windows(t, window=8, stride=1)
    n_flagged = flagged.count()
    assert n_flagged > 0  # leaks share all their windows with bench docs
    print(f"window screen: {n_flagged} docs carry cross-doc 8-token spans ✓")

    # 2b. near-dup resolution: each planted leak ("leak " + original)
    # shares every original 8-token window -> pairs with its source;
    # min-id survivor selection keeps the original and folds the leak
    pairs = dup_doc_pairs(t, window=8, stride=1, min_shared=3)
    leak_pairs = pairs.filter(
        (F.col("doc_b") >= 2_000_000)
        & (F.col("doc_a") == F.col("doc_b") - 2_000_000)
    ).count()
    n_leaks = deduped.filter(F.col("doc_id") >= 2_000_000).count()
    assert leak_pairs == n_leaks, (leak_pairs, n_leaks)
    survivors = collapse_clusters(t, pairs, broadcast_losers=True)
    assert survivors.filter(F.col("doc_id") >= 2_000_000).count() == 0
    print(f"near-dup resolution: {leak_pairs} leak→origin pairs, min-id "
          f"survivors keep all originals ✓")

    # 2c. intra-doc repetition screen: a planted boilerplate document
    # (one clause looped) must light up the Gopher-style rule while the
    # organic corpus stays clear of the threshold
    boiler = spark.createDataFrame(
        [(3_000_000, ("lorem ipsum dolor sit amet " * 40).strip(), "web")],
        "doc_id long, text string, source string",
    )
    rep = repetition_score(deduped.unionByName(boiler), ngram=3)
    flagged_rep = rep.filter(F.col("dup_ngram_pml") > 800)
    ids = {r.doc_id for r in flagged_rep.select("doc_id").collect()}
    assert 3_000_000 in ids, "boilerplate doc must be flagged"
    assert len(ids) <= max(1, deduped.count() // 20), ids  # organic corpus clear
    print(f"repetition screen: boilerplate flagged at "
          f">800‰ dup 3-grams, {len(ids) - 1} organic docs over threshold ✓")

    # 2d. release hygiene: PII scrub + cross-corpus duplicate-line cut.
    # Plant a contact-info doc and a boilerplate 8-word line shared by
    # two otherwise-unique docs; the scrubber must redact every match
    # (and be idempotent), the line pass must cut the shared line from
    # BOTH carriers and nothing else.
    from binlake_spark.operators.dedup import drop_duplicate_lines
    from binlake_spark.operators.text import scrub_pii

    pii_doc = spark.createDataFrame(
        [(4_000_000,
          "reach me at ops@example.com or +1-555-0100-77 host 10.1.2.3",
          "web")],
        "doc_id long, text string, source string",
    )
    scrubbed = scrub_pii(deduped.unionByName(pii_doc))
    hit = scrubbed.filter(F.col("doc_id") == 4_000_000).collect()[0]
    assert (hit.n_email, hit.n_phone, hit.n_ip) == (1, 1, 1), hit
    rescrub = scrub_pii(
        scrubbed.select("doc_id", F.col("scrubbed").alias("text"))
    )
    leftover = rescrub.agg(
        F.sum(F.col("n_email") + F.col("n_phone") + F.col("n_ip"))
    ).collect()[0][0]
    assert leftover == 0, leftover
    shared = "b1 b2 b3 b4 b5 b6 b7 b8"
    liners = spark.createDataFrame(
        [(5_000_000, shared + " u1 u2 u3 u4 u5 u6 u7 u8", "web"),
         (5_000_001, "v1 v2 v3 v4 v5 v6 v7 v8 " + shared, "web")],
        "doc_id long, text string, source string",
    )
    cut = drop_duplicate_lines(deduped.unionByName(liners))
    got = {r.doc_id: r for r in
           cut.filter(F.col("doc_id") >= 5_000_000).collect()}
    assert got[5_000_000].n_kept == got[5_000_000].n_lines - 1
    assert got[5_000_001].n_kept == got[5_000_001].n_lines - 1
    assert shared not in got[5_000_000].kept_text
    assert shared not in got[5_000_001].kept_text
    print("release hygiene: PII redacted (idempotent), shared boilerplate "
          "line cut from both carriers ✓")

    # 3. contamination: every planted leak is caught — and the benchmark
    # members themselves (containment 1.0 against their own grams) are
    # flagged too, which is the POINT of the screen: neither a benchmark
    # doc nor a near-copy of one may reach the trainer
    screened = contamination(deduped.select("doc_id", "text"), bench, n=5,
                             threshold=0.5)
    dirty = {r.doc_id for r in screened.collect()}
    bench_ids = {r.doc_id for r in bench.collect()}
    planted = {d + 2_000_000 for d in bench_ids}
    assert planted <= dirty, f"missed {len(planted - dirty)} planted leaks"
    assert bench_ids <= dirty, "benchmark members must be screened out too"
    clean = deduped.join(
        screened.select("doc_id"), "doc_id", "left_anti"
    )
    assert clean.filter(F.col("doc_id") >= 2_000_000).count() == 0
    n_other = len(dirty) - len(planted) - len(bench_ids)
    print(f"contamination screen: {len(planted)} planted leaks + "
          f"{len(bench_ids)} benchmark members caught, "
          f"{n_other} incidental overlaps ✓")

    # 4-5. mixture weights over the clean corpus, then sample each source
    # at its allocated rate
    tc = tokenize(clean)
    total_tok = int(tc.agg(F.sum("n_tok")).collect()[0][0])
    budget = total_tok // 3  # draw a third of the corpus
    mix = mixture_weights(tc, token_budget=budget)
    rows = mix.collect()
    assert sum(r.tok_alloc for r in rows) <= budget
    rate = F.coalesce(
        *[
            F.when(F.col("source") == r.source,
                   F.least(F.lit(1.0), F.lit(r.tok_alloc / max(r.n_tok, 1))))
            for r in rows
        ]
    )
    sampled = stratified_sample(tc, rate)
    n_samp_tok = sampled.agg(F.sum("n_tok")).collect()[0][0]
    # hash sampling hits the token budget only in expectation; at this
    # corpus size a 2x envelope is a deterministic-seed regression guard
    assert 0.5 * budget < n_samp_tok < 2.0 * budget, n_samp_tok
    print(f"mixture sample: {n_samp_tok} tokens drawn against a "
          f"{budget}-token budget ✓")

    # 6. shard balance over the sampled corpus
    shards = shard_assign(sampled, n_shards=16).collect()
    assert sum(r.n_docs for r in shards) == sampled.count()
    spread = max(r.balance_pml for r in shards) - min(r.balance_pml for r in shards)
    print(f"shards: 16 hash shards, balance spread {spread}‰ of ideal ✓")

    # 7. pack into training windows: exact token conservation
    packed = pack_sequences(sampled, seq_len=SEQ_LEN)
    tok_in = sampled.agg(F.sum("n_tok")).collect()[0][0]
    tok_out = packed.agg(F.sum("n_tok_in_seq")).collect()[0][0]
    assert tok_in == tok_out, (tok_in, tok_out)
    n_seq = packed.count()
    full = packed.filter(F.col("n_tok_in_seq") == SEQ_LEN).count()
    assert n_seq - full <= sampled.select("source").distinct().count()
    print(f"packing: {tok_out} tokens -> {n_seq} windows of {SEQ_LEN} "
          f"({full} full) — conservation exact ✓")

    print(f"pipeline demo: {n0} raw docs -> {sampled.count()} sampled docs "
          f"-> {n_seq} training sequences; all invariants held ✓")
    return 0


if __name__ == "__main__":
    sys.exit(main())
