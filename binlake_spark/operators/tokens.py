"""Token-sequence pipeline operators — the training-data side of the
tokens payload.

The engine's CDC path (streaming/engine.py) keeps a lake table of
pre-tokenized training sequences ``(doc_id, tokens, n_tok, source)`` up
to date; these operators are what a pretraining data pipeline runs *over*
that table before the tokens reach a trainer:

- :func:`tokenize` — deterministic word→id tokenization (portable hash),
  the stand-in for a real BPE vocabulary so every downstream op is
  oracle-checkable in a second engine;
- :func:`pack_sequences` — concat-then-chunk sequence packing: the
  per-source token stream is cut into fixed-length training windows,
  documents spanning window boundaries (the standard LLM pretraining
  packing regime).  Implemented WITHOUT exploding tokens: a running
  offset per source (window cumsum over ``n_tok``) places each document
  in the stream, and each document explodes only into the handful of
  windows it overlaps — cost ∝ documents, not tokens;
- :func:`vocab_stats` — corpus token-frequency histogram (map-side
  combinable groupBy);
- :func:`contamination` — benchmark-contamination screen: word-n-gram
  containment of every candidate document against a benchmark corpus,
  the candidate-generation shape being a gram-key equi-join (inverted
  index), never an all-pairs comparison;
- :func:`stratified_sample` — deterministic per-source mixture
  sampling by a portable uniform hash, returning the per-source token
  budget actually drawn.

Scale posture (10^10+ docs): ``pack_sequences`` partitions the running
offset by ``source`` (in production: by (source, shard) with shard =
hash(doc_id) % k), so no global total order is ever required; all other
ops are single-shuffle groupBy/equi-join plans with map-side combine.
Everything is JVM built-ins — zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def portable_hash(col: Column | str) -> Column:
    """md5 → first 15 hex digits → BIGINT; reproducible in DuckDB as
    ``('0x' || substr(md5(x), 1, 15))::BIGINT`` (same contract as the
    dedup/similarity oracle helpers, plans/driver_queries.py)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 65536,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Deterministic tokenization: whitespace words → stable int ids in
    [0, vocab_size).  ``transform`` keeps the whole pass in JVM codegen;
    the id function is the portable md5 hash so an independent engine
    reproduces the exact arrays (the per-row invariant the north rule
    checks is token-array equality, and a tokenizer that two engines
    can't agree on would make that untestable)."""
    words = F.split(F.col(text_col), " ")
    toks = F.transform(
        words,
        lambda w: (
            F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")
            % vocab_size
        ).cast("int"),
    )
    return df.withColumn(tokens_col, toks).withColumn(
        "n_tok", F.size(tokens_col)
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 512,
    source_col: str = "source",
    order_col: str = "doc_id",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Pack the per-source document stream into fixed-``seq_len`` training
    windows (concat-then-chunk).  Returns one row per (source, seq_no)
    with the document span and token occupancy of that window.

    Plan shape: one window cumsum partitioned by source (parallel across
    sources — never a global order), then each document explodes into
    ``sequence(first_window, last_window)`` — 1-2 rows for a typical doc,
    ``⌈n_tok/seq_len⌉+1`` for a long one — and a single groupBy
    aggregates window occupancy.  Token arrays are never exploded, so
    the shuffle is sized in documents, not tokens."""
    w = W.partitionBy(source_col).orderBy(order_col)
    start = F.coalesce(
        F.sum(n_tok_col).over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    placed = df.select(
        F.col(source_col).alias("source"),
        F.col(order_col).alias("doc_id"),
        F.col(n_tok_col).cast("long").alias("n_tok"),
        start.alias("tok_start"),
    ).withColumn("tok_end", F.col("tok_start") + F.col("n_tok") - 1)

    L = F.lit(seq_len).cast("long")
    spans = placed.filter(F.col("n_tok") > 0).withColumn(
        "seq_no",
        F.explode(
            F.sequence(
                # integer DIV keeps window assignment exact at any offset
                # (float floor would be fine to 2^53 tokens, DIV always)
                F.expr(f"tok_start DIV {int(seq_len)}"),
                F.expr(f"tok_end DIV {int(seq_len)}"),
            )
        ),
    )
    win_lo = F.col("seq_no") * L
    win_hi = (F.col("seq_no") + 1) * L - 1
    in_win = (
        F.least(F.col("tok_end"), win_hi)
        - F.greatest(F.col("tok_start"), win_lo)
        + 1
    )
    return (
        spans.withColumn("tok_in_seq", in_win)
        .groupBy("source", "seq_no")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok_in_seq").alias("n_tok_in_seq"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def vocab_stats(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 65536,
    top_k: int = 100,
) -> DataFrame:
    """Corpus token-frequency histogram: top-``top_k`` token ids by
    occurrence count (ties broken by id).  explode → groupBy — partial
    aggregation collapses each map task to ≤ vocab_size rows before the
    shuffle, so the wide exchange is bounded by the vocabulary, not the
    corpus."""
    words = F.split(F.col(text_col), " ")
    tok = (portable_hash(F.col("w")) % vocab_size).cast("int")
    return (
        df.select(F.explode(words).alias("w"))
        .select(tok.alias("token_id"))
        .groupBy("token_id")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.desc("n_occ"), "token_id")
        .limit(top_k)
    )


def contamination(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination screen: for each candidate document, the
    fraction of its distinct word-``n``-grams that appear anywhere in the
    ``benchmark`` corpus (n-gram *containment*, the decontamination test
    used for pretraining corpora).  Returns candidates with containment
    ≥ ``threshold``.

    Shape: distinct grams per side, equi-join on the gram hash (the
    benchmark side is the small one — broadcast-able), count / total.
    Never all-pairs; cost ∝ matching grams."""

    def grams(frame: DataFrame, alias: str) -> DataFrame:
        g = F.expr(
            f"transform(sequence(0, greatest(size(split({text_col}, ' ')) - {n}, -1)),"
            f" i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {n})))"
        )
        # the gram text never matters downstream, only membership — carry
        # the portable 60-bit hash so shuffle rows and the broadcast set
        # are fixed-width (16 B), the same trick as the ngram-Jaccard op
        return (
            frame.select(F.col(id_col).alias(alias), F.explode(g).alias("_g"))
            .select(alias, portable_hash(F.col("_g")).alias("g"))
            .distinct()
        )

    # materialize the candidate posting list once (it feeds both the
    # per-doc total and the hit count); the benchmark gram set is the
    # small side by construction — broadcast it so the screen is a
    # map-side semi-join over the corpus, no wide shuffle of candidates
    cand = grams(df, "doc_id").localCheckpoint()
    bench_grams = grams(benchmark, "bench_id").select("g").distinct()
    totals = cand.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        cand.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        totals.join(hits, "doc_id", "inner")
        .withColumn(
            "containment",
            F.round(F.col("n_hit").cast("double") / F.col("n_grams"), 4),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_id", "n_grams", "n_hit", "containment")
    )


def stratified_sample(
    df: DataFrame,
    rate_expr: Column,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic mixture sampling: keep a document iff its portable
    uniform ``u ∈ [0,1)`` (md5 of the id — stable across runs, engines,
    and cluster sizes) falls under ``rate_expr`` (a per-row Column, e.g.
    a CASE over sources).  No RNG state, no seed plumbing: resampling at
    10^10 docs is a pure filter, embarrassingly parallel, and adding
    data never changes earlier keep/drop decisions."""
    u = (portable_hash(F.col(id_col).cast("string")) % 1000000) / 1000000.0
    return df.withColumn("_u", u).filter(F.col("_u") < rate_expr).drop("_u")
