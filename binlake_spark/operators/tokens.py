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

from ..checkpointing import materialize, release


def portable_hash(col: Column | str) -> Column:
    """md5 → first 15 hex digits → BIGINT; reproducible in DuckDB as
    ``('0x' || substr(md5(x), 1, 15))::BIGINT`` (same contract as the
    dedup/similarity oracle helpers, plans/driver_queries.py)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shard_expr(key: Column | str, n_shards: int) -> Column:
    """THE shard function: portable hash of the stringified key mod
    ``n_shards``.  Shared by :func:`shard_assign` and
    :func:`pack_sequences` so the balance one reports is the balance of
    the streams the other produces."""
    k = F.col(key) if isinstance(key, str) else key
    return (portable_hash(k.cast("string")) % int(n_shards)).cast("int")


def gated_broadcast(
    df: DataFrame, pin: bool | None, limit: int
) -> DataFrame:
    """Tri-state broadcast gate — the same contract as the engine's
    ``broadcast_winners`` (streaming/engine.py): ``True`` pins a
    broadcast hint, ``False`` leaves the join to the planner (shuffle
    equi-join; AQE may still up-convert a small side at runtime), and
    ``None`` counts the frame and broadcasts only when ≤ ``limit`` rows
    — a 10^7+-row "small side" would otherwise OOM the driver."""
    if pin is True:
        return F.broadcast(df)
    if pin is False:
        return df
    # auto path: materialize once, THEN count — a bare df.count() here
    # would run the whole derivation eagerly and the join would recompute
    # it a second time (the gate would cost two passes; ADVICE r4)
    df = materialize(df)
    return F.broadcast(df) if df.count() <= int(limit) else df


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
    n_shards: int | None = None,
) -> DataFrame:
    """Pack the per-source document stream into fixed-``seq_len`` training
    windows (concat-then-chunk).  Returns one row per (source, seq_no)
    with the document span and token occupancy of that window.

    Plan shape: one window cumsum partitioned by source (parallel across
    sources — never a global order), then each document explodes into
    ``sequence(first_window, last_window)`` — 1-2 rows for a typical doc,
    ``⌈n_tok/seq_len⌉+1`` for a long one — and a single groupBy
    aggregates window occupancy.  Token arrays are never exploded, so
    the shuffle is sized in documents, not tokens.

    ``n_shards`` is the 10^10-doc scale knob: a lone giant source would
    otherwise serialize its whole cumsum into ONE sort partition.  When
    set, documents are deterministically hash-sharded (portable hash of
    the order column mod ``n_shards`` — stable across runs and cluster
    sizes) and the running offset is partitioned by (source, shard);
    output rows carry the extra ``shard`` column and window ids are
    contiguous within each (source, shard) stream — the production
    regime where each shard is an independent trainer stream."""
    parts = [F.col(source_col).alias("source")]
    keys = ["source"]
    if n_shards is not None:
        parts.append(shard_expr(order_col, n_shards).alias("shard"))
        keys.append("shard")
    # the window resolves against `placed`, where the order column is
    # already renamed to doc_id — order by the alias, not order_col
    w = W.partitionBy(*keys).orderBy("doc_id")
    placed = df.select(
        *parts,
        F.col(order_col).alias("doc_id"),
        F.col(n_tok_col).cast("long").alias("n_tok"),
    )
    start = F.coalesce(
        F.sum("n_tok").over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    placed = placed.withColumn("tok_start", start).withColumn(
        "tok_end", F.col("tok_start") + F.col("n_tok") - 1
    )

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
        .groupBy(*keys, "seq_no")
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
    broadcast_bench: bool | None = None,
    broadcast_bench_limit: int = 4_000_000,
) -> DataFrame:
    """Benchmark-contamination screen: for each candidate document, the
    fraction of its distinct word-``n``-grams that appear anywhere in the
    ``benchmark`` corpus (n-gram *containment*, the decontamination test
    used for pretraining corpora).  Returns candidates with containment
    ≥ ``threshold``.  Documents shorter than ``n`` words have no
    ``n``-gram and are trivially clean — they are filtered before the
    gram explode (``sequence(0, -1)`` is a *descending* range in Spark,
    so the unfiltered form would crash on the first short document).

    Shape: per-document distinct gram-hash ARRAYS built map-side
    (``array_distinct`` over a ``transform`` — a doc's grams all live in
    its own row, so per-doc dedup needs no corpus-wide shuffle, and the
    per-doc total ``n_grams`` is just ``size(...)``, computed in the same
    map stage instead of a separate aggregation + join-back); then one
    explode → equi-join on the gram hash against the (small) benchmark
    gram set → one doc-keyed groupBy.  Never all-pairs; exactly one wide
    shuffle over the candidate side.  ``broadcast_bench`` is the
    engine-style tri-state: ``True`` pins the broadcast (real benchmark
    suites are ≤ millions of grams), ``False`` forces the shuffle
    equi-join, ``None`` (default) materializes + counts the gram set and
    broadcasts only under ``broadcast_bench_limit`` — a giant
    "benchmark" (e.g. screening corpus-vs-corpus overlap) takes the
    shuffle path instead of OOMing the driver."""
    words = f"split({text_col}, ' ')"
    # the gram text never matters downstream, only membership — carry
    # the portable 60-bit hash so shuffle rows and the broadcast set
    # are fixed-width, the same trick as the ngram-Jaccard op
    # total expression (CASE, not just the row filter): a merged
    # filter + codegen subexpression elimination can evaluate this
    # outside the short-circuit — see window_fingerprint_arrays
    gram_hashes = F.expr(
        f"CASE WHEN size({words}) >= {n}"
        f" THEN array_distinct(transform(sequence(0, size({words}) - {n}),"
        f" i -> cast(conv(substring(md5("
        f"concat_ws(' ', slice({words}, i + 1, {n}))"
        f"), 1, 15), 16, 10) AS bigint)))"
        f" ELSE CAST(array() AS array<bigint>) END"
    )
    short_guard = F.size(F.split(F.col(text_col), " ")) >= n

    # The gram array MUST become a named attribute below the explode:
    # size(<expr>) + explode(<expr>) in one projection makes Catalyst
    # inline the md5-heavy expression into the post-Generate project,
    # re-evaluating it per OUTPUT row — O(grams²) per doc (measured 25×
    # at sf0.1).  Exploding (g, n_grams) STRUCTS (size() is O(1) on the
    # bound attribute) also avoids copying the whole array into every
    # generated UnsafeRow.
    arrs = df.filter(short_guard).select(
        F.col(id_col).alias("doc_id"), gram_hashes.alias("_gs")
    )
    cand = arrs.select(
        "doc_id",
        F.expr(
            "explode(transform(_gs, x -> struct(x AS g, size(_gs) AS ng)))"
        ).alias("s"),
    ).select(
        "doc_id",
        F.col("s.g").alias("g"),
        F.col("s.ng").cast("long").alias("n_grams"),
    )
    bench_grams = gated_broadcast(
        benchmark.filter(short_guard)
        .select(F.explode(gram_hashes).alias("g"))
        .distinct(),
        broadcast_bench,
        broadcast_bench_limit,
    )
    # docs with zero benchmark hits can never clear a positive threshold
    # (and the historical contract never emitted hit-less rows), so the
    # inner join IS the totals bookkeeping — n_grams rides the exploded
    # rows and comes back out as max()
    return (
        cand.join(bench_grams, "g")
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.count(F.lit(1)).alias("n_hit"),
        )
        .withColumn(
            "containment",
            F.round(F.col("n_hit").cast("double") / F.col("n_grams"), 4),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_id", "n_grams", "n_hit", "containment")
    )


def bpe_pair_counts(
    df: DataFrame,
    tokens_col: str = "tokens",
    top_k: int = 50,
) -> DataFrame:
    """Adjacent token-pair frequency count — the inner loop of BPE/
    WordPiece vocabulary training (each merge round promotes the most
    frequent pair).  Returns the top-``top_k`` pairs by corpus count,
    ties broken by (tok_a, tok_b).

    Shape: ``zip_with`` over two shifted slices builds the pair list
    in-place (no token explode until the pair rows, which partial
    aggregation collapses to ≤ |observed pairs| per map task before the
    shuffle) — the wide exchange is bounded by distinct-pair cardinality
    (≤ vocab², in practice Heaps-law small), not corpus size.  One merge
    round = one run of this plan; training loops it driver-side with the
    winning pair folded into the tokenizer."""
    t = tokens_col
    pairs = F.expr(
        f"zip_with(slice({t}, 1, greatest(size({t}) - 1, 0)),"
        f"         slice({t}, 2, greatest(size({t}) - 1, 0)),"
        f"         (a, b) -> struct(a AS tok_a, b AS tok_b))"
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.tok_a", "p.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "tok_a", "tok_b")
        .limit(top_k)
    )


def bpe_apply_merge(
    df: DataFrame,
    tok_a: int,
    tok_b: int,
    new_id: int,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Rewrite every token array by one BPE merge rule: each
    left-to-right non-overlapping occurrence of the adjacent pair
    (``tok_a``, ``tok_b``) becomes ``new_id`` — exact standard BPE
    semantics including the a,a,a run case (a fold can't re-consume the
    symbol it just produced).

    Stays in JVM codegen via ``aggregate`` (a per-row fold); the fold
    copies the accumulator per element, so the per-document cost is
    O(len²) array copies — documents are bounded (pretraining corpora
    chunk them), and no shuffle is involved at all: the rewrite is a
    pure map stage."""
    t, a, b, c = tokens_col, int(tok_a), int(tok_b), int(new_id)
    merged = F.expr(
        f"""aggregate({t}, cast(array() as array<int>), (acc, x) ->
              CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {a}
                        AND x = {b}
                   THEN concat(slice(acc, 1, size(acc) - 1),
                               array(cast({c} as int)))
                   ELSE concat(acc, array(x)) END)"""
    )
    out = df.withColumn(t, merged)
    if "n_tok" in df.columns:
        out = out.withColumn("n_tok", F.size(t))
    return out


def bpe_train(
    df: DataFrame,
    n_merges: int,
    tokens_col: str = "tokens",
    first_new_id: int = 65536,
    batch_size: int = 1,
    stats: dict | None = None,
) -> tuple[list[tuple[int, int, int, int]], DataFrame]:
    """Distributed BPE vocabulary training: count adjacent pairs
    corpus-wide (the oracle-checked :func:`bpe_pair_counts` plan),
    promote the most frequent pair (ties: lowest tok_a, then tok_b —
    deterministic across runs and cluster sizes) to a fresh id, rewrite
    the corpus with :func:`bpe_apply_merge`, repeat.  Stops early when
    no pair occurs twice.

    Returns ``(merges, df_final)`` where merges is
    ``[(tok_a, tok_b, new_id, n_pairs), ...]`` in training order; when
    ``stats`` is a dict it receives ``{"rounds": <count-and-rewrite
    cycles actually run>}``.

    ``batch_size=1`` (default) is EXACT standard BPE: one count job +
    one collect + one rewrite per merge.  A real 32k-merge vocabulary
    is then ~64k sequential Spark jobs — wall-clock dominated by
    scheduler latency, not data.  ``batch_size=k`` amortizes that by
    applying up to k SYMBOL-DISJOINT top pairs from one count snapshot
    in a single rewrite pass (the standard parallel-BPE batching), a
    ~k× cut in rounds.  CAVEAT — batching is NOT guaranteed
    merge-for-merge identical to sequential BPE, and symbol
    disjointness alone cannot make it so: merging the top pair (a,b)→z
    both *creates* pairs ((x,z), (z,y) — up to n₁ occurrences) and
    *partially decrements* overlapping pairs ((x,a) keeps its
    occurrences not followed by b), and either can out-rank the next
    disjoint candidate in the true sequential order.  Corpora with
    clear frequency gaps between batch members are unaffected (the
    pytest corpora are pinned identical at batch_size 1 and 4);
    closely-tied tails can reorder merges.  Exactness-critical
    training keeps batch_size=1.

    Scale shape per round: one partial-aggregated pair count (shuffle
    bounded by distinct-pair cardinality, not corpus size), one small
    collect, and a shuffle-free map-stage rewrite (k nested folds still
    compile into the single stage).  The rewritten corpus is
    materialized each round (checkpointing.materialize — local or
    reliable) so round k costs O(corpus), not O(k · corpus) replans —
    the same flat-iteration pattern as IVF Lloyd training
    (operators/ivf.py)."""
    B = max(1, int(batch_size))
    cur = df
    prev = None  # previous round's checkpoint, released once superseded
    merges: list[tuple[int, int, int, int]] = []
    rounds = 0
    while len(merges) < int(n_merges):
        want = min(B, int(n_merges) - len(merges))
        # over-fetch: disjointness filtering discards overlapping
        # candidates, and rows below 2 occurrences are never merged
        top = [
            r
            for r in bpe_pair_counts(
                cur, tokens_col=tokens_col, top_k=max(16, want * 8)
            ).collect()
            if r.n_pairs >= 2
        ]
        if not top:
            break
        rounds += 1
        used: set[int] = set()
        batch: list[tuple[int, int, int]] = []
        for r in top:
            if len(batch) >= want:
                break
            a, b = int(r.tok_a), int(r.tok_b)
            if a in used or b in used:
                continue
            batch.append((a, b, int(r.n_pairs)))
            used.update((a, b))
        new = cur
        for a, b, n in batch:
            new_id = first_new_id + len(merges)
            merges.append((a, b, new_id, n))
            new = bpe_apply_merge(new, a, b, new_id, tokens_col=tokens_col)
        cur = materialize(new)
        # the new checkpoint is materialized (eager) and does not depend
        # on the previous one — release it, or k rounds pin k corpus
        # copies in block-manager storage
        if prev is not None:
            release(prev)
        prev = cur
    if stats is not None:
        stats["rounds"] = rounds
    return merges, cur


def window_fingerprint_arrays(
    df: DataFrame,
    window: int = 8,
    stride: int = 1,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DISTINCT window-fingerprint arrays, built entirely
    map-side: each doc's ``window``-token spans every ``stride``
    positions, hashed to a 60-bit portable id (reproducible in DuckDB),
    deduped with ``array_distinct`` *inside the doc's own row*.  Because
    all of a document's windows live in one row, per-doc dedup needs no
    corpus-wide ``distinct()`` shuffle — the r4 form paid a full
    (doc_id, wh) exchange for exactly this set.  One compact row per doc
    also makes the downstream localCheckpoint ∝ documents, not windows."""
    t, n, S = tokens_col, int(window), int(stride)
    # total expression: the size() filter below prunes rows, but Catalyst
    # can merge it with the size(whs)>0 predicate InferFiltersFromGenerate
    # derives from the downstream explode, and codegen subexpression
    # elimination then evaluates the array OUTSIDE the &&-short-circuit —
    # sequence(1, size-n+1) must therefore be legal for EVERY row, so the
    # short-doc branch is guarded inside the expression itself
    wh_arr = F.expr(
        f"CASE WHEN size({t}) >= {n}"
        f" THEN array_distinct(transform(sequence(1, size({t}) - {n} + 1, {S}),"
        f" i -> cast(conv(substring(md5("
        f"concat_ws(',', transform(slice({t}, i, {n}), x -> cast(x AS string)))"
        f"), 1, 15), 16, 10) AS bigint)))"
        f" ELSE CAST(array() AS array<bigint>) END"
    )
    return df.filter(F.size(t) >= n).select(
        F.col(id_col).alias("doc_id"), wh_arr.alias("whs")
    )


def window_fingerprints(
    df: DataFrame,
    window: int = 8,
    stride: int = 1,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct (doc_id, wh) window fingerprints: each doc's
    ``window``-token spans every ``stride`` positions, hashed to a 60-bit
    portable id (fixed-width shuffle rows; reproducible in DuckDB).  The
    shared candidate generator for :func:`dup_token_windows` and
    :func:`dup_doc_pairs`.  Distinctness comes from the per-doc
    ``array_distinct`` in :func:`window_fingerprint_arrays` — zero
    shuffle, one Generate."""
    return window_fingerprint_arrays(
        df, window, stride, tokens_col, id_col
    ).select("doc_id", F.explode("whs").alias("wh"))


def dup_doc_pairs(
    df: DataFrame,
    window: int = 8,
    stride: int = 1,
    min_shared: int = 3,
    max_df: int | None = 50,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    broadcast_keys: bool | None = None,
    broadcast_key_limit: int = 4_000_000,
) -> DataFrame:
    """Doc-level near-duplicate PAIRS from shared token windows — the
    pair-resolution stage of substring dedup (after
    :func:`dup_token_windows` flags that duplication exists, this says
    WHICH documents to collapse): (doc_a, doc_b, n_shared) for every
    pair sharing ≥ ``min_shared`` distinct ``window``-token spans,
    doc_a < doc_b.

    Scale shape: a posting-list equi-join on the window fingerprint —
    the same bounded-blowup design as ngram Jaccard: windows carried by
    more than ``max_df`` docs are dropped first (boilerplate
    stop-windows; a window shared by k docs would otherwise emit k²/2
    pairs), so the self-join output is ≤ |windows| · max_df and never
    all-pairs.  Document frequency is a ``groupBy("wh")`` — partial
    aggregation collapses a boilerplate window shared by 10^7 docs to
    one row per map task before the exchange, where a
    ``count().over(partitionBy("wh"))`` form would funnel every carrier
    of the hot window into a single sort task (the same hot-key
    spreading the reference's NO_ORDER grade exists for,
    IKeyGenerator.java:32-46).  The kept-window id set
    (2 ≤ df ≤ ``max_df``) is small by construction and joins back under
    the ``broadcast_keys`` tri-state gate.  The ONLY materialization is
    the compact per-doc fingerprint-array frame (one row per document —
    the expensive md5-per-window pass runs exactly once); the per-window
    posting list is re-exploded from it for the df count and for each
    self-join side, which with the broadcast gate is a pure map stage —
    cheaper at every scale than the r4 form's second (per-window-row)
    localCheckpoint of the kept set."""
    arr = materialize(
        window_fingerprint_arrays(df, window, stride, tokens_col, id_col)
    )
    wins = arr.select("doc_id", F.explode("whs").alias("wh"))
    cond = F.col("_df") >= 2
    if max_df is not None:
        cond = cond & (F.col("_df") <= int(max_df))
    keep_whs = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(cond)
        .select("wh")
    )
    gate = gated_broadcast(keep_whs, broadcast_keys, broadcast_key_limit)
    kept = wins.join(gate, "wh", "left_semi")
    a = kept.select(F.col("doc_id").alias("doc_a"), "wh")
    b = kept.select(F.col("doc_id").alias("doc_b"), "wh")
    return (
        a.join(b, "wh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )


def dup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate pairs — the final stage
    of dedup: group pairwise hits into clusters so the pipeline keeps
    exactly one survivor (the minimum id) per clone family.  Returns
    (doc_id, cluster_id) for every doc appearing in ``pairs``;
    ``cluster_id`` is the component's minimum doc id, so the canonical
    survivor is simply ``doc_id == cluster_id``.

    Deterministic min-label propagation: each round every node adopts
    the smallest label among itself and its neighbors; converges in
    O(component diameter) rounds (near-dup clusters are shallow — a
    clone family's diameter is 1-2), each round one equi-join + one
    min-aggregate, both keyed shuffles bounded by |pairs|.  The frame is
    localCheckpoint-ed per round (previous round released) so round k
    costs O(edges), not O(k·edges).  Iteration stops at the first round
    with zero label changes; ``max_iters`` is the runaway bound, and
    exhausting it without converging RAISES — a partially-propagated
    labeling silently splits long clone chains (diameter > max_iters)
    into separate clusters, which is a wrong answer, not a degraded
    one.  The raise is deliberately conservative: convergence is only
    *observed* on the first all-quiet round, so callers must budget
    ``max_iters ≥ diameter + 1`` — a component of diameter exactly
    ``max_iters`` raises even though its labeling happens to be
    complete."""
    if int(max_iters) < 1:
        raise ValueError(
            f"max_iters must be >= 1 (got {max_iters}); min-label "
            f"propagation needs at least one round to observe convergence"
        )
    edges = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    edges = materialize(
        edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
    )
    labels = materialize(
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
    )
    changed = -1
    for _ in range(int(max_iters)):
        nbr = edges.join(
            labels.select(F.col("doc_id").alias("b"), F.col("label").alias("nl")),
            "b",
        ).select(F.col("a").alias("doc_id"), F.col("nl").alias("label"))
        new = materialize(
            labels.unionByName(nbr)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
        )
        changed = (
            new.join(
                labels.select("doc_id", F.col("label").alias("old")), "doc_id"
            )
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        release(labels)
        labels = new
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"dup_clusters did not converge within max_iters={max_iters} "
            f"({changed} labels still changing); the component diameter "
            f"exceeds the round budget — raise max_iters"
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def dup_token_windows(
    df: DataFrame,
    window: int = 8,
    stride: int = 1,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    broadcast_keys: bool | None = None,
    broadcast_key_limit: int = 4_000_000,
) -> DataFrame:
    """Exact duplicated-token-window detection (the substring-dedup
    regime of Lee et al., "Deduplicating Training Data Makes Language
    Models Better": repeated ``window``-token spans across documents are
    memorization fuel even when whole docs differ).  Returns, per
    document that shares at least one window with another document, the
    distinct-window count and how many of those windows also occur
    elsewhere.

    Shape: each doc hashes its windows ONCE, map-side, into a distinct
    fingerprint ARRAY (:func:`window_fingerprint_arrays` — the per-doc
    ``array_distinct`` replaces the r4 corpus-wide ``distinct()``
    shuffle), and that compact one-row-per-doc frame is the single
    localCheckpoint — materialization ∝ documents, not windows.
    Document frequency per fingerprint is a ``groupBy("wh").count()``
    over the re-exploded posting list — partial aggregation collapses a
    boilerplate window carried by 10^7 docs to one row per map task
    before the exchange, where a ``count().over(partitionBy("wh"))``
    window would funnel every carrier of the hot key into a single sort
    task (straggler/OOM at 100× scale).  The duplicated-window id set
    (df ≥ 2, ≪ corpus by construction) joins back under the
    ``broadcast_keys`` tri-state gate — pinned broadcast, forced shuffle,
    or auto by count — then one doc-keyed groupBy finishes.  Cost ∝
    tokens / ``stride`` (the scale knob: production substring dedup runs
    stride 4-16 then verifies hits), never all-pairs."""
    arr = materialize(
        window_fingerprint_arrays(df, window, stride, tokens_col, id_col)
    )
    wins = arr.select("doc_id", F.explode("whs").alias("wh"))
    # wins is distinct per (doc, wh), so a plain count per wh group IS
    # the number of docs carrying that window
    dup_whs = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= 2)
        .select("wh")
    )
    marked = wins.join(
        gated_broadcast(
            dup_whs.withColumn("_dup", F.lit(1)),
            broadcast_keys,
            broadcast_key_limit,
        ),
        "wh",
        "left",
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_win"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0)).cast("long")).alias("n_dup"),
        )
        .filter(F.col("n_dup") > 0)
    )


def shard_assign(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Deterministic training-shard assignment: shard = portable hash of
    the doc id mod ``n_shards`` (stable across runs/engines/cluster
    sizes; adding docs never moves existing ones).  Returns per-shard
    document and token totals plus ``balance_pml`` — shard tokens as ‰
    of the ideal even split, integer math so two engines agree exactly.
    Hash sharding is the 10^10-doc regime's answer to balanced packing:
    no sequential bin-packing state, and the law of large numbers keeps
    shards within a few ‰ of ideal (which this op *measures* rather than
    assumes).  The physical write is ``df.repartition(n_shards, shard)``
    + sortWithinPartitions — same column, no extra shuffle."""
    K = int(n_shards)
    per = (
        df.select(
            shard_expr(id_col, K).alias("shard"),
            F.col(n_tok_col).cast("long").alias("n_tok"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("shard_tok"),
        )
    )
    total = per.agg(F.sum("shard_tok").cast("long").alias("_total"))
    return per.crossJoin(F.broadcast(total)).select(
        "shard",
        "n_docs",
        "shard_tok",
        # ‰ of ideal, floor-divided in BIGINT (`DIV`, never double
        # division — exact past 2^53 and identical to DuckDB's `//`);
        # a token-empty corpus yields 0‰, not NULL/divide-by-zero
        F.expr(
            f"CASE WHEN _total > 0 THEN shard_tok * {K} * 1000 DIV _total"
            f" ELSE 0 END"
        ).alias("balance_pml"),
    )


def mixture_weights(
    df: DataFrame,
    token_budget: int = 1_000_000,
    source_col: str = "source",
    n_tok_col: str = "n_tok",
) -> DataFrame:
    """Temperature-scaled domain-mixture weights (the multilingual /
    multi-domain sampling rule p_i ∝ c_i^α): per-source token counts →
    sampling weight → token allocation for a ``token_budget`` draw.

    Pinned to α = 1/2 with integer quantization so the result is
    engine-exact: IEEE sqrt is correctly rounded (identical in every
    engine), the floor makes it an integer, and from there the weights
    are pure BIGINT ratios — no cross-engine pow()/summation-order
    drift.  The library accepts any α via the same plan; the oracle
    contract covers the α=1/2 instance."""
    per = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.col(n_tok_col).cast("long")).alias("n_tok")
    )
    s = F.floor(F.sqrt(F.col("n_tok").cast("double"))).cast("long")
    scaled = per.withColumn("s", s)
    denom = scaled.agg(F.sum("s").cast("long").alias("_den"))
    B = int(token_budget)
    return (
        scaled.crossJoin(F.broadcast(denom))
        .select(
            "source",
            "n_tok",
            # a token-empty corpus (every s = 0) gets zero weights, not
            # NULL/divide-by-zero
            F.expr(
                "CASE WHEN _den > 0 THEN s * 1000000 DIV _den ELSE 0 END"
            ).alias("weight_ppm"),
            F.expr(
                f"CASE WHEN _den > 0 THEN s * {B} DIV _den ELSE 0 END"
            ).alias("tok_alloc"),
        )
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


def collapse_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
    broadcast_losers: bool | None = None,
    broadcast_loser_limit: int = 4_000_000,
) -> DataFrame:
    """The dedup chain's final action: given the corpus and its
    near-duplicate ``pairs`` (from :func:`dup_doc_pairs`, MinHash-LSH,
    or embedding dedup), keep exactly one survivor — the minimum id —
    per clone family and every untouched document.

    Shape: :func:`dup_clusters` resolves components, the loser set
    (``doc_id != cluster_id``, bounded by the docs appearing in pairs —
    ≪ corpus) anti-joins the corpus under the usual tri-state broadcast
    gate.  The corpus itself is never shuffled: with the broadcast the
    anti-join is map-side."""
    clusters = dup_clusters(pairs, a_col=a_col, b_col=b_col, max_iters=max_iters)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(
        gated_broadcast(losers, broadcast_losers, broadcast_loser_limit),
        id_col,
        "left_anti",
    )
