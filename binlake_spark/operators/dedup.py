"""Deduplication operators for training-data pipelines.

Four families, all pure DataFrame ops (no UDFs — every hash is Spark's
built-in xxhash64/murmur3, every join declarative so Catalyst/AQE pick
broadcast vs sort-merge and split skewed partitions):

- :func:`exact_dedup` — hash-groupBy on content.
- :func:`minhash_lsh` — word-shingle MinHash signatures + banded LSH
  candidate generation + exact-Jaccard verification of candidates.
- :func:`simhash` / :func:`simhash_near_dups` — 64-bit SimHash with
  banded Hamming-distance candidate join.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard via posting-list
  self-join (the non-approximate baseline the sketches are judged
  against).

Scale notes (the 100 TB story):
- shingling explodes ~n_words rows per doc; the groupBy that follows is
  the only wide shuffle and is partial-aggregated map-side.
- LSH candidate joins are equi-joins on (band, signature) — posting lists
  bound the join fan-out; a df-cap drops degenerate shingles (stop-gram
  posting lists) the way common-crawl dedup pipelines do.
- nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: the affine rehash domain.  31-bit values keep
# every product below 2^62, safe under ANSI-mode long arithmetic.
_P = 2147483647


def _shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct word n-gram 64-bit hashes per doc: (id, gh)."""
    # sequence(0, -1) is a DESCENDING range in Spark and its i=-1 slice
    # throws at runtime — a doc shorter than n words has zero n-grams
    w = f"split({text_col}, ' ')"
    grams = F.expr(
        f"CASE WHEN size({w}) >= {n}"
        f" THEN transform(sequence(0, size({w}) - {n}),"
        f"      i -> concat_ws(' ', slice({w}, i + 1, {n})))"
        f" ELSE CAST(array() AS array<string>) END"
    )
    return (
        df.select(F.col(id_col).alias("_id"), F.explode(grams).alias("_g"))
        .select("_id", F.xxhash64("_g").alias("_gh"))
        .distinct()
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct content: (keep_id, n_dupes, content_hash)."""
    return (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dupes"))
        .select("keep_id", "n_dupes", F.xxhash64(text_col).alias("content_hash"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, m0..m{K-1}) MinHash signature per doc — K affine rehashes of
    the shingle hash, one groupBy with K partial-aggregated mins."""
    sh = _shingles(df, id_col, text_col, shingle_n).withColumn(
        "_g31", F.pmod(F.col("_gh"), F.lit(_P))
    )
    # deterministic affine coefficients from the seed (odd a, both < 2^31)
    aggs = []
    for i in range(num_hashes):
        a = (2 * (seed * 1_000_003 + i * 7_919) + 1) % _P
        b = (seed * 31_337 + i * 104_729) % _P
        aggs.append(
            F.min(F.pmod(F.col("_g31") * F.lit(a) + F.lit(b), F.lit(_P))).alias(f"m{i}")
        )
    return sh.groupBy(F.col("_id").alias(id_col)).agg(*aggs)


def minhash_lsh(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs: banded LSH candidates, then exact-Jaccard verify.

    Returns (doc_a, doc_b, jaccard) with jaccard ≥ threshold.  The band
    join only proposes pairs agreeing on all rows of some band (r =
    num_hashes/bands), the classic S-curve; the verify pass computes true
    Jaccard on the shingle posting lists so the output has no false
    positives (candidates only gate cost, not correctness).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n, seed)

    band_rows = []
    for b in range(bands):
        cols = [F.col(f"m{b * r + j}") for j in range(r)]
        band_rows.append(
            sig.select(
                F.col(id_col).alias("_id"),
                F.lit(b).alias("_band"),
                F.xxhash64(F.concat_ws("_", *[c.cast("string") for c in cols])).alias(
                    "_bsig"
                ),
            )
        )
    banded = band_rows[0]
    for extra in band_rows[1:]:
        banded = banded.unionAll(extra)

    left = banded.select(F.col("_id").alias("doc_a"), "_band", "_bsig")
    right = banded.select(F.col("_id").alias("doc_b"), "_band", "_bsig")
    cand = (
        left.join(right, ["_band", "_bsig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    sh = _shingles(df, id_col, text_col, shingle_n)
    cnt = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    inter = (
        sh.select(F.col("_id").alias("doc_a"), "_gh")
        .join(cand, "doc_a")
        .join(sh.select(F.col("_id").alias("doc_b"), "_gh"), ["doc_b", "_gh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    return (
        inter.join(cnt.select(F.col("_id").alias("doc_a"), F.col("_n").alias("_na")), "doc_a")
        .join(cnt.select(F.col("_id").alias("doc_b"), F.col("_n").alias("_nb")), "doc_b")
        .withColumn(
            "jaccard",
            F.col("_i").cast("double") / (F.col("_na") + F.col("_nb") - F.col("_i")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per doc: (id, simhash).

    Per word-token hash h, each output bit is the sign of the sum of ±1
    over that bit across tokens.  Bits are folded JVM-side with 64
    conditional-sum aggregates (partial-aggregated — one shuffle)."""
    tok = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("_w"),
    ).select("_id", F.xxhash64("_w").alias("_h"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = tok.groupBy(F.col("_id").alias(id_col)).agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63))).otherwise(0)
    return sums.select(id_col, sig.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming via 4×16-bit banding:
    two signatures within distance 3 must agree on ≥1 of 4 bands
    (pigeonhole), so the candidate join is an equi-join per band."""
    sig = simhash(df, id_col, text_col)
    bands = []
    for b in range(4):
        chunk = F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF))
        bands.append(
            sig.select(F.col(id_col).alias("_id"), F.col("simhash"),
                       F.lit(b).alias("_band"), chunk.alias("_chunk"))
        )
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionAll(extra)
    left = banded.select(F.col("_id").alias("doc_a"), F.col("simhash").alias("_sa"), "_band", "_chunk")
    right = banded.select(F.col("_id").alias("doc_b"), F.col("simhash").alias("_sb"), "_band", "_chunk")
    cand = (
        left.join(right, ["_band", "_chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "_sa", "_sb")
        .distinct()
    )
    ham = F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
    broadcast_drop: bool | None = None,
    broadcast_drop_limit: int = 4_000_000,
) -> DataFrame:
    """Exact n-gram Jaccard via posting-list self-join.  ``max_df`` drops
    stop-grams whose posting lists would blow up the join (documented cap:
    a pair sharing only ultra-common grams can be missed).

    The cap is applied as an ANTI-join against the DROP set (grams with
    df > ``max_df``) rather than an inner join against the keep set: the
    keep set is nearly every distinct gram (corpus-sized — joining it
    back reshuffles the whole posting list), while the drop set is the
    handful of boilerplate grams, small enough to broadcast under the
    usual tri-state gate — the join-back then costs no shuffle at all."""
    from binlake_spark.checkpointing import materialize
    from binlake_spark.operators.tokens import gated_broadcast

    # materialize the posting list once: it feeds the doc-size aggregate,
    # the stop-gram df aggregate, and BOTH sides of the candidate
    # self-join — without this the shingle explode+distinct re-runs for
    # each of its four consumers
    sh = materialize(_shingles(df, id_col, text_col, n))
    cnt = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    if max_df is not None:
        drop = (
            sh.groupBy("_gh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("_gh")
        )
        sh_j = sh.join(
            gated_broadcast(drop, broadcast_drop, broadcast_drop_limit),
            "_gh",
            "left_anti",
        )
    else:
        sh_j = sh
    inter = (
        sh_j.select(F.col("_id").alias("doc_a"), "_gh")
        .join(sh_j.select(F.col("_id").alias("doc_b"), "_gh"), "_gh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    return (
        inter.join(cnt.select(F.col("_id").alias("doc_a"), F.col("_n").alias("_na")), "doc_a")
        .join(cnt.select(F.col("_id").alias("doc_b"), F.col("_n").alias("_nb")), "doc_b")
        .withColumn(
            "jaccard",
            F.col("_i").cast("double") / (F.col("_na") + F.col("_nb") - F.col("_i")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def drop_duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 8,
    max_docs: int = 1,
    strategy: str = "auto",
    filter_max_drop: int = 256,
) -> DataFrame:
    """Cross-corpus duplicate-LINE removal (the RefinedWeb/CCNet
    boilerplate pass — finer than document dedup: a page is kept but its
    nav bars / cookie banners / footers that repeat across the corpus
    are cut).  The corpus here has no newlines, so a "line" is a fixed
    window of ``words_per_line`` consecutive words (the tail shorter
    than a full window is outside the line segmentation and untouched —
    documented contract, same as the gram builders dropping short docs).

    A line is boilerplate when it appears in more than ``max_docs``
    DISTINCT documents.  Returns ``(id, n_lines, n_kept, kept_text)``
    with ``kept_text`` the surviving lines joined by newline.

    Shared first stage: per-doc line arrays are built row-local (total
    CASE expression — ``sequence(1, 0)`` is a *descending* range in
    Spark, so the zero-full-lines doc must short-circuit to ``array()``)
    and materialized once; the df count explodes ``array_distinct``
    (per-doc dedup map-side, so ``count(*)`` IS the distinct-doc count)
    and partial-aggregates — shuffle ∝ distinct lines.  The drop set
    (df > ``max_docs``) is boilerplate-bounded and always broadcast.

    Two keep/drop strategies — measured crossover, not guesswork:

    - ``"filter"``: the drop set is folded to ONE broadcast array row
      and membership is a map-side per-line ``array_contains`` — ZERO
      corpus exchanges (the same inversion as
      :func:`ngram_jaccard_pairs`' df-cap anti-join).  Per-row cost is
      O(lines · |drop|) string compares, so this wins when the drop set
      is genuinely tiny relative to the corpus (per-row Spark
      expressions rebuild set-like structures per ROW —
      ``array_intersect`` measures barely better than the linear scan).
    - ``"join"``: ``posexplode_outer`` → broadcast-mark hash join
      (hash relation built once per task, O(1) per line) → ONE groupBy
      reassembling ``sort_array(collect_list(struct(pos, line)))`` —
      a single corpus-sized exchange, no join-back (the outer explode
      keeps zero-line docs alive; ``count``/``collect_list`` skip the
      null padding row).  This is the 100-TB default whenever the drop
      set is not tiny.
    - ``"auto"``: the drop set is counted anyway (it must be bounded
      before broadcasting); ≤ ``filter_max_drop`` picks ``filter``,
      else ``join``.
    """
    from binlake_spark.checkpointing import materialize

    if strategy not in ("auto", "filter", "join"):
        raise ValueError(f"unknown strategy {strategy!r}")
    w = f"split({text_col}, ' ')"
    k = int(words_per_line)
    lines_expr = F.expr(
        f"CASE WHEN size({w}) >= {k}"
        f" THEN transform(sequence(1, size({w}) DIV {k}),"
        f"      i -> concat_ws(' ', slice({w}, (i - 1) * {k} + 1, {k})))"
        f" ELSE CAST(array() AS array<string>) END"
    )
    docs = materialize(
        df.select(F.col(id_col).alias("_id"), lines_expr.alias("_lines"))
    )
    dfreq = materialize(
        docs.select(F.explode(F.array_distinct("_lines")).alias("_line"))
        .groupBy("_line")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > int(max_docs))
        .select("_line")
    )
    if strategy == "auto":
        strategy = "filter" if dfreq.count() <= int(filter_max_drop) else "join"

    if strategy == "filter":
        # one row holding the (sorted, deterministic) drop array; a
        # global agg always yields exactly one row, empty set included
        drop_arr = dfreq.agg(
            F.sort_array(F.collect_list("_line")).alias("_drop")
        )
        kept = F.filter(
            F.col("_lines"), lambda l: ~F.array_contains(F.col("_drop"), l)
        )
        return docs.crossJoin(F.broadcast(drop_arr)).select(
            F.col("_id").alias(id_col),
            F.size("_lines").cast("long").alias("n_lines"),
            F.size(kept).cast("long").alias("n_kept"),
            F.array_join(kept, "\n").alias("kept_text"),
        )

    ex = docs.select(
        "_id",
        F.size("_lines").alias("_nl"),
        F.posexplode_outer("_lines").alias("_pos", "_line"),
    )
    marked = ex.join(
        F.broadcast(dfreq.withColumn("_dup", F.lit(True))), "_line", "left"
    )
    keep = F.when(
        F.col("_line").isNotNull() & F.col("_dup").isNull(),
        F.struct("_pos", "_line"),
    )
    return (
        marked.groupBy("_id")
        .agg(
            F.first("_nl").cast("long").alias("n_lines"),
            F.transform(
                F.sort_array(F.collect_list(keep)), lambda s: s._line
            ).alias("_kept"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_lines",
            F.size("_kept").cast("long").alias("n_kept"),
            F.array_join("_kept", "\n").alias("kept_text"),
        )
    )
