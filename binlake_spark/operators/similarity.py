"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k against a query vector.
  The dot product runs JVM-side (``zip_with`` + ``aggregate`` — no Python
  boundary); the query rides in as a broadcast single-row cross join, so
  the plan is one map-side pass + a top-k (``orderBy … limit`` compiles to
  TakeOrderedAndProject — no full sort).
- :func:`ann_lsh` — random-hyperplane LSH: deterministic integer
  hyperplanes (seeded affine arithmetic, reproducible across engines and
  runs), bucket by sign signature, search only the query's bucket(s),
  rerank exactly.  The scale path: the bucket join replaces the full scan;
  recall is tunable by bits/probes.
- :func:`pairwise_cosine_dups` — embedding near-dup pairs ≥ τ via the
  same LSH buckets (candidates) + exact rerank.

All math stays on Arrow/JVM vectors; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def cosine_topk(
    df: DataFrame,
    query_id,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against the row whose id == query_id."""
    e = df.select(F.col(id_col), _as_double(vec_col).alias("_v"))
    q = e.filter(F.col(id_col) == query_id).select(
        F.col("_v").alias("_q"), _norm(F.col("_v")).alias("_qn")
    )
    scored = e.crossJoin(F.broadcast(q)).select(
        id_col,
        (
            _dot(F.col("_v"), F.col("_q"))
            / (_norm(F.col("_v")) * F.col("_qn"))
        ).alias("cosine"),
    )
    return (
        scored.filter(F.col(id_col) != query_id)
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
    )


def _hyperplane_proj(vec: Column, dim: int, bit: int, seed: int) -> Column:
    """Projection of ``vec`` onto deterministic integer hyperplane ``bit``.
    w[i][j] = ((i*73856093 + j*19349663 + seed*83492791) % 13) - 6 —
    small integer weights, reproducible everywhere."""

    def w(x, j):
        coeff = (
            F.pmod(
                F.lit(bit * 73856093) + j * F.lit(19349663) + F.lit(seed * 83492791),
                F.lit(13),
            )
            - 6
        )
        return x * coeff.cast("double")

    return F.aggregate(
        F.zip_with(vec, F.sequence(F.lit(0), F.lit(dim - 1)), w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _hyperplane_sig(vec: Column, dim: int, bits: int, seed: int) -> Column:
    """Sign signature under `bits` deterministic integer hyperplanes."""
    sig = F.lit(0).cast("long")
    for i in range(bits):
        proj = _hyperplane_proj(vec, dim, i, seed)
        sig = sig + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return sig


def lsh_bucketize(
    df: DataFrame,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, bucket) with bucket = hyperplane sign signature."""
    return df.select(
        id_col,
        _as_double(vec_col).alias("_v"),
        _hyperplane_sig(_as_double(vec_col), dim, bits, seed).alias("bucket"),
    )


def ann_lsh(
    df: DataFrame,
    query_id,
    dim: int,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search the query's LSH bucket(s), exact rerank
    inside.  Returns (id, cosine) — a subset of the brute-force result
    whose recall grows as bits shrink or ``probes`` grows.

    ``probes`` > 1 is standard multiprobe: in addition to the query's own
    bucket, probe the buckets reached by flipping the query's
    lowest-|margin| signature bits (the hyperplanes the query sits closest
    to — where its true neighbors most likely landed on the other side).
    The probe set is built on the single query row and broadcast, so extra
    probes cost extra *bucket* scans, never a full-table scan."""
    b = lsh_bucketize(df, dim, bits, seed, id_col, vec_col)
    projs = F.array(
        *[_hyperplane_proj(F.col("_v"), dim, i, seed) for i in range(bits)]
    )
    q = b.filter(F.col(id_col) == query_id).select(
        F.col("_v").alias("_q"),
        _norm(F.col("_v")).alias("_qn"),
        F.col("bucket").alias("_qb0"),
        projs.alias("_projs"),
    )
    if probes > 1:
        # bits ranked by |margin| ascending; flip the (probes-1) closest
        ranked = F.transform(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda j: F.struct(
                F.abs(F.element_at(F.col("_projs"), j + 1)).alias("m"),
                j.alias("j"),
            ),
        )
        flips = F.slice(F.array_sort(ranked), 1, probes - 1)
        probe_arr = F.concat(
            F.array(F.col("_qb0")),
            F.transform(
                flips,
                # 2^j as a long (shiftleft needs a literal shift amount)
                lambda s: F.col("_qb0").bitwiseXOR(
                    F.pow(F.lit(2.0), s["j"].cast("double")).cast("long")
                ),
            ),
        )
        q = q.select("_q", "_qn", F.explode(probe_arr).alias("_qb"))
    else:
        q = q.select("_q", "_qn", F.col("_qb0").alias("_qb"))
    cand = b.join(F.broadcast(q), b.bucket == F.col("_qb"))
    scored = cand.select(
        id_col,
        (_dot(F.col("_v"), F.col("_q")) / (_norm(F.col("_v")) * F.col("_qn"))).alias(
            "cosine"
        ),
    )
    return (
        scored.filter(F.col(id_col) != query_id)
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
    )


def pairwise_cosine_dups(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: LSH-bucket candidates (same sign
    signature) + exact cosine rerank ≥ threshold."""
    b = lsh_bucketize(df, dim, bits, seed, id_col, vec_col)
    left = b.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), "bucket")
    right = b.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), "bucket")
    cand = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = cand.select(
        "id_a",
        "id_b",
        (
            _dot(F.col("_va"), F.col("_vb"))
            / (_norm(F.col("_va")) * _norm(F.col("_vb")))
        ).alias("cosine"),
    )
    return scored.filter(F.col("cosine") >= threshold).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )
