"""IVF (inverted-file) ANN — trained coarse quantizer + cell-pruned probe.

The scale path past brute force and past one-shot LSH buckets: a coarse
k-means quantizer is trained distributed (Lloyd iterations, deterministic
init), every vector is assigned to its nearest cell (``max_by`` — an
aggregation with map-side combine, NO per-key window sort), and a query
probes only its ``nprobe`` nearest cells with an exact rerank inside.

At 10^9 vectors the cell assignment is partition pruning: a probe touches
nprobe/K of the data.  Everything stays JVM-side (``zip_with`` /
``aggregate`` dots, ``posexplode``-mean recompute); centroids are K rows
and ride broadcast joins — nothing data-sized collects to the driver.

Determinism: init picks the K rows with the smallest (hash(id), id) —
reproducible across runs and cluster sizes; Lloyd's update (elementwise
mean) and the max_by assignment (ties broken by lowest cell id) are both
order-independent, so the trained index is stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..checkpointing import materialize

from binlake_spark.operators.similarity import _as_double, _dot, _norm


def _sqnorm(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def ivf_train(
    df: DataFrame,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train K coarse centroids: deterministic init + ``iters`` Lloyd
    rounds.  Returns (cid, _c) — K rows, broadcastable."""
    e = df.select(F.col(id_col).alias("_id"), _as_double(vec_col).alias("_v"))
    # distributed top-K (TakeOrderedAndProject — no global sort), then
    # number the K survivors with a window over just K rows
    hkey = F.pmod(F.hash(F.col("_id")), F.lit(1 << 30))
    init = e.select("_id", "_v", hkey.alias("_h")).orderBy("_h", "_id").limit(k)
    w = W.orderBy("_h", "_id")
    cents = (
        init.withColumn("_rk", F.row_number().over(w))
        .select((F.col("_rk") - 1).cast("int").alias("cid"), F.col("_v").alias("_c"))
    )
    # each Lloyd round truncates lineage (checkpointing.materialize —
    # local or reliable per the module knob): iterative plans otherwise
    # grow a nested crossJoin+agg per round, and every consumer would
    # re-run the whole training; K rows, trivial to store
    cents = materialize(cents)
    for _ in range(iters):
        assigned = _assign(e, cents)
        # elementwise mean per cell: posexplode → per-(cell,pos) avg →
        # re-assemble sorted; empty cells drop (standard Lloyd)
        pos = assigned.select("cell", F.posexplode("_v").alias("pos", "x"))
        means = pos.groupBy("cell", "pos").agg(F.avg("x").alias("m"))
        cents = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s"))
            .select(
                F.col("cell").alias("cid"),
                F.transform("s", lambda t: t["m"]).alias("_c"),
            )
        )
        cents = materialize(cents)
    return cents


def _assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest cell per vector by L2 (argmax of 2v·c − |c|²) via max_by —
    one aggregation, map-side combinable, no per-key sort anywhere."""
    scored = e.crossJoin(F.broadcast(cents)).select(
        "_id",
        "_v",
        "cid",
        (2 * _dot(F.col("_v"), F.col("_c")) - _sqnorm(F.col("_c"))).alias("_s"),
    )
    ordk = F.struct(F.col("_s").alias("s"), (-F.col("cid")).alias("t"))
    return scored.groupBy("_id").agg(
        F.max_by(F.struct(F.col("cid").alias("cell"), F.col("_v").alias("_v")), ordk).alias("w")
    ).select("_id", F.col("w.cell").alias("cell"), F.col("w._v").alias("_v"))


def ivf_assign(
    df: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, _v) — the inverted file.  In a lake layout this column
    is the partition key, so a probe is partition pruning."""
    e = df.select(F.col(id_col).alias("_id"), _as_double(vec_col).alias("_v"))
    return _assign(e, cents).withColumnRenamed("_id", id_col)


def ivf_search(
    df: DataFrame,
    query_id,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by cosine: probe the query's ``nprobe`` nearest
    cells, exact rerank inside them.  Pass a pre-trained ``cents`` to
    amortize training across queries (the production shape)."""
    if cents is None:
        cents = ivf_train(df, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col)
    inv = ivf_assign(df, cents, id_col, vec_col)
    qv = df.filter(F.col(id_col) == query_id).select(
        _as_double(vec_col).alias("_q")
    )
    qcells = (
        qv.crossJoin(F.broadcast(cents))
        .select(
            "cid",
            "_q",
            (2 * _dot(F.col("_q"), F.col("_c")) - _sqnorm(F.col("_c"))).alias("_s"),
        )
        .orderBy(F.col("_s").desc(), "cid")
        .limit(nprobe)
        .select(F.col("cid").alias("cell"), "_q")
    )
    cand = inv.join(F.broadcast(qcells), "cell")
    scored = cand.select(
        id_col,
        (
            _dot(F.col("_v"), F.col("_q")) / (_norm(F.col("_v")) * _norm(F.col("_q")))
        ).alias("cosine"),
    )
    return (
        scored.filter(F.col(id_col) != query_id)
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
        .select(id_col, F.round("cosine", 6).alias("cosine"))
    )
