"""Change-batch compaction: per-key last-writer-wins net changes.

The reference guarantees per-key ordering by construction (single binlog
reader + hash-affine producer queues, IKeyGenerator.java:42-143,
BinlogWorker.initPartition:250-258) and leaves dedup to consumers.  Here
ordering is data (the ``seq`` column) and compaction reduces an arbitrary
event batch to **at most one row per key** — the winner under
``max(seq)`` — before the MERGE, so copy-on-write cost is bounded by the
number of *distinct* keys, not events (the packet-batching analog,
ProtobufConverter.java:549-729).

Three physical strategies, semantically identical (property-tested):

- ``strategy="agg"`` — built-in ``max_by`` aggregate.  Whole-stage
  codegen, map-side partial aggregation, one shuffle on the key.  With
  ``salt > 1`` it runs **two-stage**: partial winners per (key, salt) —
  the salt is derived from ``seq`` so a hot key's events spread over
  ``salt`` reducers — then the global winner per key.  ``max`` is
  associative/commutative, so salting cannot change the result; that
  invariance is what makes the skew fix safe (SURVEY §7 hard-point 3).
  Caveat at scale: the aggregation buffer holds the **whole payload** per
  key, so every event's payload crosses the shuffle, and with key counts
  near rows-per-task the map-side combine stops helping.
- ``strategy="joinback"`` — the wide-payload plan: aggregate only
  ``(key, max(seq))`` (a few-bytes-per-row shuffle with near-perfect
  map-side combine — hot keys collapse to one row per map task, no salt
  needed), then inner-join the winners back against the source to fetch
  the winning payloads, then drop retransmit duplicates of the winning
  row.  Payloads never enter the aggregation shuffle: with AQE the tiny
  winner side broadcasts; beyond broadcast size Spark's runtime bloom
  filter (``spark.sql.optimizer.runtime.bloomFilter.enabled``) prunes the
  probe scan to ~|winners| rows before any exchange.  At events ≫ keys
  this moves |keys| payloads instead of |events| payloads.
- :func:`compact_lww_pandas` — ``applyInPandas`` per key-group, the
  Arrow-vectorized form (kept for parity with the north star's
  "change-batch compaction" UDF family and as an extension point for
  semantics SQL can't express, e.g. before-image reconciliation).

``strategy="auto"`` picks joinback when the payload carries variable-width
columns (binary/array/map/string payloads — the token-sequence case) and
the cheap single-shuffle agg otherwise.

Retransmit duplicates (same (key, seq) re-emitted verbatim) are absorbed
by every path: any of the identical rows may win, and they are identical.
``seq`` must be a total order over *distinct* events (the binlog file/pos
flattening guarantees this, LogPosition.java:38-44): two different rows
never share one (key, seq).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WIDE = (T.BinaryType, T.ArrayType, T.MapType, T.StringType, T.StructType)


def compact_lww(
    df: DataFrame,
    key: str = "doc_id",
    seq_col: str = "seq",
    salt: int | None = None,
    strategy: str = "auto",
    broadcast_winners: bool = True,
) -> DataFrame:
    """Reduce an event batch to one winning row per key (LWW by seq).

    ``broadcast_winners`` (joinback only): hint the winner key-set to the
    build side of a broadcast hash join — the probe (payload) side is then
    never shuffled.  Winners per micro-batch are bounded by backpressure
    (maxFilesPerTrigger), so the hint is safe for the streaming engine;
    set False for unbounded batch replays with ≳10^7 distinct keys, where
    AQE + the runtime bloom filter prune the probe shuffle instead.

    ``seq`` must be non-null: a null seq cannot be ordered, and the
    physical strategies would otherwise disagree on it (``max`` ignores
    nulls so joinback's equi-join on (key, max(seq)) drops an all-null
    key, while ``max_by`` keeps one row).  Null-seq rows are therefore
    filtered up front — uniformly, in every strategy.
    """
    df = df.filter(F.col(seq_col).isNotNull())
    if strategy == "auto":
        if salt and salt > 1:
            strategy = "agg"  # salting only applies to the agg plan
        else:
            wide = any(
                isinstance(f.dataType, _WIDE)
                for f in df.schema.fields
                if f.name not in (key, seq_col)
            )
            strategy = "joinback" if wide else "agg"
    if strategy == "joinback":
        winners = df.groupBy(key).agg(F.max(seq_col).alias(seq_col))
        if broadcast_winners:
            winners = F.broadcast(winners)
        return df.join(winners, [key, seq_col], "inner").dropDuplicates([key])
    payload_cols = [c for c in df.columns if c != key]
    packed = F.struct(*[F.col(c) for c in payload_cols]).alias("_p")
    if salt and salt > 1:
        stage1 = (
            df.groupBy(
                F.col(key),
                F.pmod(F.hash(F.col(seq_col)), F.lit(salt)).alias("_salt"),
            )
            .agg(F.max_by(packed, F.col(seq_col)).alias("_p"))
        )
        winners = stage1.groupBy(key).agg(
            F.max_by(F.col("_p"), F.col(f"_p.{seq_col}")).alias("_p")
        )
    else:
        winners = df.groupBy(key).agg(
            F.max_by(packed, F.col(seq_col)).alias("_p")
        )
    return winners.select(key, "_p.*")


def dedup_first_arrow(df: DataFrame, key: str, batch_fn=None, out_schema=None) -> DataFrame:
    """Keep the first row per key *within each partition* — one Arrow pass,
    no shuffle, no per-row Python.

    Correct as a global dedup only when rows of one key are already
    colocated (e.g. after ``repartition`` on the key or on a deterministic
    function of it, like the storage bucket).  The whole partition is
    concatenated in memory; callers bound partition size (winners/P rows).

    ``batch_fn`` (RecordBatch → RecordBatch, with ``out_schema``) fuses a
    further vectorized transform (e.g. payload decode) into the same
    Python/Arrow round trip — winners cross the JVM↔Arrow boundary once.
    """
    schema = out_schema or df.schema

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        batches = [b for b in batches if b.num_rows]
        if not batches:
            return
        tbl = pa.Table.from_batches(batches).combine_chunks()
        enc = pc.dictionary_encode(tbl.column(key).chunk(0))
        idx = enc.indices.to_numpy(zero_copy_only=False)
        _, first = np.unique(idx, return_index=True)
        out = tbl.take(pa.array(np.sort(first)))
        for b in out.to_batches():
            yield batch_fn(b) if batch_fn is not None else b

    return df.mapInArrow(fn, schema)


def compact_lww_bucketed(
    df: DataFrame,
    key: str = "doc_id",
    seq_col: str = "seq",
    bucket_col_expr=None,
    num_partitions: int | None = None,
    broadcast_winners: bool = True,
    batch_fn=None,
    out_schema=None,
) -> DataFrame:
    """Joinback compaction that lands winners **already clustered by their
    storage bucket** (`_bucket` column attached), so the downstream
    copy-on-write write needs no further exchange — survivors stream from
    bucket files to bucket files and only the |winners|-sized net side is
    ever shuffled (once, here).

    This is the one wide shuffle of the epoch; everything else is narrow.
    """
    # non-null seq contract, as in compact_lww: unorderable rows are
    # dropped uniformly rather than strategy-dependently
    df = df.filter(F.col(seq_col).isNotNull())
    winners = df.groupBy(key).agg(F.max(seq_col).alias(seq_col))
    if broadcast_winners:
        winners = F.broadcast(winners)
    matched = df.join(winners, [key, seq_col], "inner")
    if bucket_col_expr is not None:
        matched = matched.withColumn("_bucket", bucket_col_expr)
    part = matched.repartition(num_partitions or 32, "_bucket")
    # same-key rows share a bucket, so partition-local first == global LWW;
    # batch_fn (e.g. payload decode) fuses into the same Arrow pass
    return dedup_first_arrow(part, key, batch_fn=batch_fn, out_schema=out_schema)


def compact_lww_pandas(
    df: DataFrame,
    key: str = "doc_id",
    seq_col: str = "seq",
) -> DataFrame:
    """Arrow-vectorized compaction: per-group pandas, no per-row Python.

    Used as the semantic twin of :func:`compact_lww` in property tests and
    as the hook where non-SQL compaction logic (e.g. before/after image
    merging for partial-update events) would live.
    """
    import pandas as pd  # noqa: F401 — imported on executors

    schema = df.schema

    def last_writer(pdf):
        return pdf.sort_values(seq_col, kind="stable").tail(1)

    return df.groupBy(key).applyInPandas(last_writer, schema=schema)
