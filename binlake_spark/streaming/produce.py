"""Ordered produce: the reference's per-key ordering guarantee,
Spark-shaped.

BinLake's headline delivery contract is that all changes for one key
reach the message queue **in binlog order**: the key generator picks the
business/primary key (IKeyGenerator.java:22), ``hash(key) & 1023``
selects the MQ partition (HashUtils.java:30-133), and each partition's
producer queue emits sequentially (ProtobufConverter → IProducer).  The
Spark rebuild makes the same promise with two plan primitives and one
fused pass:

1. one shuffle clustering on the partition id (``repartition(N, pt)``),
2. ``sortWithinPartitions(pt, seq)`` — binlog order inside each
   partition,
3. the Avro envelope encode runs in the SAME ``mapInArrow`` pass that
   stamps ``emit_idx``, a *physical* per-partition counter.  Because
   ``mapInArrow`` is a narrow transformation, ``emit_idx`` records the
   true emission order — if the sort or clustering were broken, the
   recorded order would be broken, so tests and the driver oracle verify
   the guarantee itself, not a window-function simulation of it.

Scale posture: exactly one shuffle sized to the events, sort is
per-partition (spillable), Python cost is the envelope encode inside
Arrow batches.  Skewed keys land in one partition by design — the
contract *requires* same-key ordering, so parallelism comes from N
partitions, as in the reference (1024 queues).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def partition_for_key(key_col: str, num_partitions: int, portable: bool = False):
    """MQ partition id for a key: JVM Murmur3 (`F.hash`, the
    HashUtils & 1023 analog) by default; ``portable=True`` uses a 60-bit
    md5 prefix so external engines (the DuckDB oracle) reproduce the
    same assignment bit-for-bit."""
    if portable:
        h = F.conv(F.substring(F.md5(F.col(key_col)), 1, 15), 16, 10).cast("long")
    else:
        h = F.hash(F.col(key_col))
    return F.pmod(h, F.lit(num_partitions)).cast("int")


def ordered_produce(
    df: DataFrame,
    num_partitions: int,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    portable: bool = False,
    format: str = "avro",
) -> DataFrame:
    """Emit (pt, emit_idx, key, seq, value) produce records, per-key
    ordered within each partition.  ``emit_idx`` is the physical emission
    counter (see module doc) — dense 0..n-1 per partition in the actual
    row order the producer would see.

    ``format``: ``"avro"`` (envelope record, column ``avro``) or
    ``"proto"`` (one WaveEntry per row, column ``entry`` — the
    reference's BUSINESS_KEY_ORDER dispatch requires the per-row
    converter, MQRule.java:216-222 → formatByOneRow)."""
    import pyarrow as pa

    from binlake_spark.functions.avro_codec import ENVELOPE_SCHEMA, encode

    if format not in ("avro", "proto"):
        raise ValueError(f"format must be 'avro' or 'proto', got {format!r}")
    val_col = "avro" if format == "avro" else "entry"

    clustered = (
        df.withColumn("pt", partition_for_key(key_col, num_partitions, portable))
        .repartition(num_partitions, "pt")
        .sortWithinPartitions("pt", seq_col)
    )

    out_schema = T.StructType(
        [
            T.StructField("pt", T.IntegerType(), False),
            T.StructField("emit_idx", T.LongType(), False),
            T.StructField("key", T.StringType(), False),
            T.StructField(seq_col, T.LongType(), False),
            T.StructField(val_col, T.BinaryType(), False),
        ]
    )

    def _encode_row(d, i, n):
        if format == "avro":
            from binlake_spark.functions.avro_codec import envelope_record

            return encode(ENVELOPE_SCHEMA, envelope_record(d, i, n, key_col, seq_col))
        from binlake_spark.functions.proto_codec import pack_entries

        tokens = d.get("tokens", [None] * n)[i]
        if tokens is None and d.get("payload", [None] * n)[i] is not None:
            import numpy as np

            tokens = np.frombuffer(d["payload"][i], dtype="<i4").tolist()
        row = {
            "op": d.get("op", ["I"] * n)[i],
            "doc_id": d[key_col][i],
            "tokens": tokens,
            "n_tok": d.get("n_tok", [None] * n)[i],
            "source": d.get("source", [None] * n)[i],
            "seq": d[seq_col][i],
        }
        return pack_entries([row], max_packet_size=0)[0][3]

    def fn(batches):
        # per (Spark-)partition physical counters, one per pt value:
        # several pt ids can share a Spark partition (pmod collisions) —
        # each keeps its own dense emission counter, like one producer
        # queue per MQ partition
        counters: dict[int, int] = {}
        for b in batches:
            d = b.to_pydict()
            n = b.num_rows
            idxs, vals = [], []
            for i in range(n):
                pt = d["pt"][i]
                idxs.append(counters.get(pt, 0))
                counters[pt] = idxs[-1] + 1
                vals.append(_encode_row(d, i, n))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(d["pt"], type=pa.int32()),
                    pa.array(idxs, type=pa.int64()),
                    pa.array(d[key_col], type=pa.string()),
                    pa.array(d[seq_col], type=pa.int64()),
                    pa.array(vals, type=pa.binary()),
                ],
                names=["pt", "emit_idx", "key", seq_col, val_col],
            )

    return clustered.mapInArrow(fn, out_schema)
