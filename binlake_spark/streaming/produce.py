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

    from binlake_spark.functions.avro_codec import encode_envelope_batch

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

    def _encode_batch(d, n) -> list[bytes]:
        """Envelope-encode a whole Arrow batch at once.  Avro goes
        through the hand-inlined batch encoder (avro_codec.
        encode_envelope_batch — no per-row schema walk; jar-ful
        deployments should swap this mapInArrow value column for the
        spark-avro package's JVM ``to_avro(struct(...))``, which keeps
        the identical envelope layout and removes Python entirely);
        proto makes ONE ``pack_entries`` call per batch —
        ``max_packet_size=0`` flushes at every row, so the call yields
        exactly one WaveEntry per input row, in input order."""
        if format == "avro":
            return encode_envelope_batch(d, n, key_col, seq_col)
        from binlake_spark.functions.proto_codec import pack_entries

        tokens = d.get("tokens") or [None] * n
        payloads = d.get("payload") or [None] * n
        if any(t is None for t in tokens) and any(
            p is not None for p in payloads
        ):
            import numpy as np

            tokens = [
                t
                if t is not None
                else (
                    np.frombuffer(p, dtype="<i4").tolist()
                    if p is not None
                    else None
                )
                for t, p in zip(tokens, payloads)
            ]
        ops = d.get("op") or ["I"] * n
        ntoks = d.get("n_tok") or [None] * n
        sources = d.get("source") or [None] * n
        extras = d.get("extra") or [None] * n

        def _sql(i):
            ex = extras[i]
            if isinstance(ex, list):
                ex = dict(ex)
            return (ex or {}).get("ddl") or (ex or {}).get("sql")

        rows = [
            {
                "op": ops[i],
                "doc_id": d[key_col][i],
                "tokens": tokens[i],
                "n_tok": ntoks[i],
                "source": sources[i],
                "seq": d[seq_col][i],
                "sql": _sql(i),
            }
            for i in range(n)
        ]
        packed = pack_entries(rows, max_packet_size=0)
        if len(packed) != n:  # guaranteed by max_packet_size=0; belt+braces
            raise AssertionError(
                f"per-row packing returned {len(packed)} entries for {n} rows"
            )
        return [e[3] for e in packed]

    def fn(batches):
        # per (Spark-)partition physical counters, one per pt value:
        # several pt ids can share a Spark partition (pmod collisions) —
        # each keeps its own dense emission counter, like one producer
        # queue per MQ partition
        counters: dict[int, int] = {}
        for b in batches:
            d = b.to_pydict()
            n = b.num_rows
            vals = _encode_batch(d, n)
            idxs = []
            for pt in d["pt"]:
                i = counters.get(pt, 0)
                idxs.append(i)
                counters[pt] = i + 1
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
