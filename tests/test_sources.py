"""Sources: rate-source synthetic stream round-trips through the same
Arrow decode path as the file log; Kafka is gated with a clear error."""

import numpy as np
import pytest


def test_rate_stream_payload_roundtrip(spark, tmp_path):
    from binlake_spark.operators.decode import decode_and_validate
    from binlake_spark.sources import rate_changelog_stream

    stream = rate_changelog_stream(spark, rows_per_second=500, n_docs=50, tokens_per_doc=8)
    captured = []

    def feb(df, epoch_id):
        rows = decode_and_validate(df.drop("tokens")).collect()
        ref = {r.seq: r.tokens for r in df.collect()}
        captured.extend((r.seq, r.tokens, ref[r.seq]) for r in rows)

    import time

    q = (
        stream.writeStream.foreachBatch(feb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.monotonic() + 60
    while not captured and time.monotonic() < deadline:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    assert captured, "rate source produced no rows within 60s"
    for seq, decoded, original in captured:
        assert np.array_equal(np.array(decoded), np.array(original)), seq
        assert len(decoded) == 8


def test_bounded_replay_reads_generated_log(spark, tmp_path):
    from binlake_spark.changelog import GenSpec, generate_change_log, write_change_log
    from binlake_spark.sources import bounded_replay

    pdf = generate_change_log(GenSpec(n_docs=10, n_events=100))
    write_change_log(pdf, str(tmp_path / "log"))
    df = bounded_replay(spark, str(tmp_path / "log"))
    assert df.count() == 100


def test_kafka_source_gated(spark):
    from binlake_spark.sources import kafka_changelog_stream

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_changelog_stream(spark, "localhost:9092", "t")


def test_kafka_envelope_decode_contract(spark, tmp_path):
    """The engine's half of the Kafka contract, without the connector jar:
    a mock batch with the connector's exact wire schema (key/value binary,
    topic/partition/offset/timestamp/timestampType) carrying to_json
    envelopes must round-trip every CHANGE_LOG_SCHEMA column bit-exactly
    through decode_kafka_envelope — including binary payloads (base64
    inside the JSON), the extra map, and microsecond timestamps."""
    from pyspark.sql import functions as F

    from binlake_spark.changelog import GenSpec, generate_change_log, write_change_log
    from binlake_spark.sources import bounded_replay, decode_kafka_envelope

    pdf = generate_change_log(GenSpec(n_docs=10, n_events=100))
    write_change_log(pdf, str(tmp_path / "log"))
    log = bounded_replay(spark, str(tmp_path / "log"))

    # producer side: the reference's converter → Kafka message (value =
    # JSON envelope; key = doc_id, as the key-generator would partition)
    cols = log.columns
    mock_kafka = log.select(
        F.encode(F.col("doc_id"), "UTF-8").alias("key"),
        F.encode(F.to_json(F.struct(*cols)), "UTF-8").alias("value"),
        F.lit("binlake.docs").alias("topic"),
        F.pmod(F.crc32(F.col("doc_id").cast("binary")), F.lit(4)).cast("int").alias("partition"),
        F.col("seq").alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )

    decoded = decode_kafka_envelope(mock_kafka)
    assert decoded.columns == cols
    orig = {r["seq"]: r for r in (r.asDict(recursive=True) for r in log.collect())}
    got = [r.asDict(recursive=True) for r in decoded.collect()]
    assert len(got) == len(orig) == 100
    for r in got:
        o = orig[r["seq"]]
        for c in cols:
            assert r[c] == o[c], (r["seq"], c, r[c], o[c])


def test_kafka_path_replays_identical_to_file(spark, tmp_path):
    """END-TO-END unification proof for the gated Kafka transport: a
    file-backed frame with the connector's EXACT source schema
    (key/value/topic/partition/offset/timestamp/timestampType) is
    decoded by decode_kafka_envelope and drives the engine through the
    same ``run_batch_replay`` entry (``source_df=``) — the final table
    must be identical to the file-source replay of the same events.
    This pins that the live path (jar only supplies the raw frame)
    shares EVERY operator — validate, compact, decode, MERGE, fences —
    with the oracle-checked path (reference transport analog:
    Kafka100Producer.java:44-63)."""
    from pyspark.sql import functions as F

    from binlake_spark.changelog import GenSpec, generate_change_log, write_change_log
    from binlake_spark.sources import bounded_replay, decode_kafka_envelope
    from binlake_spark.streaming import CdcEngine

    spec = GenSpec(
        n_docs=40,
        n_events=900,
        events_per_epoch=300,
        retransmit_frac=0.1,
        hot_keys=3,
        hot_frac=0.2,
        evolution_at=450,
        seed=11,
    )
    pdf = generate_change_log(spec)
    write_change_log(pdf, str(tmp_path / "log"))
    log = bounded_replay(spark, str(tmp_path / "log"))
    cols = log.columns

    # file path (the oracle-checked one)
    t_file = CdcEngine.create_table(str(tmp_path / "t_file"), num_buckets=8)
    CdcEngine(t_file).run_batch_replay(spark, str(tmp_path / "log"))

    # kafka path: producer wire records persisted with the connector's
    # exact schema, read back cold, decoded, replayed via source_df
    wire = log.select(
        F.encode(F.col("doc_id"), "UTF-8").alias("key"),
        F.encode(F.to_json(F.struct(*cols)), "UTF-8").alias("value"),
        F.lit("binlake.docs").alias("topic"),
        F.pmod(F.crc32(F.col("doc_id").cast("binary")), F.lit(8))
        .cast("int")
        .alias("partition"),
        F.col("seq").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    wire.write.mode("overwrite").parquet(str(tmp_path / "wire"))
    raw = spark.read.parquet(str(tmp_path / "wire"))
    t_kafka = CdcEngine.create_table(str(tmp_path / "t_kafka"), num_buckets=8)
    CdcEngine(t_kafka).run_batch_replay(
        spark, source_df=decode_kafka_envelope(raw)
    )

    def state(table):
        return {
            r["doc_id"]: r
            for r in (
                x.asDict(recursive=True)
                for x in table.read(spark).collect()
            )
        }

    a, b = state(t_file), state(t_kafka)
    assert a.keys() == b.keys() and a
    for k in a:
        assert a[k] == b[k], (k, a[k], b[k])

    # misuse guard: both or neither source is an error
    with pytest.raises(ValueError, match="exactly one"):
        CdcEngine(t_kafka).run_batch_replay(spark)


def test_jdbc_snapshot_options_partition_planning():
    from binlake_spark.sources.changelog_sources import jdbc_snapshot_options

    opts = jdbc_snapshot_options(
        "jdbc:mysql://primary:3306/db", "docs",
        partition_col="doc_pk", lower_bound=0, upper_bound=1 << 20,
        num_partitions=64,
    )
    assert opts["partitionColumn"] == "doc_pk"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", str(1 << 20))
    assert opts["numPartitions"] == "64"
    assert opts["fetchsize"] == "10000"
    # unpartitioned form is legal (small dims)
    small = jdbc_snapshot_options("jdbc:mysql://primary/db", "dims")
    assert "partitionColumn" not in small

    import pytest as _pytest
    with _pytest.raises(ValueError):
        jdbc_snapshot_options("mysql://nope", "t")
    with _pytest.raises(ValueError):
        jdbc_snapshot_options("jdbc:mysql://p/db", "t", partition_col="k")
    with _pytest.raises(ValueError):
        jdbc_snapshot_options(
            "jdbc:mysql://p/db", "t",
            partition_col="k", lower_bound=5, upper_bound=5, num_partitions=2,
        )


def test_jdbc_snapshot_gated_without_driver(spark):
    from binlake_spark.sources.changelog_sources import jdbc_snapshot

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="JDBC driver jar"):
        jdbc_snapshot(spark, url="jdbc:mysql://nowhere:1/db", table="docs")
