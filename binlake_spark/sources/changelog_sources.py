"""Change-log sources — the dump/fetch stage of the reference as Spark
sources.

Reference source inventory (SURVEY §2 ops 1-3): live socket dump
(BinlogDump.sendDumpCommand, BinlogDump.java:23-50), JDBC fetcher
(DirectLogFetcher.java:38-120), and on-disk binlog file replay
(FileLogFetcher.java:1-158).  Spark-native equivalents:

- :func:`file_changelog_stream` — streaming tail of a parquet change-log
  directory; offsets live in the query checkpoint (the ZK `/dynamic`
  analog).  ``maxFilesPerTrigger`` is the backpressure token bucket
  (wave.server.throttle.size, BinlogWorker.java:214-218).
- :func:`bounded_replay` — batch read of the same directory
  (FileLogFetcher analog; the correctness-harness path).
- :func:`rate_changelog_stream` — unbounded deterministic synthetic
  envelope stream derived from the rate source entirely with JVM
  expressions: soak/scale testing with zero generation cost on the
  driver.
- :func:`kafka_changelog_stream` — the production transport (the
  reference produces to Kafka/JMQ; a Spark deployment consumes the same
  topic).  Gated: the Kafka connector jar is not in this image, so the
  builder raises with instructions rather than failing deep in Py4J.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA, VOCAB


def file_changelog_stream(
    spark: SparkSession,
    source_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(CHANGE_LOG_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.parquet(source_dir)


def bounded_replay(spark: SparkSession, source_dir: str) -> DataFrame:
    return spark.read.schema(CHANGE_LOG_SCHEMA).parquet(source_dir)


def rate_changelog_stream(
    spark: SparkSession,
    rows_per_second: int = 10_000,
    n_docs: int = 100_000,
    tokens_per_doc: int = 16,
    with_payload: bool = True,
) -> DataFrame:
    """Deterministic synthetic envelope stream from the rate source.

    Every column is a pure function of the rate source's ``value`` (our
    ``seq``), so two runs at any parallelism produce the same logical
    stream.  Token payloads are generated as packed int32 bytes JVM-side
    so the stream exercises the same Arrow decode path as the file log.

    ``with_payload=False`` omits the packed-binary column and ships the
    token array directly: the SQL byte-packing (chr/concat fold) costs
    more than the entire ingest pipeline, so soak tests that want to
    measure the *engine* use the tokens-only envelope (the payload decode
    path is covered by the file-based bench, whose payloads are packed
    once by the generator).
    """
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    seq = F.col("value") + 1
    doc = F.pmod(F.hash(seq.cast("string")), F.lit(n_docs))
    opsel = F.pmod(seq, F.lit(15))
    if with_payload:
        tok = F.transform(
            F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
            lambda i: F.pmod(
                F.hash(seq.cast("string"), i.cast("string")), F.lit(VOCAB)
            ).cast("int"),
        )
    else:
        # soak mode: one hash per row, not per token — generation must cost
        # less than the pipeline being measured
        base = F.pmod(F.hash(seq), F.lit(VOCAB - tokens_per_doc))
        tok = F.transform(
            F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
            lambda i: (base + i).cast("int"),
        )
    # pack int32 little-endian: 4 bytes per token via concat of substrings
    payload = (
        F.aggregate(tok, F.lit(b""), lambda acc, t: F.concat(acc, _int32_le(t)))
        if with_payload
        else None
    )
    cols = [
        seq.cast("long").alias("seq"),
        F.concat(F.lit("00000000-0000-0000-0000-"), F.lpad(F.pmod(seq, F.lit(2)).cast("string"), 12, "0")).alias("server_uuid"),
        (seq / 2).cast("long").alias("gno"),
        ((seq - 1) / 3 + 1).cast("long").alias("trx_id"),
        F.col("timestamp").alias("ts"),
        F.when(opsel < 10, "I").when(opsel < 14, "U").otherwise("D").alias("op"),
        F.concat(F.lit("doc"), F.lpad(doc.cast("string"), 6, "0")).alias("doc_id"),
        tok.alias("tokens"),
        F.lit(tokens_per_doc).cast("int").alias("n_tok"),
        F.element_at(
            F.array(F.lit("web"), F.lit("books"), F.lit("code"), F.lit("wiki")),
            (F.pmod(seq, F.lit(4)) + 1).cast("int"),
        ).alias("source"),
        *([payload.alias("payload")] if payload is not None else []),
        F.lit(1).cast("int").alias("schema_ver"),
        F.map_from_arrays(F.array(), F.array()).cast("map<string,string>").alias("extra"),
        F.lit(0).cast("int").alias("epoch_hint"),
    ]
    return rate.select(*cols)


def _int32_le(t):
    """4 little-endian bytes of an int32 column, as binary."""
    byte = lambda shift: F.chr(  # noqa: E731
        F.pmod(F.shiftright(t.cast("int"), shift).cast("long"), F.lit(256))
    )
    return F.encode(F.concat(byte(0), byte(8), byte(16), byte(24)), "ISO-8859-1")


def decode_kafka_envelope(raw: DataFrame) -> DataFrame:
    """Kafka wire record → typed change-log envelope.

    ``raw`` carries the Kafka source's fixed schema (key/value binary,
    topic, partition, offset, ...); the value is the JSON envelope the
    reference's converter produces per event (IConvert → Kafka producer,
    ProduceTask.java:49-56).  Binary columns (payload/before_payload)
    ride base64 inside the JSON, matching Spark's to_json/from_json
    contract — so a producer using `to_json(struct(*))` round-trips
    bit-exactly.  Factored out of :func:`kafka_changelog_stream` so the
    decode contract is testable without the connector jar (the jar only
    supplies `raw`; this function is the engine's half of the contract).
    """
    return raw.select(
        F.from_json(F.col("value").cast("string"), CHANGE_LOG_SCHEMA).alias("e")
    ).select("e.*")


def kafka_changelog_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka transport (requires spark-sql-kafka jars on the classpath —
    not shipped in this image, hence the guarded construction)."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # pragma: no cover - jar not present in CI image
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka-0-10 connector jar "
            "(add via spark.jars.packages on a cluster with network access)"
        ) from e
    return decode_kafka_envelope(raw)


def jdbc_snapshot_options(
    url: str,
    table: str,
    partition_col: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
) -> dict[str, str]:
    """Reader options for a partitioned JDBC initial-load of the upstream
    table (the reference's JDBC-connection fetch, DirectLogFetcher.open's
    connection half, DirectLogFetcher.java:38-120; the decode loop itself
    shares the file-source abstraction).

    Partitioned-read planning is the part that matters at 10^10 rows: a
    single-connection `spark.read.jdbc` pulls the whole table through one
    executor, so a snapshot of a large primary MUST split on a numeric /
    temporal key into ``num_partitions`` range predicates (Spark pushes
    one WHERE clause per partition).  ``fetch_size`` keeps the MySQL
    driver from buffering whole result sets.  Bounds are caller-supplied:
    deriving them with a min/max query belongs to the caller's
    transaction-consistency story (they must come from the SAME
    consistent read the binlog position was taken from, or rows can be
    missed/duplicated at the handoff seam).
    """
    if not url.startswith("jdbc:"):
        raise ValueError(f"not a jdbc url: {url!r}")
    opts = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(int(fetch_size)),
    }
    part = [partition_col, lower_bound, upper_bound, num_partitions]
    if any(v is not None for v in part):
        if any(v is None for v in part):
            raise ValueError(
                "partitioned jdbc read needs ALL of partition_col, "
                "lower_bound, upper_bound, num_partitions"
            )
        if int(upper_bound) <= int(lower_bound):
            raise ValueError("upper_bound must be > lower_bound")
        opts.update(
            partitionColumn=partition_col,
            lowerBound=str(int(lower_bound)),
            upperBound=str(int(upper_bound)),
            numPartitions=str(int(num_partitions)),
        )
    return opts


def jdbc_snapshot(spark: SparkSession, **options) -> DataFrame:
    """Point-in-time upstream read over JDBC (initial load).  The result
    feeds ``CdcEngine.bootstrap_from_snapshot(df, as_of_seq)`` which
    seeds the empty lake table in one bucket-clustered write and fences
    every bucket at the snapshot position; incremental replay then takes
    over (the composition the `cdc_snapshot_handoff` oracle proves
    exact).  Gated like the Kafka source: this image ships no JDBC
    driver jar, so construction failures surface as a clear error."""
    opts = jdbc_snapshot_options(**{k: options[k] for k in (
        "url", "table", "partition_col", "lower_bound", "upper_bound",
        "num_partitions", "fetch_size") if k in options})
    try:
        return spark.read.format("jdbc").options(**opts).load()
    except Exception as e:  # pragma: no cover - driver jar not in CI image
        # only a missing driver CLASS earns the jar hint — bad
        # credentials / unreachable host / unknown table are real errors
        # that must surface as themselves, not be rewritten
        msg = str(e)
        if "ClassNotFoundException" in msg or "No suitable driver" in msg:
            raise RuntimeError(
                "jdbc snapshot requires the database's JDBC driver jar "
                "(add via spark.jars.packages, e.g. mysql:mysql-connector-j)"
            ) from e
        raise
