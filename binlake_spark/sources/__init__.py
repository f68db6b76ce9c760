from binlake_spark.sources.changelog_sources import (
    bounded_replay,
    decode_kafka_envelope,
    file_changelog_stream,
    kafka_changelog_stream,
    rate_changelog_stream,
)
from binlake_spark.sources.socket_dump import (
    BinlogDumpClient,
    MySQLError,
    spool_dump,
    spooled_frames,
)

__all__ = [
    "BinlogDumpClient",
    "MySQLError",
    "bounded_replay",
    "decode_kafka_envelope",
    "file_changelog_stream",
    "kafka_changelog_stream",
    "rate_changelog_stream",
    "spool_dump",
    "spooled_frames",
]
