from binlake_spark.sources.changelog_sources import (
    bounded_replay,
    decode_kafka_envelope,
    file_changelog_stream,
    kafka_changelog_stream,
    rate_changelog_stream,
)

__all__ = [
    "bounded_replay",
    "decode_kafka_envelope",
    "file_changelog_stream",
    "kafka_changelog_stream",
    "rate_changelog_stream",
]
