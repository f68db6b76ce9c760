from binlake_spark.lake.table import LakeTable
from binlake_spark.lake.feed import ChangeFeedReader, FeedBehindRetention
from binlake_spark.lake.ivm import (
    FeedAggregate,
    TokenVocabAggregate,
    WindowIndexAggregate,
    token_vocab_drift,
)
from binlake_spark.lake.merge import (
    compact_buckets,
    merge_into,
    merge_into_mor,
    purge_tombstones,
    rebucket,
)

__all__ = [
    "ChangeFeedReader",
    "FeedAggregate",
    "FeedBehindRetention",
    "LakeTable",
    "TokenVocabAggregate",
    "WindowIndexAggregate",
    "compact_buckets",
    "merge_into",
    "merge_into_mor",
    "purge_tombstones",
    "rebucket",
    "token_vocab_drift",
]
