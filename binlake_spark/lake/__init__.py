from binlake_spark.lake.table import LakeTable
from binlake_spark.lake.merge import compact_buckets, merge_into, merge_into_mor

__all__ = ["LakeTable", "compact_buckets", "merge_into", "merge_into_mor"]
