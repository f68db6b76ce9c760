from binlake_spark.lake.table import LakeTable
from binlake_spark.lake.merge import merge_into

__all__ = ["LakeTable", "merge_into"]
