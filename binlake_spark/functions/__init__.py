from binlake_spark.functions.mysql_types import (
    MYSQL_TO_SPARK,
    promote_unsigned,
    spark_type_for,
)

__all__ = ["MYSQL_TO_SPARK", "promote_unsigned", "spark_type_for"]
