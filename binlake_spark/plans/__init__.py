from binlake_spark.plans.driver_queries import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
