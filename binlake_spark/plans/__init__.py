from binlake_spark.plans.driver_queries import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    ORACLES,
    QUERIES,
    oracle_sf,
    render_oracles,
)

__all__ = [
    "QUERIES",
    "ORACLES",
    "EXTRA_QUERIES",
    "EXTRA_ORACLES",
    "oracle_sf",
    "render_oracles",
]
