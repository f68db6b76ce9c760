from binlake_spark.changelog.generator import (
    CHANGE_LOG_SCHEMA,
    GenSpec,
    generate_change_log,
    write_change_log,
)
from binlake_spark.changelog.oracle import oracle_final_state

__all__ = [
    "CHANGE_LOG_SCHEMA",
    "GenSpec",
    "generate_change_log",
    "write_change_log",
    "oracle_final_state",
]
