"""MySQL → Spark type mapping with unsigned promotion.

The reference decodes binlog wire types to JDBC types
(RowsLogBuffer.mysqlToJavaType, RowsLogBuffer.java:104-241) and widens
unsigned integers one level when the sign bit is set
(TableRowsParser.java:155-186): TINY→SMALLINT, SHORT→INTEGER,
INT24→INTEGER, LONG→BIGINT, LONGLONG→DECIMAL(20,0).  SURVEY §1.2 carries
the full table; this module is its executable form, used when mapping a
captured MySQL schema onto a LakeTable schema and when casting decoded
string values into typed columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# signed base mapping (SURVEY §1.2 table)
MYSQL_TO_SPARK: dict[str, str] = {
    "tinyint": "tinyint",
    "smallint": "smallint",
    "mediumint": "int",
    "int": "int",
    "integer": "int",
    "bigint": "bigint",
    "decimal": "decimal(38,18)",
    "float": "float",
    "double": "double",
    "bit": "bigint",
    "timestamp": "timestamp",
    "datetime": "timestamp",
    "time": "string",  # Spark has no TIME type; keep the ±838h string form
    "date": "date",
    "year": "smallint",
    "enum": "int",
    "set": "bigint",
    "tinytext": "string", "text": "string", "mediumtext": "string", "longtext": "string",
    "tinyblob": "binary", "blob": "binary", "mediumblob": "binary", "longblob": "binary",
    "varchar": "string", "char": "string",
    "varbinary": "binary", "binary": "binary",
    "json": "string",
    "geometry": "binary",
}

# unsigned promotion: one level wider (TableRowsParser.java:155-186)
_UNSIGNED_PROMOTION: dict[str, str] = {
    "tinyint": "smallint",
    "smallint": "int",
    "mediumint": "int",
    "int": "bigint",
    "integer": "bigint",
    "bigint": "decimal(20,0)",
}


def spark_type_for(mysql_type: str, unsigned: bool = False) -> str:
    base = mysql_type.lower().split("(")[0].strip()
    if unsigned and base in _UNSIGNED_PROMOTION:
        return _UNSIGNED_PROMOTION[base]
    return MYSQL_TO_SPARK.get(base, "string")


def promote_unsigned(col: Column, mysql_type: str) -> Column:
    """Reinterpret a signed-decoded integer column as its unsigned value in
    the promoted type (two's-complement fixup: negative → value + 2^bits).

    Vectorized JVM arithmetic — the Spark form of the reference's
    per-value widening (TableRowsParser.java:155-186).
    """
    base = mysql_type.lower().split("(")[0].strip()
    bits = {"tinyint": 8, "smallint": 16, "mediumint": 24, "int": 32,
            "integer": 32, "bigint": 64}.get(base)
    if bits is None:
        return col
    target = _UNSIGNED_PROMOTION[base]
    if bits == 64:
        # bigint unsigned → decimal(20,0): value + 2^64 when negative
        # (2^64 exceeds a py4j long literal, so it rides in as a string)
        wide = col.cast("decimal(20,0)")
        two64 = F.expr("CAST('18446744073709551616' AS DECIMAL(21,0))")
        return F.when(col < 0, (wide + two64).cast("decimal(20,0)")).otherwise(wide)
    wide = col.cast(target)
    return F.when(col < 0, wide + F.lit(1 << bits)).otherwise(wide)
