"""DDL statement classification — behavioural parity with the reference.

The reference classifies QUERY_EVENT statement text with regexes
(SimpleDdlParser.java:17-40 patterns, parse :55-140) into the event types
ALTER / CREATE / ERASE / TRUNCATE / RENAME / CINDEX / DINDEX (entry.proto
EventType, :189-202), with RENAME supporting the multi-table comma form;
a DDL hit triggers a table-meta refresh (BinlogWorker.java:999-1054).

In the rebuild, classification decides whether a statement event carries
schema evolution (only additive ALTERs are applied — the add-column-only
rule, BinlogWorker.java:1079).  Implemented from the published MySQL
statement grammar; not a code port.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_COMMENT = re.compile(r"/\*.*?\*/", re.S)

_RULES: list[tuple[str, re.Pattern]] = [
    ("ALTER", re.compile(r"^\s*ALTER\s+(IGNORE\s+)?TABLE\s+(.*)$", re.I | re.S)),
    ("CREATE", re.compile(r"^\s*CREATE\s+(TEMPORARY\s+)?TABLE\s+(.*)$", re.I | re.S)),
    ("ERASE", re.compile(r"^\s*DROP\s+(TEMPORARY\s+)?TABLE\s+(.*)$", re.I | re.S)),
    ("TRUNCATE", re.compile(r"^\s*TRUNCATE\s+(TABLE\s+)?(.*)$", re.I | re.S)),
    ("CINDEX", re.compile(r"^\s*CREATE\s+.*?INDEX\s+(.*?)\s+ON\s+(.*?)$", re.I | re.S)),
    ("DINDEX", re.compile(r"^\s*DROP\s+INDEX\s+(.*?)\s+ON\s+(.*?)$", re.I | re.S)),
]
_RENAME = re.compile(r"^\s*RENAME\s+TABLE\s+(.*?)[\s`]+TO[\s`]+(.*?)$", re.I | re.S)
_RENAME_PAIR = re.compile(
    r"^\s*(?:RENAME\s+TABLE\s+)?(.*?)[\s`]+TO[\s`]+(.*?)\s*;?\s*$", re.I | re.S
)
_DML = re.compile(r"^\s*(INSERT|MERGE|REPLACE|UPDATE|DELETE)\b", re.I)

# pt-online-schema-change temp tables, filtered outright by the reference
# (BinlogWorker.java:90, :910-912)
PT_OSC = re.compile(r"^_.*_(old|new)$")

_NAME = re.compile(
    r"^[`\"']?([\w$]+)[`\"']?(?:\s*\.\s*[`\"']?([\w$]+)[`\"']?)?"
)


@dataclass
class DdlResult:
    type: str                      # ALTER CREATE ERASE TRUNCATE RENAME CINDEX DINDEX DML QUERY
    schema: str | None = None
    table: str | None = None
    renames: list[tuple[str, str]] = field(default_factory=list)  # (from, to)


def _split_name(raw: str, default_schema: str | None) -> tuple[str | None, str | None]:
    m = _NAME.match(raw.strip())
    if not m:
        return default_schema, None
    if m.group(2):
        return m.group(1), m.group(2)
    return default_schema, m.group(1)


def classify_ddl(sql: str, default_schema: str | None = None) -> DdlResult:
    text = _COMMENT.sub("", sql or "").strip()
    # leading "USE db;" prefix
    m = re.match(r"^\s*USE\s+`?(\w+)`?\s*;\s*(.*)$", text, re.I | re.S)
    if m:
        default_schema, text = m.group(1), m.group(2)

    for typ, pat in _RULES[:4]:  # ALTER/CREATE/ERASE/TRUNCATE before indexes
        mm = pat.match(text)
        if mm:
            target = re.sub(r"^IF\s+(NOT\s+)?EXISTS\s+", "", mm.group(2).strip(), flags=re.I)
            schema, table = _split_name(target, default_schema)
            return DdlResult(typ, schema, table)

    if _RENAME.match(text):
        renames: list[tuple[str, str]] = []
        for i, part in enumerate(text.split(",")):
            frag = part if i == 0 else "RENAME TABLE " + part
            pm = _RENAME_PAIR.match(re.sub(r"^\s*RENAME\s+TABLE\s+", "", frag, flags=re.I))
            if pm:
                renames.append((pm.group(1).strip(" `"), pm.group(2).strip(" `")))
        schema, table = (
            _split_name(renames[0][0], default_schema) if renames else (default_schema, None)
        )
        return DdlResult("RENAME", schema, table, renames)

    for typ, pat in _RULES[4:]:
        mm = pat.match(text)
        if mm:
            schema, table = _split_name(mm.group(2), default_schema)
            return DdlResult(typ, schema, table)

    if _DML.match(text):
        return DdlResult("DML", default_schema, None)
    return DdlResult("QUERY", default_schema, None)


# --- additive-evolution extraction (the part the engine applies) -------- #
# the negative lookahead keeps ADD INDEX/KEY/UNIQUE/CONSTRAINT/... clauses
# from being misread as column definitions (a backticked column that
# happens to be named `index` still parses: the quote breaks the \b match)
_ADD_COLUMN = re.compile(
    r"ADD\s+(?:COLUMN\s+)?"
    r"(?!(?:INDEX|KEY|UNIQUE|CONSTRAINT|PRIMARY|FOREIGN|FULLTEXT|SPATIAL|PARTITION)\b)"
    r"[`\"']?(\w+)[`\"']?\s+([\w()]+)",
    re.I,
)

_MYSQL_TO_SPARK = {
    "tinyint": "tinyint", "smallint": "smallint", "mediumint": "int",
    "int": "int", "integer": "int", "bigint": "bigint",
    "float": "float", "double": "double", "text": "string",
    "varchar": "string", "char": "string", "json": "string",
    "date": "date", "datetime": "timestamp", "timestamp": "timestamp",
    "blob": "binary", "varbinary": "binary",
}


def extract_added_columns(sql: str) -> list[tuple[str, str]]:
    """Pull (name, spark_type) pairs from an additive ALTER — the only DDL
    the engine applies (add-column-only rule, BinlogWorker.java:1079)."""
    out = []
    for name, mysql_type in _ADD_COLUMN.findall(sql or ""):
        base = re.sub(r"\(.*", "", mysql_type).lower()
        out.append((name, _MYSQL_TO_SPARK.get(base, "string")))
    return out
