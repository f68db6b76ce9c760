"""Binlog-wire ↔ change-log-envelope bridge for the documents table.

Closes the last seam between the wire path and the engine: a real
binlog byte stream (socket dump or spooled blobs) becomes the exact
envelope `CdcEngine.run_batch_replay(source_df=...)` consumes — so the
engine that is oracle-checked against the file-source change log can
replay the same changes from MySQL wire bytes, end to end.  The
reference's equivalent composition is BinlogWorker's decode loop
feeding the converter/producer chain (BinlogWorker.java:625-657 →
RuleTask); here each stage is the already-tested Spark operator:
``binlog_rows_stream`` (functions/binlog_events.py) → ``decode_row_
images`` (functions/binlog_decode.py) → column mapping (this module).

The upstream ``docs`` table's wire schema carries the envelope's data
columns; everything else in the envelope is transport metadata
reconstructed from the stream itself (GTID context, header timestamp,
and ``seq`` — the flattened (blob, event, row) position, the same
(binlogFile, logPos) total order the reference flattens,
LogPosition.java:38-44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binlake_spark.functions.binlog_decode import ColumnSpec
from binlake_spark.functions.binlog_events import _T, decode_table_map, encode_table_map

#: the documents table as a MySQL table: (type_code, table-map meta)
DOCS_WIRE_COLUMNS: list[tuple[int, tuple]] = [
    (_T["VARCHAR"], (255,)),   # doc_id
    (_T["BLOB"], (4,)),        # payload: packed little-endian int32 tokens
    (_T["LONG"], ()),          # n_tok
    (_T["VARCHAR"], (64,)),    # source
    (_T["LONG"], ()),          # schema_ver
]
DOCS_WIRE_OVERLAY = [
    {"name": "doc_id"}, {"name": "payload"}, {"name": "n_tok"},
    {"name": "source"}, {"name": "schema_ver"},
]


def docs_wire_specs() -> list[ColumnSpec]:
    """The registry ColumnSpecs for the docs table — derived through the
    same TABLE_MAP round-trip the stream walk performs, so encode and
    decode can never drift."""
    _, _, _, specs = decode_table_map(
        encode_table_map(1, "shop", "docs", DOCS_WIRE_COLUMNS),
        DOCS_WIRE_OVERLAY,
    )
    return specs


#: per-blob/per-event packing for the synthesized seq: supports up to
#: 2^24 events per blob and 2^12 rows per event — far above any spool
#: cut — while blob ids up to 2^27 keep seq inside a signed 64-bit long
_EVT_SHIFT = 12
_BLOB_SHIFT = 24 + _EVT_SHIFT


def envelope_from_binlog_rows(
    changes: DataFrame,
    specs: list[ColumnSpec] | None = None,
    blob_col: str = "blob_id",
) -> DataFrame:
    """``binlog_rows_stream`` output (filtered to the docs table) → the
    change-log envelope schema.

    ``seq`` is synthesized from (blob ordinal, event ordinal, row
    ordinal) — the binlog position order, strictly increasing in apply
    order, which is all the LWW compaction requires.  GTID context and
    the header timestamp fill the identity columns; ``tokens`` stays
    NULL because the engine's fused Arrow pass decodes the payload
    itself (the packed bytes ARE the upstream column value).
    """
    from binlake_spark.functions.binlog_decode import decode_row_images

    specs = specs or docs_wire_specs()
    typed = decode_row_images(
        changes.filter(F.col("table") == "docs").select(
            blob_col, "evt_idx", "row_idx", "op", "ts", "gtid_sid", "gno",
            "image",
        ),
        "image",
        specs,
    )
    seq = (
        (F.col(blob_col).cast("long") * F.lit(1 << _BLOB_SHIFT))
        + (F.col("evt_idx").cast("long") * F.lit(1 << _EVT_SHIFT))
        + F.col("row_idx").cast("long")
        + F.lit(1)
    )
    return typed.select(
        seq.alias("seq"),
        F.col("gtid_sid").alias("server_uuid"),
        F.col("gno").cast("long").alias("gno"),
        F.col("gno").cast("long").alias("trx_id"),
        F.timestamp_seconds(F.col("ts")).alias("ts"),
        "op",
        "doc_id",
        F.lit(None).cast("array<int>").alias("tokens"),
        F.col("n_tok").cast("int").alias("n_tok"),
        "source",
        "payload",
        F.lit(None).cast("binary").alias("before_payload"),
        F.col("schema_ver").cast("int").alias("schema_ver"),
        F.lit(None).cast("map<string,string>").alias("extra"),
        F.lit(0).cast("int").alias("epoch_hint"),
    )


def encode_envelope_as_binlog(pdf) -> list[bytes]:
    """Test/fixture side: a change-log envelope pandas frame (generator
    output, seq-ordered) → the equivalent binlog event stream — one
    transaction per ``trx_id`` (GTID, TABLE_MAP, one ROWS event per
    change, XID), full images per the wire contract (an UPDATE's before
    image is the envelope's ``before_payload`` when carried, else the
    post image — the LWW path never reads it)."""
    from binlake_spark.functions.binlog_decode import encode_row_images
    from binlake_spark.functions.binlog_events import (
        GTID_EVENT,
        TABLE_MAP_EVENT,
        XID_EVENT,
        encode_event,
        encode_gtid_body,
        encode_rows_event,
        encode_xid_body,
    )

    specs = docs_wire_specs()
    events: list[bytes] = []
    pdf = pdf.sort_values("seq")
    for trx_id, txn in pdf.groupby("trx_id", sort=True):
        first = txn.iloc[0]
        ts = int(first["ts"].timestamp())
        events.append(encode_event(
            GTID_EVENT,
            encode_gtid_body(str(first["server_uuid"]), int(first["gno"])),
            ts=ts,
        ))
        events.append(encode_event(
            TABLE_MAP_EVENT,
            encode_table_map(1, "shop", "docs", DOCS_WIRE_COLUMNS),
            ts=ts,
        ))
        for _, r in txn.iterrows():
            row = {
                "doc_id": r["doc_id"],
                "payload": bytes(r["payload"]) if r["payload"] is not None else b"",
                "n_tok": int(r["n_tok"]),
                "source": r["source"],
                "schema_ver": int(r["schema_ver"]),
            }
            img = encode_row_images([row], specs)[0]
            before = None
            if r["op"] == "U":
                bp = r.get("before_payload")
                brow = dict(row)
                if bp is not None:
                    brow["payload"] = bytes(bp)
                    brow["n_tok"] = len(bp) // 4
                before = encode_row_images([brow], specs)[0]
            events.append(encode_event(
                *encode_rows_event(1, str(r["op"]), [(img, before)], len(specs)),
                ts=int(r["ts"].timestamp()),
            ))
        events.append(encode_event(
            XID_EVENT, encode_xid_body(int(trx_id)), ts=ts
        ))
    return events
