"""Protobuf wire-format codec for the reference's WaveEntry message model.

The reference's *primary* output format is protobuf: every decoded binlog
event is assembled into an ``Entry{header, entryType, storeValue}``
message whose ``storeValue`` is a serialized ``RowChange`` of
``RowData{beforeColumns, afterColumns}`` rows
(entry.proto:1-209; ProtobufConverter.formatByRows,
ProtobufConverter.java:549-729).  This module implements that contract
Spark-first: a dependency-free encoder/decoder for the *published*
protobuf wire format (proto2 binary encoding — base-128 varints,
``tag = field_no << 3 | wire_type``, length-delimited submessages), the
WaveEntry message descriptors, and a ``mapInArrow`` produce pass that
packs change-log rows into size-capped Entry packets exactly like the
reference's batched converter:

- packets split only at row boundaries once the accumulated payload
  exceeds ``MAX_PACKET_SIZE`` = 10 KiB (IConvert.java:22) — and an
  UPDATE's before+after images always travel in the same packet
  (ProtobufConverter.java:684 "update 需要包含完整的消息体"), which holds
  structurally here because one RowData carries both images;
- the header is denormalized per packet (createHeader,
  ProtobufConverter.java:348-378): logfile name/offset, server id,
  charset, execute time, event type, schema/table names, and the GTID
  as a ``props`` Pair;
- column cells follow TableRowsParser's string materialization: every
  value is text, NULL cells set ``isNull`` and omit the value, UPDATE
  after-images carry the per-column ``updated`` flag
  (ProtobufConverter.java:619-656).

Scale posture: encoding is per-row by nature (as in any binlog → MQ
producer); it runs inside ``mapInArrow`` so the Python cost parallelizes
with the partitions, packets are bounded at 10 KiB so memory is O(1) per
row stream, and nothing ever collects.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAX_PACKET_SIZE = 10 * 1024  # IConvert.java:22

# ------------------------------------------------------------------ #
# proto2 binary encoding primitives (published wire format)
# ------------------------------------------------------------------ #

_VARINT_KINDS = {"int32", "int64", "bool", "enum"}
_LEN_KINDS = {"string", "bytes"}


def _write_varint(out: bytearray, u: int) -> None:
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 10 bytes")


def _int_to_varint_u(v: int) -> int:
    # proto2 int32/int64: negatives are 64-bit two's complement (10 bytes)
    return v & 0xFFFFFFFFFFFFFFFF


def _varint_u_to_int(u: int, kind: str) -> int:
    if u >= 1 << 63:
        u -= 1 << 64
    if kind == "int32":
        u = struct.unpack("<i", struct.pack("<I", u & 0xFFFFFFFF))[0]
    return u


class MessageDesc:
    """Field table of one message: name -> (field_no, kind, repeated).

    ``kind`` is a scalar kind or another message name (length-delimited
    submessage).  Mirrors entry.proto's declarations 1:1."""

    def __init__(self, name: str, fields: dict[str, tuple[int, str, bool]]):
        self.name = name
        self.fields = fields
        self.by_no = {no: (fname, kind, rep) for fname, (no, kind, rep) in fields.items()}


def _encode_into(out: bytearray, desc: MessageDesc, value: dict) -> None:
    for fname, (no, kind, repeated) in desc.fields.items():
        if fname not in value or value[fname] is None:
            continue
        vals = value[fname] if repeated else [value[fname]]
        for v in vals:
            if kind in _VARINT_KINDS:
                _write_varint(out, no << 3 | 0)
                if kind == "bool":
                    v = int(bool(v))
                _write_varint(out, _int_to_varint_u(int(v)))
            elif kind in _LEN_KINDS:
                _write_varint(out, no << 3 | 2)
                raw = v.encode("utf-8") if kind == "string" else bytes(v)
                _write_varint(out, len(raw))
                out += raw
            else:  # submessage
                sub = bytearray()
                _encode_into(sub, DESCRIPTORS[kind], v)
                _write_varint(out, no << 3 | 2)
                _write_varint(out, len(sub))
                out += sub


def encode_message(msg_name: str, value: dict) -> bytes:
    out = bytearray()
    _encode_into(out, DESCRIPTORS[msg_name], value)
    return bytes(out)


def decode_message(msg_name: str, buf: bytes) -> dict:
    value, pos = _decode_from(DESCRIPTORS[msg_name], buf, 0, len(buf))
    if pos != len(buf):
        raise ValueError(f"{len(buf) - pos} trailing bytes after message")
    return value


def _decode_from(desc: MessageDesc, buf: bytes, pos: int, end: int) -> tuple[dict, int]:
    out: dict = {}
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        no, wt = tag >> 3, tag & 7
        field = desc.by_no.get(no)
        if field is None:  # unknown field: skip (forward compatibility)
            if wt == 0:
                _, pos = _read_varint(buf, pos)
            elif wt == 1:
                pos += 8
            elif wt == 2:
                ln, pos = _read_varint(buf, pos)
                pos += ln
            elif wt == 5:
                pos += 4
            else:
                raise ValueError(f"unsupported wire type {wt}")
            continue
        fname, kind, repeated = field
        if kind in _VARINT_KINDS:
            if wt != 0:
                raise ValueError(f"{desc.name}.{fname}: wire type {wt}, want varint")
            u, pos = _read_varint(buf, pos)
            v = bool(u) if kind == "bool" else _varint_u_to_int(u, kind)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            raw = buf[pos : pos + ln]
            pos += ln
            if kind == "string":
                v = raw.decode("utf-8")
            elif kind == "bytes":
                v = bytes(raw)
            else:
                v, _ = _decode_from(DESCRIPTORS[kind], raw, 0, len(raw))
        else:
            raise ValueError(f"{desc.name}.{fname}: wire type {wt}, want 2")
        if repeated:
            out.setdefault(fname, []).append(v)
        else:
            out[fname] = v
    return out, pos


# ------------------------------------------------------------------ #
# WaveEntry descriptors (entry.proto:16-209, field numbers verbatim)
# ------------------------------------------------------------------ #

def _d(_msg_name, **fields):
    return MessageDesc(
        _msg_name,
        {
            f: (no, kind, rep)
            for f, (no, kind, rep) in (
                (k, (v[0], v[1], len(v) > 2 and v[2])) for k, v in fields.items()
            )
        },
    )


DESCRIPTORS: dict[str, MessageDesc] = {}
for d in [
    _d("Pair", key=(1, "string"), value=(2, "string")),
    _d(
        "Header",
        version=(1, "int32"),
        logfileName=(2, "string"),
        logfileOffset=(3, "int64"),
        serverId=(4, "int64"),
        serverenCode=(5, "string"),
        executeTime=(6, "int64"),
        sourceType=(7, "enum"),
        schemaName=(8, "string"),
        tableName=(9, "string"),
        eventLength=(10, "int64"),
        eventType=(11, "enum"),
        props=(12, "Pair", True),
    ),
    _d(
        "Column",
        index=(1, "int32"),
        sqlType=(2, "int32"),
        name=(3, "string"),
        isKey=(4, "bool"),
        updated=(5, "bool"),
        isNull=(6, "bool"),
        props=(7, "Pair", True),
        value=(8, "string"),
        length=(9, "int32"),
        mysqlType=(10, "string"),
    ),
    _d(
        "RowData",
        beforeColumns=(1, "Column", True),
        afterColumns=(2, "Column", True),
        props=(3, "Pair", True),
    ),
    _d(
        "RowChange",
        tableId=(1, "int64"),
        eventType=(2, "enum"),
        isDdl=(10, "bool"),
        sql=(11, "string"),
        rowDatas=(12, "RowData", True),
        props=(13, "Pair", True),
        ddlSchemaName=(14, "string"),
    ),
    _d(
        "TransactionBegin",
        executeTime=(1, "int64"),
        transactionId=(2, "string"),
        props=(3, "Pair", True),
        threadId=(4, "int64"),
    ),
    _d(
        "TransactionEnd",
        executeTime=(1, "int64"),
        transactionId=(2, "string"),
        props=(3, "Pair", True),
    ),
    _d(
        "Entry",
        header=(1, "Header"),
        entryType=(2, "enum"),
        storeValue=(3, "bytes"),
        batchId=(4, "int64"),
        inId=(5, "int64"),
        ip=(6, "string"),
    ),
]:
    DESCRIPTORS[d.name] = d

ENTRY_TYPE = {"TRANSACTIONBEGIN": 1, "ROWDATA": 2, "TRANSACTIONEND": 3, "HEARTBEAT": 4}
EVENT_TYPE = {
    "INSERT": 1, "UPDATE": 2, "DELETE": 3, "CREATE": 4, "ALTER": 5,
    "ERASE": 6, "QUERY": 7, "TRUNCATE": 8, "RENAME": 9, "CINDEX": 10, "DINDEX": 11,
}
SOURCE_TYPE = {"ORACLE": 1, "MYSQL": 2, "PGSQL": 3}
_OP_TO_EVENT = {"I": EVENT_TYPE["INSERT"], "U": EVENT_TYPE["UPDATE"], "D": EVENT_TYPE["DELETE"]}

# java.sql.Types codes, as the reference's sqlType column carries
_SQL_VARCHAR, _SQL_INTEGER, _SQL_LONGVARCHAR = 12, 4, -1


# ------------------------------------------------------------------ #
# formatByRows analog: change-log rows → size-capped Entry packets
# ------------------------------------------------------------------ #

_COLUMN_META = [
    # (name, sqlType, mysqlType, isKey)
    ("doc_id", _SQL_VARCHAR, "varchar(64)", True),
    ("tokens", _SQL_LONGVARCHAR, "longtext", False),
    ("n_tok", _SQL_INTEGER, "int(11)", False),
    ("source", _SQL_VARCHAR, "varchar(32)", False),
]


def _cells(doc_id, tokens, n_tok, source) -> list:
    toks = None if tokens is None else ",".join(str(t) for t in tokens)
    return [doc_id, toks, None if n_tok is None else str(n_tok), source]


def _columns(cells: list, updated: list | None = None) -> list[dict]:
    cols = []
    for j, ((name, sql_t, mysql_t, is_key), cell) in enumerate(zip(_COLUMN_META, cells)):
        c: dict = {
            "index": j,
            "sqlType": sql_t,
            "name": name,
            "isKey": is_key,
            "mysqlType": mysql_t,
        }
        if cell is None:
            c["isNull"] = True
        else:
            c["isNull"] = False
            c["value"] = cell
            c["length"] = len(cell)
        if updated is not None:
            c["updated"] = updated[j]
        cols.append(c)
    return cols


def row_to_rowdata(op, doc_id, tokens, n_tok, source, before_tokens=None) -> dict:
    """One change-log row → a RowData with the op's image layout
    (INSERT: after only; DELETE: before only; UPDATE: before + after
    with per-column `updated` flags — ProtobufConverter.java:640-656)."""
    after = _cells(doc_id, tokens, n_tok, source)
    if op == "I":
        return {"afterColumns": _columns(after)}
    if op == "D":
        return {"beforeColumns": _columns(after)}
    before = _cells(
        doc_id,
        before_tokens,
        None if before_tokens is None else len(before_tokens),
        source,
    )
    updated = [b != a for b, a in zip(before, after)]
    return {
        "beforeColumns": _columns(before),
        "afterColumns": _columns(after, updated=updated),
    }


_ROWDATAS_TAG = 12 << 3 | 2  # RowChange.rowDatas, length-delimited


def pack_entries(
    rows: list[dict],
    *,
    logfile: str = "binlog.000001",
    server_id: int = 1,
    table_id: int = 1,
    schema_name: str = "binlake",
    table_name: str = "documents",
    ip: str = "spark",
    max_packet_size: int = MAX_PACKET_SIZE,
) -> list[tuple[bytes, int, int, bytes]]:
    """Pack rows (dicts with op/doc_id/tokens/n_tok/source/seq/sql/
    before_tokens) into Entry packets: consecutive same-op I/U/D runs
    share a RowChange, which splits at ``max_packet_size`` on row
    boundaries; op 'R' is a statement passthrough (bare
    ``RowChange{sql, eventType=QUERY}``, the formatRowsQuery/UserVar/
    IntVar/Rand analog — IConvert.java:120-132); op 'H' is a HEARTBEAT
    entry (entryType 4, empty storeValue, liveness header only); any
    other non-IUD op (QUERY/DDL, e.g. the generator's 'Q' rows) becomes
    its own ``RowChange{isDdl, sql}`` packet with no row images
    (formatQuery, ProtobufConverter.java:170-211).

    Returns [(key, event_type, n_rows, entry_bytes)]: key = first doc_id
    of the packet (the business-key order grade's partition slot).  Each
    RowData is encoded exactly once — the cached bytes serve both the
    size accounting and the final RowChange assembly (the repeated field
    is appended as raw length-delimited blocks, which the wire format
    permits in any field order)."""
    out: list[tuple[bytes, int, int, bytes]] = []
    run: list[dict] = []
    run_blobs: list[bytes] = []
    run_size = 0

    def entry_for(first: dict, et: int, store: bytes) -> bytes:
        header = {
            "version": 1,
            "logfileName": logfile,
            "logfileOffset": int(first.get("seq", 0)),
            "serverId": server_id,
            "serverenCode": "UTF-8",
            "executeTime": int(first.get("ts_ms", 0)),
            "schemaName": schema_name,
            "tableName": table_name,
            "eventLength": len(store),
            "eventType": et,
        }
        if first.get("gtid"):
            header["props"] = [{"key": "gtid", "value": first["gtid"]}]
        return encode_message(
            "Entry",
            {
                "header": header,
                "entryType": ENTRY_TYPE["ROWDATA"],
                "storeValue": store,
                "batchId": int(first.get("seq", 0)),
                "ip": ip,
            },
        )

    def flush():
        nonlocal run_size
        if not run:
            return
        first = run[0]
        et = _OP_TO_EVENT[first["op"]]
        store = bytearray(
            encode_message(
                "RowChange", {"tableId": table_id, "eventType": et, "isDdl": False}
            )
        )
        for blob in run_blobs:  # cached per-row encodings, appended raw
            _write_varint(store, _ROWDATAS_TAG)
            _write_varint(store, len(blob))
            store += blob
        out.append(
            (first["doc_id"].encode(), et, len(run), entry_for(first, et, bytes(store)))
        )
        run.clear()
        run_blobs.clear()
        run_size = 0

    for r in rows:
        if r["op"] == "H":  # HEARTBEAT (ENTRY_TYPE 4, entry.proto:22)
            flush()
            header = {
                "version": 1,
                "logfileName": logfile,
                "logfileOffset": int(r.get("seq", 0)),
                "serverId": server_id,
                "executeTime": int(r.get("ts_ms", 0)),
                "schemaName": schema_name,
                "tableName": table_name,
                # no eventType: a heartbeat announces liveness, not data
            }
            entry = encode_message(
                "Entry",
                {
                    "header": header,
                    "entryType": ENTRY_TYPE["HEARTBEAT"],
                    "storeValue": b"",
                    "batchId": int(r.get("seq", 0)),
                    "ip": ip,
                },
            )
            out.append(((r.get("doc_id") or "").encode(), 0, 0, entry))
            continue
        if r["op"] == "R":
            # statement passthrough — ROWS_QUERY / UserVar / IntVar /
            # Rand all format as a bare QUERY RowChange{sql, eventType}
            # with NO isDdl/tableId (buildQueryEntry,
            # ProtobufConverter.java:176-205; IConvert.java:120-132) —
            # consumers key on these for SQL audit trails
            flush()
            et = EVENT_TYPE["QUERY"]
            store = encode_message(
                "RowChange", {"eventType": et, "sql": r.get("sql") or ""}
            )
            out.append(((r.get("doc_id") or "").encode(), et, 0, entry_for(r, et, store)))
            continue
        if r["op"] not in _OP_TO_EVENT:  # QUERY/DDL marker row
            flush()
            et = EVENT_TYPE["QUERY"]
            store = encode_message(
                "RowChange",
                {
                    "tableId": table_id,
                    "eventType": et,
                    "isDdl": True,
                    "sql": r.get("sql") or "",
                    "ddlSchemaName": schema_name,
                },
            )
            out.append(((r.get("doc_id") or "").encode(), et, 0, entry_for(r, et, store)))
            continue
        if run and (r["op"] != run[0]["op"] or run_size > max_packet_size):
            flush()
        blob = encode_message(
            "RowData",
            row_to_rowdata(
                r["op"], r["doc_id"], r.get("tokens"), r.get("n_tok"),
                r.get("source"), r.get("before_tokens"),
            ),
        )
        run.append(r)
        run_blobs.append(blob)
        run_size += len(blob)
    flush()
    return out


def encode_entries(df: DataFrame, out_col: str = "entry") -> DataFrame:
    """Serialize a change-log DataFrame to WaveEntry packets in one
    ``mapInArrow`` pass — the protobuf twin of
    :func:`binlake_spark.functions.avro_codec.encode_envelopes`.

    Emits (key, event_type, n_rows, ``out_col``) per packet; rows are
    packed in batch order, so compose with
    ``sortWithinPartitions(seq)`` upstream (see streaming/produce.py)
    when per-key ordering must be physical."""
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            d = b.to_pydict()
            n = b.num_rows
            rows = []
            for i in range(n):
                extra = d.get("extra", [None] * n)[i]
                if isinstance(extra, list):
                    extra = dict(extra)
                ts = d.get("ts", [None] * n)[i]
                rows.append(
                    {
                        "op": d["op"][i],
                        "doc_id": d["doc_id"][i],
                        "tokens": d.get("tokens", [None] * n)[i],
                        "n_tok": d.get("n_tok", [None] * n)[i],
                        "source": d.get("source", [None] * n)[i],
                        "before_tokens": d.get("before_tokens", [None] * n)[i],
                        "seq": d.get("seq", [0] * n)[i],
                        "ts_ms": 0 if ts is None else int(ts.timestamp() * 1000),
                        # DDL statements ride extra['ddl']; passthrough
                        # statement rows (op 'R') ride extra['sql']
                        "sql": (extra or {}).get("ddl") or (extra or {}).get("sql"),
                    }
                )
            packets = pack_entries(rows)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([k for k, _, _, _ in packets], type=pa.binary()),
                    pa.array([et for _, et, _, _ in packets], type=pa.int32()),
                    pa.array([nr for _, _, nr, _ in packets], type=pa.int32()),
                    pa.array([eb for _, _, _, eb in packets], type=pa.binary()),
                ],
                names=["key", "event_type", "n_rows", out_col],
            )

    return df.mapInArrow(
        fn,
        T.StructType(
            [
                T.StructField("key", T.BinaryType()),
                T.StructField("event_type", T.IntegerType()),
                T.StructField("n_rows", T.IntegerType()),
                T.StructField(out_col, T.BinaryType()),
            ]
        ),
    )


def transaction_marker(kind: str, trx_id: int, ts_ms: int, thread_id: int = 0) -> bytes:
    """TRANSACTIONBEGIN/TRANSACTIONEND Entry (formatTransactionBegin/End,
    ProtobufConverter.java:61-117) — the txn-delimiter packets that
    bracket each ROWDATA run on the wire."""
    if kind == "begin":
        body = encode_message(
            "TransactionBegin",
            {"executeTime": ts_ms, "transactionId": str(trx_id), "threadId": thread_id},
        )
        et = ENTRY_TYPE["TRANSACTIONBEGIN"]
    else:
        body = encode_message(
            "TransactionEnd", {"executeTime": ts_ms, "transactionId": str(trx_id)}
        )
        et = ENTRY_TYPE["TRANSACTIONEND"]
    return encode_message(
        "Entry",
        {
            "header": {"version": 1, "executeTime": ts_ms},
            "entryType": et,
            "storeValue": body,
        },
    )
