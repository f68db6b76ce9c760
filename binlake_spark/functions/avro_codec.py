"""Minimal Apache Avro *binary* codec for change-event envelopes.

The reference declares an Avro output converter but ships it entirely
empty — every ``format*`` body is a stub (AvroConverter.java:18-93).
This module implements the real thing for the envelope use case: a
dependency-free encoder/decoder for the published Avro 1.11 binary
encoding (zigzag-varint longs, length-prefixed bytes/strings,
block-encoded arrays/maps, branch-indexed unions, field-ordered
records), plus the change-event envelope schema and a Spark
``mapInArrow`` pass that serializes a change-log DataFrame to Avro
binary values — the Kafka-value serialization path of the reference's
convert → produce pipeline (Converter.java → IProducer), Spark-shaped.

Scope is the subset the envelope needs: ``null boolean int long float
double bytes string record array map union``.  No schema resolution /
logical types — the envelope is writer==reader.

Scale posture: encoding is per-row by nature (as in any Avro producer);
it runs inside ``mapInArrow`` so the Python cost parallelizes with the
partitions and nothing ever collects.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ------------------------------------------------------------------ #
# primitive wire codec (Avro spec "Binary encoding")
# ------------------------------------------------------------------ #


def _write_long(out: bytearray, n: int) -> None:
    # zigzag then varint, little 7-bit groups, high bit = continuation
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def _is_union(schema) -> bool:
    return isinstance(schema, list)


def _type_name(schema) -> str:
    return schema["type"] if isinstance(schema, dict) else schema


def _write(out: bytearray, schema, v) -> None:
    if _is_union(schema):
        # branch index, then the branch's value
        for i, branch in enumerate(schema):
            if _matches(branch, v):
                _write_long(out, i)
                _write(out, branch, v)
                return
        raise ValueError(f"value {v!r} matches no union branch {schema!r}")
    t = _type_name(schema)
    if t == "null":
        if v is not None:
            raise ValueError(f"null schema got {v!r}")
    elif t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        _write_long(out, int(v))
    elif t == "float":
        out += struct.pack("<f", v)
    elif t == "double":
        out += struct.pack("<d", v)
    elif t == "bytes":
        _write_long(out, len(v))
        out += v
    elif t == "string":
        raw = v.encode("utf-8")
        _write_long(out, len(raw))
        out += raw
    elif t == "record":
        for f in schema["fields"]:
            _write(out, f["type"], v[f["name"]])
    elif t == "array":
        if v:
            _write_long(out, len(v))
            for item in v:
                _write(out, schema["items"], item)
        _write_long(out, 0)
    elif t == "map":
        if v:
            _write_long(out, len(v))
            for k, item in v.items():
                _write(out, "string", k)
                _write(out, schema["values"], item)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _matches(schema, v) -> bool:
    t = _type_name(schema)
    if t == "null":
        return v is None
    if v is None:
        return False
    if t == "boolean":
        return isinstance(v, bool)
    if t in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if t in ("float", "double"):
        return isinstance(v, float)
    if t == "bytes":
        return isinstance(v, (bytes, bytearray))
    if t == "string":
        return isinstance(v, str)
    if t == "record":
        return isinstance(v, dict)
    if t == "array":
        return isinstance(v, list)
    if t == "map":
        return isinstance(v, dict)
    return False


def _read(buf: bytes, pos: int, schema):
    if _is_union(schema):
        idx, pos = _read_long(buf, pos)
        return _read(buf, pos, schema[idx])
    t = _type_name(schema)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "bytes":
        n, pos = _read_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if t == "string":
        n, pos = _read_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _read(buf, pos, f["type"])
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix (spec-legal form)
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = _read(buf, pos, schema["items"])
                items.append(v)
        return items, pos
    if t == "map":
        m = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = _read(buf, pos, "string")
                m[k], pos = _read(buf, pos, schema["values"])
        return m, pos
    raise ValueError(f"unsupported Avro type {t!r}")


def encode(schema, value) -> bytes:
    out = bytearray()
    _write(out, schema, value)
    return bytes(out)


def decode(schema, buf: bytes):
    value, pos = _read(buf, 0, schema)
    if pos != len(buf):
        raise ValueError(f"{len(buf) - pos} trailing bytes after value")
    return value


# ------------------------------------------------------------------ #
# change-event envelope (entry.proto's RowData essentials, Avro-shaped)
# ------------------------------------------------------------------ #

ENVELOPE_SCHEMA = {
    "type": "record",
    "name": "ChangeEvent",
    "fields": [
        {"name": "seq", "type": "long"},
        {"name": "doc_id", "type": "string"},
        {"name": "op", "type": "string"},
        {"name": "n_tok", "type": ["null", "int"]},
        {"name": "payload", "type": ["null", "bytes"]},
        {"name": "extra", "type": ["null", {"type": "map", "values": "string"}]},
    ],
}


def envelope_record(
    d: dict, i: int, n: int, key_col: str = "doc_id", seq_col: str = "seq"
) -> dict:
    """Row i of an Arrow batch pydict → the ENVELOPE_SCHEMA record (the
    single place the column→record mapping lives; used by both
    encode_envelopes and streaming/produce.ordered_produce)."""
    rec = {
        "seq": d[seq_col][i],
        "doc_id": d[key_col][i],
        "op": d.get("op", ["?"] * n)[i],
        "n_tok": d.get("n_tok", [None] * n)[i],
        "payload": d.get("payload", [None] * n)[i],
        "extra": d.get("extra", [None] * n)[i],
    }
    if isinstance(rec["extra"], list):  # arrow map -> pairs
        rec["extra"] = dict(rec["extra"])
    return rec


def encode_envelope_batch(
    d: dict, n: int, key_col: str = "doc_id", seq_col: str = "seq"
) -> list[bytes]:
    """Encode ``n`` rows of an Arrow batch pydict to ENVELOPE_SCHEMA
    Avro binary in one pass — bit-identical to
    ``encode(ENVELOPE_SCHEMA, envelope_record(d, i, n))`` per row
    (property-pinned in tests/test_avro_codec.py) but with the envelope
    layout hand-inlined: no per-row schema walk, no union matching, no
    per-row record dict, and the op-string encoding memoized (the op
    alphabet is I/U/D/Q).  Producer serialization is per-record by
    nature (the reference encodes per event in Java); this is the
    jar-free Python fast path — deployments with the spark-avro package
    should swap in JVM ``to_avro`` (see streaming/produce.py)."""
    seqs = d[seq_col]
    ids = d[key_col]
    ops = d.get("op") or ["?"] * n
    ntoks = d.get("n_tok") or [None] * n
    payloads = d.get("payload") or [None] * n
    extras = d.get("extra") or [None] * n
    wl = _write_long
    op_enc: dict[str, bytes] = {}
    out: list[bytes] = []
    for i in range(n):
        buf = bytearray()
        wl(buf, seqs[i])  # seq: long
        raw = ids[i].encode("utf-8")  # doc_id: string
        wl(buf, len(raw))
        buf += raw
        op = ops[i]  # op: string (memoized len+bytes)
        enc = op_enc.get(op)
        if enc is None:
            tmp = bytearray()
            o = op.encode("utf-8")
            wl(tmp, len(o))
            op_enc[op] = enc = bytes(tmp + o)
        buf += enc
        nt = ntoks[i]  # n_tok: union(null, int) — index 0 → 0x00, 1 → 0x02
        if nt is None:
            buf.append(0)
        else:
            buf.append(2)
            wl(buf, nt)
        p = payloads[i]  # payload: union(null, bytes)
        if p is None:
            buf.append(0)
        else:
            buf.append(2)
            wl(buf, len(p))
            buf += p
        ex = extras[i]  # extra: union(null, map<string,string>)
        if ex is None:
            buf.append(0)
        else:
            buf.append(2)
            if not isinstance(ex, dict):
                # Arrow map columns arrive as list-of-(k, v) pairs;
                # dict() dedupes duplicate keys (last wins) exactly like
                # envelope_record's normalization, keeping the
                # bit-identical contract even on duplicate-key input
                ex = dict(ex)
            m = len(ex)
            if m:
                wl(buf, m)
                for k, v in ex.items():
                    kr = k.encode("utf-8")
                    wl(buf, len(kr))
                    buf += kr
                    vr = v.encode("utf-8")
                    wl(buf, len(vr))
                    buf += vr
            buf.append(0)  # map terminator block
        out.append(bytes(buf))
    return out


def encode_envelopes(df: DataFrame, out_col: str = "avro") -> DataFrame:
    """Serialize change-log rows to Avro-binary envelope values in one
    ``mapInArrow`` pass: (seq, doc_id, op, n_tok, payload, extra) →
    ``key`` (the produce partition key, as bytes of the doc_id string —
    the key generator output slot) + ``out_col`` Avro bytes."""
    import pyarrow as pa

    def fn(batches):
        for b in batches:
            d = b.to_pydict()
            n = b.num_rows
            keys = [s.encode() for s in d["doc_id"]]
            vals = encode_envelope_batch(d, n)
            yield pa.RecordBatch.from_arrays(
                [pa.array(keys, type=pa.binary()), pa.array(vals, type=pa.binary())],
                names=["key", out_col],
            )

    return df.mapInArrow(
        fn,
        T.StructType(
            [
                T.StructField("key", T.BinaryType()),
                T.StructField(out_col, T.BinaryType()),
            ]
        ),
    )
