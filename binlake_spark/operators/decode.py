"""Vectorized binlog-event decode & validation (Arrow, zero-copy).

The reference decodes row images byte-by-byte in Java
(RowsLogBuffer.fetchValue, RowsLogBuffer.java:248-1031 — per-column,
per-row).  The Spark-native rebuild does the same work **per Arrow batch
with zero copies**: the packed little-endian int32 token payload
(``binary``) is reinterpreted as ``list<int32>`` by rebuilding the Arrow
list offsets from the binary offsets — no Python-per-row, no memcpy of the
values buffer.  Validation (the token-array invariant
``n_tok == len(tokens)``, plus op-code membership — the event-type filter
analog, MQFilter.filterEventType, MQFilter.java:56-123) runs in the same
Arrow pass via ``pyarrow.compute``.

This is the engine's hot row-level path; everything else is JVM built-ins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import types as T

VALID_OPS = ("I", "U", "D")


def _binary_to_int32_list(arr: pa.Array) -> pa.Array:
    """Reinterpret a BinaryArray of packed little-endian int32 as
    ListArray<int32>, zero-copy on the values buffer."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("null payloads not supported in decode")
    validity, offsets_buf, data_buf = arr.buffers()
    byte_offsets = np.frombuffer(offsets_buf, dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    if byte_offsets[-1] % 4 or byte_offsets[0] % 4:
        raise ValueError("payload length not a multiple of 4")
    tok_offsets = pa.array((byte_offsets // 4).astype(np.int32), type=pa.int32())
    n_vals = len(data_buf) // 4
    values = pa.Array.from_buffers(pa.int32(), n_vals, [None, data_buf])
    return pa.ListArray.from_arrays(tok_offsets, values)


def decode_and_validate_batch(
    batch: pa.RecordBatch,
    payload_col: str = "payload",
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    op_col: str = "op",
    drop_invalid: bool = True,
) -> pa.RecordBatch:
    """One Arrow pass: payload → tokens, then invariant filter."""
    names = batch.schema.names
    tokens = _binary_to_int32_list(batch.column(names.index(payload_col)))
    arrays, out_names = [], []
    for name in names:
        if name == payload_col:
            continue
        if name == tokens_col:
            arrays.append(tokens)
        else:
            arrays.append(batch.column(names.index(name)))
        out_names.append(name)
    if tokens_col not in names:
        arrays.append(tokens)
        out_names.append(tokens_col)
    out = pa.RecordBatch.from_arrays(arrays, names=out_names)
    if drop_invalid:
        n_tok = out.column(out_names.index(n_tok_col))
        op = out.column(out_names.index(op_col))
        ok = pc.and_(
            pc.equal(pc.list_value_length(out.column(out_names.index(tokens_col))).cast(n_tok.type), n_tok),
            pc.is_in(op, value_set=pa.array(VALID_OPS)),
        )
        out = out.filter(ok)
    return out


def decoded_schema(
    in_schema: T.StructType,
    payload_col: str = "payload",
    tokens_col: str = "tokens",
) -> T.StructType:
    """Schema after decode: ``payload`` replaced by ``tokens: array<int>``
    (position preserved where possible)."""
    fields = []
    seen_tokens = False
    for f in in_schema.fields:
        if f.name == payload_col:
            continue
        if f.name == tokens_col:
            fields.append(T.StructField(tokens_col, T.ArrayType(T.IntegerType()), True))
            seen_tokens = True
        else:
            fields.append(f)
    if not seen_tokens:
        fields.append(T.StructField(tokens_col, T.ArrayType(T.IntegerType()), True))
    return T.StructType(fields)


def decode_and_validate(
    df: DataFrame,
    payload_col: str = "payload",
    tokens_col: str = "tokens",
    n_tok_col: str = "n_tok",
    op_col: str = "op",
    drop_invalid: bool = True,
) -> DataFrame:
    """Spark-side wrapper: ``mapInArrow`` over the event stream."""
    out_schema = decoded_schema(df.schema, payload_col, tokens_col)

    def fn(batches):
        for b in batches:
            yield decode_and_validate_batch(
                b,
                payload_col=payload_col,
                tokens_col=tokens_col,
                n_tok_col=n_tok_col,
                op_col=op_col,
                drop_invalid=drop_invalid,
            )

    return df.mapInArrow(fn, out_schema)
