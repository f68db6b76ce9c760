"""MySQL binlog wire-format value decode — the RowsLogBuffer rebuild.

The reference's most-cited subsystem is the byte-level decode of row-image
values (RowsLogBuffer.fetchValue,
binlake-wave.dbsync/.../RowsLogBuffer.java:248-1031): NEWDECIMAL's packed
base-10^9 groups, DATETIME2/TIME2/TIMESTAMP2's packed big-endian fields
with fractional-second tails.  This module implements those wire formats
from the *published* MySQL on-disk/binlog format (strings/decimal.c
``decimal2bin``/``bin2decimal`` and sql-common/my_time.c packing rules —
public knowledge, not a code port), with:

- **vectorized decode**: fixed-width byte buffers are stacked into a
  numpy (n, width) uint8 matrix; sign handling, group extraction, and
  field unpacking are all columnwise array ops.  Only the final
  ``Decimal``/timestamp object materialization touches Python objects.
- **encoders** for round-trip tests and synthetic wire data (the
  reference never encodes — MySQL does — so the encoder here exists to
  generate test vectors; fixed known-good byte strings from the
  published format anchor it, see tests/test_binlog_decode.py).
- :func:`decode_wire_columns` — the Spark integration: an Arrow-batched
  ``mapInArrow`` pass that decodes binary columns into typed columns
  (decimal128 / timestamp) in one JVM↔Python round trip, the same fused
  shape as the engine's token-payload decode (operators/decode.py).

Wire formats implemented:

NEWDECIMAL(P, S): digits packed big-endian in base-10^9 int32 groups;
  leading partial group of (intg % 9) digits uses DIG2BYTES bytes, then
  intg//9 full 4-byte groups; fraction likewise (full groups first, then
  the partial).  The stored buffer is XORed with 0xFF when negative, and
  the first byte's MSB is flipped (1 = non-negative).
DATETIME2(fsp): 5 bytes BE = 0x8000000000 + (((year*13+month) << 22) |
  (day << 17) | (hour << 12) | (minute << 6) | second), then
  (fsp+1)//2 bytes BE of fractional seconds in units of 10^(2*fb-6)^-1.
TIMESTAMP2(fsp): 4 bytes BE epoch seconds + the same fractional tail.
TIME2(fsp): 3 bytes BE of 0x800000 + intpart where the *signed* packed
  value is ±((hour << 12 | minute << 6 | second) << 24 | microseconds)
  (my_time.c TIME_to_longlong_time_packed); negative times (MySQL TIME
  ranges to -838:59:59) store floor-shifted intpart and a two's-complement
  fractional tail — decode reverses with the intpart++ / frac -= 2^(8·fb)
  rule (the reference's RowsLogBuffer.java TIME2 case :562-692).
Pre-5.6 v0 formats (the reference decodes both generations —
  RowsLogBuffer.java:402-465 TIMESTAMP, :466-560 DATETIME, :562+ TIME):
  TIMESTAMP = 4 bytes LE epoch seconds; DATETIME = 8 bytes LE of the
  decimal-packed integer YYYYMMDDHHMMSS; TIME = 3 bytes LE signed
  int24 of HHMMSS (sign carries negative times).
Zero dates: MySQL binlogs legitimately carry 0000-00-00 (packed 0, or
  month/day 0); all date/datetime decoders yield NaT/NULL for them (the
  reference emits the "0000-00-00" literal; NULL is the lake-typed
  equivalent).
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np

DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


# --------------------------------------------------------------------- #
# NEWDECIMAL
# --------------------------------------------------------------------- #
def newdecimal_bin_size(precision: int, scale: int) -> int:
    intg = precision - scale
    intg0, intg0x = divmod(intg, 9)
    frac0, frac0x = divmod(scale, 9)
    return intg0 * 4 + DIG2BYTES[intg0x] + frac0 * 4 + DIG2BYTES[frac0x]


def _group_layout(precision: int, scale: int) -> list[tuple[int, int, int]]:
    """[(byte_offset, byte_width, n_digits)] most-significant first."""
    intg = precision - scale
    intg0, intg0x = divmod(intg, 9)
    frac0, frac0x = divmod(scale, 9)
    out = []
    pos = 0
    if intg0x:
        w = DIG2BYTES[intg0x]
        out.append((pos, w, intg0x))
        pos += w
    for _ in range(intg0):
        out.append((pos, 4, 9))
        pos += 4
    for _ in range(frac0):
        out.append((pos, 4, 9))
        pos += 4
    if frac0x:
        out.append((pos, DIG2BYTES[frac0x], frac0x))
    return out


def encode_newdecimal(values, precision: int, scale: int) -> list[bytes]:
    """Encode Decimal/str values to NEWDECIMAL wire bytes (test/vector
    generator side — MySQL is the producer in production)."""
    layout = _group_layout(precision, scale)
    width = newdecimal_bin_size(precision, scale)
    out = []
    for v in values:
        d = Decimal(str(v))
        # exact unscaled integer via as_tuple — scaleb/quantize would round
        # at the default context's 28 significant digits (P can be 38)
        sign, digits, exp = d.as_tuple()
        neg = sign == 1
        shift = exp + scale
        if shift < 0:
            raise ValueError(f"{d} has more than {scale} fraction digits")
        unscaled = int("".join(map(str, digits)) or "0") * 10**shift
        # peel digit groups off the unscaled integer, least significant
        # first, using each group's digit count from the layout reversed
        group_vals: list[int] = []
        rem = unscaled
        for _, _, nd in reversed(layout):
            rem, g = divmod(rem, 10**nd)
            group_vals.append(g)
        if rem:
            raise ValueError(f"{d} does not fit DECIMAL({precision},{scale})")
        group_vals.reverse()
        buf = bytearray()
        for (_, w, _), gv in zip(layout, group_vals):
            buf.extend(int(gv).to_bytes(w, "big"))
        assert len(buf) == width, (len(buf), width)
        if neg:
            buf = bytearray(b ^ 0xFF for b in buf)
        buf[0] ^= 0x80
        out.append(bytes(buf))
    return out


def decode_newdecimal(bufs, precision: int, scale: int) -> list[Decimal]:
    """Vectorized NEWDECIMAL decode: (n, width) uint8 matrix → Decimals."""
    width = newdecimal_bin_size(precision, scale)
    n = len(bufs)
    if n == 0:
        return []
    m = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(n, width).copy()
    positive = (m[:, 0] & 0x80) != 0
    m[:, 0] ^= 0x80
    m[~positive] ^= 0xFF
    unscaled = np.zeros(n, dtype=object)
    for pos, w, nd in _group_layout(precision, scale):
        gv = np.zeros(n, dtype=np.int64)
        for k in range(w):
            gv = gv * 256 + m[:, pos + k]
        unscaled = unscaled * (10**nd) + gv
    # exact Decimal construction via as_tuple (no context rounding at P=38)
    return [
        Decimal((0 if pos else 1, tuple(int(c) for c in str(int(u))), -scale))
        for pos, u in zip(positive, unscaled)
    ]


# --------------------------------------------------------------------- #
# temporal types
# --------------------------------------------------------------------- #
def _frac_bytes(fsp: int) -> int:
    return (fsp + 1) // 2


def _read_be(m: np.ndarray, lo: int, hi: int) -> np.ndarray:
    v = np.zeros(len(m), dtype=np.int64)
    for k in range(lo, hi):
        v = v * 256 + m[:, k]
    return v


def _frac_micros(m: np.ndarray, off: int, fsp: int) -> np.ndarray:
    fb = _frac_bytes(fsp)
    if fb == 0:
        return np.zeros(len(m), dtype=np.int64)
    return _read_be(m, off, off + fb) * 10 ** (6 - 2 * fb)


def encode_datetime2(timestamps, fsp: int = 6) -> list[bytes]:
    """numpy datetime64/pandas Timestamp/datetime → DATETIME2 wire bytes."""
    import pandas as pd

    fb = _frac_bytes(fsp)
    out = []
    for t in timestamps:
        t = pd.Timestamp(t)
        packed = (
            0x8000000000
            + (((t.year * 13 + t.month) << 22) | (t.day << 17)
               | (t.hour << 12) | (t.minute << 6) | t.second)
        )
        buf = packed.to_bytes(5, "big")
        if fb:
            frac = t.microsecond // (10 ** (6 - 2 * fb))
            buf += int(frac).to_bytes(fb, "big")
        out.append(buf)
    return out


def decode_datetime2(bufs, fsp: int = 6) -> np.ndarray:
    """Vectorized DATETIME2 decode → datetime64[us] array."""
    fb = _frac_bytes(fsp)
    width = 5 + fb
    n = len(bufs)
    if n == 0:
        return np.array([], dtype="datetime64[us]")
    m = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(n, width)
    packed = _read_be(m, 0, 5) - 0x8000000000
    ymd = packed >> 17
    ym = ymd >> 5
    day = ymd & 0x1F
    year = ym // 13
    month = ym % 13
    hms = packed & 0x1FFFF
    hour = hms >> 12
    minute = (hms >> 6) & 0x3F
    second = hms & 0x3F
    micros = _frac_micros(m, 5, fsp)
    # zero dates (0000-00-00[ 00:00:00], or month/day 0) → NaT, not a
    # bogus shifted date (the reference emits the zero literal)
    zero = (month == 0) | (day == 0)
    month = np.where(zero, 1, month)
    day = np.where(zero, 1, day)
    # vectorized calendar → datetime64: months since 1970-01, then days
    months = (year - 1970) * 12 + (month - 1)
    base = (np.datetime64("1970-01", "M") + months).astype("datetime64[D]") + (
        day - 1
    )
    out = base.astype("datetime64[us]") + (
        hour * 3_600_000_000 + minute * 60_000_000 + second * 1_000_000 + micros
    ).astype("timedelta64[us]")
    out[zero] = np.datetime64("NaT")
    return out


def encode_timestamp2(timestamps, fsp: int = 6) -> list[bytes]:
    import pandas as pd

    fb = _frac_bytes(fsp)
    out = []
    for t in timestamps:
        t = pd.Timestamp(t)
        epoch = int(t.value // 1_000_000_000)
        buf = epoch.to_bytes(4, "big")
        if fb:
            frac = t.microsecond // (10 ** (6 - 2 * fb))
            buf += int(frac).to_bytes(fb, "big")
        out.append(buf)
    return out


def decode_timestamp2(bufs, fsp: int = 6) -> np.ndarray:
    fb = _frac_bytes(fsp)
    width = 4 + fb
    n = len(bufs)
    if n == 0:
        return np.array([], dtype="datetime64[us]")
    m = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(n, width)
    secs = _read_be(m, 0, 4)
    micros = _frac_micros(m, 4, fsp)
    out = (secs * 1_000_000 + micros).astype("timedelta64[us]") + np.datetime64(
        "1970-01-01", "us"
    )
    # zero TIMESTAMP → NaT (see decode_timestamp_v0)
    out[(secs == 0) & (micros == 0)] = np.datetime64("NaT")
    return out


def encode_time2(deltas, fsp: int = 6) -> list[bytes]:
    """timedelta-like (±838:59:59.999999) → TIME2 wire bytes, following
    my_time.c my_time_packed_to_binary: the signed packed value is
    nr = ±((h<<12|mi<<6|s) << 24 | micros); storage is
    fb∈{0,1,2}: int3be(0x800000 + (nr >> 24)) + two's-complement frac
    tail of (trunc-mod frac)/10^(6-2·fb); fb=3: int6be(nr + 2^47)."""
    import pandas as pd

    fb = _frac_bytes(fsp)
    out = []
    for d in deltas:
        d = pd.Timedelta(d)
        total = int(d.value // 1_000)  # us (sign preserved)
        neg = total < 0
        secs, micros = divmod(abs(total), 1_000_000)
        h, rem = divmod(secs, 3600)
        mi, s = divmod(rem, 60)
        hms = (h << 12) | (mi << 6) | s
        nr = -((hms << 24) | micros) if neg else ((hms << 24) | micros)
        if fb == 3:
            out.append((nr + 0x800000000000).to_bytes(6, "big"))
            continue
        unit = 10 ** (6 - 2 * fb)
        sf = micros // unit  # scaled |frac|
        # C trunc semantics: intpart = nr >> 24 (arithmetic/floor shift),
        # frac = nr % 2^24 truncated toward zero then scaled
        if neg and sf > 0:
            int_store = 0x800000 - hms - 1
            frac_store = (1 << (8 * fb)) - sf
        else:
            int_store = 0x800000 + (-hms if neg else hms)
            frac_store = sf
        buf = int_store.to_bytes(3, "big")
        if fb:
            buf += int(frac_store).to_bytes(fb, "big")
        out.append(buf)
    return out


def decode_time2(bufs, fsp: int = 6) -> np.ndarray:
    """Sign-aware TIME2 decode (the reference's RowsLogBuffer TIME2 case
    :562-692 incl. the negative intpart++ / frac -= 2^(8·fb) rule)."""
    fb = _frac_bytes(fsp)
    width = 3 + fb
    n = len(bufs)
    if n == 0:
        return np.array([], dtype="timedelta64[us]")
    m = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(n, width)
    if fb == 3:
        nr = _read_be(m, 0, 6) - 0x800000000000
        sign = np.where(nr < 0, -1, 1)
        a = np.abs(nr)
        hms = a >> 24
        micros = a & 0xFFFFFF
    else:
        intpart = _read_be(m, 0, 3) - 0x800000
        frac = (
            _read_be(m, 3, 3 + fb) if fb else np.zeros(n, dtype=np.int64)
        )
        # negative wires store floor-shifted intpart + two's-complement
        # frac: reverse with intpart++ / frac -= 2^(8·fb)
        adj = (intpart < 0) & (frac > 0)
        intpart = np.where(adj, intpart + 1, intpart)
        frac = np.where(adj, frac - (1 << (8 * fb)), frac)
        sign = np.where(intpart < 0, -1, np.where((intpart == 0) & (frac < 0), -1, 1))
        hms = np.abs(intpart)
        micros = np.abs(frac) * 10 ** (6 - 2 * fb) if fb else frac
    h = (hms >> 12) & 0x3FF
    mi = (hms >> 6) & 0x3F
    s = hms & 0x3F
    return (
        sign * (h * 3_600_000_000 + mi * 60_000_000 + s * 1_000_000 + micros)
    ).astype("timedelta64[us]")


# --------------------------------------------------------------------- #
# pre-5.6 (v0) temporal wire formats — the reference decodes both format
# generations (RowsLogBuffer.java: TIMESTAMP :402-465, DATETIME :466-560,
# TIME :562-692); any binlog written by MySQL < 5.6.4, or a 5.6+ server
# with old-format columns, carries these.
# --------------------------------------------------------------------- #
def encode_timestamp_v0(timestamps) -> list[bytes]:
    """v0 TIMESTAMP: 4 bytes LE epoch seconds."""
    import pandas as pd

    return [
        int(pd.Timestamp(t).value // 1_000_000_000).to_bytes(4, "little")
        for t in timestamps
    ]


def decode_timestamp_v0(bufs) -> np.ndarray:
    n = len(bufs)
    if n == 0:
        return np.array([], dtype="datetime64[us]")
    m = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(n, 4)
    secs = (
        m[:, 0].astype(np.int64)
        | (m[:, 1].astype(np.int64) << 8)
        | (m[:, 2].astype(np.int64) << 16)
        | (m[:, 3].astype(np.int64) << 24)
    )
    out = (secs * 1_000_000).astype("timedelta64[us]") + np.datetime64(
        "1970-01-01", "us"
    )
    # zero TIMESTAMP ('0000-00-00 00:00:00', stored as 0 epoch seconds —
    # RowsLogBuffer's TIMESTAMP arm emits the zero literal) → NaT, not a
    # fabricated 1970-01-01 (module zero-date rule)
    out[secs == 0] = np.datetime64("NaT")
    return out


def encode_datetime_v0(timestamps) -> list[bytes]:
    """v0 DATETIME: 8 bytes LE of the decimal-packed int YYYYMMDDHHMMSS."""
    import pandas as pd

    out = []
    for t in timestamps:
        t = pd.Timestamp(t)
        packed = (t.year * 10_000 + t.month * 100 + t.day) * 1_000_000 + (
            t.hour * 10_000 + t.minute * 100 + t.second
        )
        out.append(int(packed).to_bytes(8, "little"))
    return out


def decode_datetime_v0(bufs) -> np.ndarray:
    """v0 DATETIME decode; zero dates (packed 0 / month 0 / day 0) → NaT."""
    n = len(bufs)
    if n == 0:
        return np.array([], dtype="datetime64[us]")
    m = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(n, 8)
    packed = np.zeros(n, dtype=np.int64)
    for k in range(7, -1, -1):
        packed = (packed << 8) | m[:, k].astype(np.int64)
    date = packed // 1_000_000
    t = packed % 1_000_000
    year = date // 10_000
    month = (date // 100) % 100
    day = date % 100
    hour = t // 10_000
    minute = (t // 100) % 100
    second = t % 100
    zero = (month == 0) | (day == 0)
    month = np.where(zero, 1, month)
    day = np.where(zero, 1, day)
    months = (year - 1970) * 12 + (month - 1)
    base = (np.datetime64("1970-01", "M") + months).astype("datetime64[D]") + (
        day - 1
    )
    out = base.astype("datetime64[us]") + (
        hour * 3_600_000_000 + minute * 60_000_000 + second * 1_000_000
    ).astype("timedelta64[us]")
    out[zero] = np.datetime64("NaT")
    return out


def encode_time_v0(deltas) -> list[bytes]:
    """v0 TIME: 3 bytes LE signed int24 of ±(h·10000 + mi·100 + s)."""
    import pandas as pd

    out = []
    for d in deltas:
        d = pd.Timedelta(d)
        total = int(d.value // 1_000_000_000)  # whole seconds, signed
        neg = total < 0
        h, rem = divmod(abs(total), 3600)
        mi, s = divmod(rem, 60)
        packed = h * 10_000 + mi * 100 + s
        if neg:
            packed = -packed
        out.append((packed & 0xFFFFFF).to_bytes(3, "little"))
    return out


def decode_time_v0(bufs) -> np.ndarray:
    n = len(bufs)
    if n == 0:
        return np.array([], dtype="timedelta64[us]")
    m = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(n, 3)
    packed = (
        m[:, 0].astype(np.int64)
        | (m[:, 1].astype(np.int64) << 8)
        | (m[:, 2].astype(np.int64) << 16)
    )
    packed = np.where(packed & 0x800000, packed - 0x1000000, packed)  # signed
    sign = np.where(packed < 0, -1, 1)
    a = np.abs(packed)
    h = a // 10_000
    mi = (a // 100) % 100
    s = a % 100
    return (sign * (h * 3600 + mi * 60 + s) * 1_000_000).astype("timedelta64[us]")


# --------------------------------------------------------------------- #
# Spark integration — one fused Arrow pass
# --------------------------------------------------------------------- #
def decode_wire_columns(df, specs: dict):
    """Decode binary wire columns into typed columns in ONE ``mapInArrow``
    pass (fused like the engine's token decode — the batch crosses the
    JVM↔Python boundary once, whatever the number of columns).

    ``specs``: {col: ("newdecimal", P, S) | ("datetime2", fsp) |
    ("timestamp2", fsp) | ("time2", fsp) | ("time2_us", fsp) | ("jsonb",) |
    ("datetime_v0",) | ("timestamp_v0",) | ("time_v0",) | ("time_v0_us",) |
    ("date",) | ("string", collation_id)}.  ``string`` decodes the whole
    binary cell as text via the collation's codec
    (functions/charset.py); the binary collation (63) keeps bytes.
    ``time2_us``/``time_v0_us``
    decode TIME to signed total microseconds as BIGINT (the portable
    lake representation — interval↔numeric casts are not portable across
    engines, raw micros are).  The binary
    column is replaced by a typed column of the same name (decimal128(P,S)
    / timestamp_ntz / duration / string).  NULL cells propagate: the
    non-null subset is decoded vectorized and nulls are reinserted
    (reference: nextOneRow's null-bitmap skip, RowsLogBuffer.java:55-69).
    """
    import pyarrow as pa
    from pyspark.sql import types as T

    def spark_type(spec):
        kind = spec[0]
        if kind == "newdecimal":
            return T.DecimalType(spec[1], spec[2])
        if kind in ("datetime2", "timestamp2", "datetime_v0", "timestamp_v0"):
            return T.TimestampNTZType()
        if kind in ("time2", "time_v0"):
            return T.DayTimeIntervalType()
        if kind in ("time2_us", "time_v0_us"):
            return T.LongType()
        if kind == "date":
            return T.DateType()
        if kind == "jsonb":
            return T.StringType()
        if kind == "string":
            from binlake_spark.functions.charset import codec_for_collation

            collation = spec[1] if len(spec) > 1 else 33
            return (
                T.BinaryType()
                if codec_for_collation(collation) is None
                else T.StringType()
            )
        raise ValueError(f"unknown wire type {kind!r}")

    out_schema = T.StructType(
        [
            T.StructField(f.name, spark_type(specs[f.name]), True)
            if f.name in specs
            else f
            for f in df.schema.fields
        ]
    )

    def decode_nonnull(spec, raw):
        kind = spec[0]
        if kind == "newdecimal":
            return decode_newdecimal(raw, spec[1], spec[2]), pa.decimal128(
                spec[1], spec[2]
            )
        if kind == "datetime2":
            return decode_datetime2(raw, spec[1]), pa.timestamp("us")
        if kind == "timestamp2":
            return decode_timestamp2(raw, spec[1]), pa.timestamp("us")
        if kind == "time2":
            return decode_time2(raw, spec[1]), pa.duration("us")
        if kind == "time2_us":
            return decode_time2(raw, spec[1]).astype(np.int64), pa.int64()
        if kind == "datetime_v0":
            return decode_datetime_v0(raw), pa.timestamp("us")
        if kind == "timestamp_v0":
            return decode_timestamp_v0(raw), pa.timestamp("us")
        if kind == "time_v0":
            return decode_time_v0(raw), pa.duration("us")
        if kind == "time_v0_us":
            return decode_time_v0(raw).astype(np.int64), pa.int64()
        if kind == "date":
            d = decode_date(raw)
            # datetime64[D] scalars don't auto-convert to arrow date32;
            # go through datetime.date (NaT → null)
            return [
                None if np.isnat(v) else v.astype(object) for v in d
            ], pa.date32()
        if kind == "jsonb":
            return decode_jsonb(raw), pa.string()
        if kind == "string":
            from binlake_spark.functions.charset import codec_for_collation

            codec = codec_for_collation(spec[1] if len(spec) > 1 else 33)
            if codec is None:
                return raw, pa.binary()
            return [c.decode(codec) for c in raw], pa.string()
        raise ValueError(f"unknown wire type {kind!r}")

    def fn(batches):
        for b in batches:
            cols = []
            for name, col in zip(b.schema.names, b.columns):
                if name in specs:
                    cells = [v.as_py() for v in col]
                    idx = [i for i, c in enumerate(cells) if c is not None]
                    raw = [cells[i] for i in idx]
                    vals, typ = decode_nonnull(specs[name], raw)
                    full = [None] * len(cells)
                    for i, v in zip(idx, list(vals)):
                        full[i] = v
                    cols.append(pa.array(full, type=typ))
                else:
                    cols.append(col)
            yield pa.RecordBatch.from_arrays(cols, schema=pa.schema(
                [(n, c.type) for n, c in zip(b.schema.names, cols)]
            ))

    return df.mapInArrow(fn, out_schema)


# --------------------------------------------------------------------- #
# JSONB — MySQL binary JSON → JSON text
# --------------------------------------------------------------------- #
# The reference's JsonConversion.parse_value walk
# (binlake-wave.dbsync/.../JsonConversion.java:55-69, +418 total) rebuilt
# from the published json_binary format: a type byte then a payload;
# objects/arrays store element counts + byte sizes + offset tables with
# small (2-byte) and large (4-byte) variants; int16/uint16 (+int32/uint32
# in large containers) and literals are inlined in the offset slot;
# strings carry a varint length.  Decode is per-value recursive (as in the
# reference) but runs inside Arrow batches via decode_wire_columns-style
# usage — the JVM↔Python boundary is crossed once per batch, not per row.

_JSONB_SMALL_OBJECT = 0x00
_JSONB_LARGE_OBJECT = 0x01
_JSONB_SMALL_ARRAY = 0x02
_JSONB_LARGE_ARRAY = 0x03
_JSONB_LITERAL = 0x04
_JSONB_INT16 = 0x05
_JSONB_UINT16 = 0x06
_JSONB_INT32 = 0x07
_JSONB_UINT32 = 0x08
_JSONB_INT64 = 0x09
_JSONB_UINT64 = 0x0A
_JSONB_DOUBLE = 0x0B
_JSONB_STRING = 0x0C


def _jsonb_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Variable-length string length: 7 bits per byte, high bit = more."""
    n, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _jsonb_value(type_byte: int, buf: bytes, pos: int):
    import struct

    if type_byte in (_JSONB_SMALL_OBJECT, _JSONB_LARGE_OBJECT,
                     _JSONB_SMALL_ARRAY, _JSONB_LARGE_ARRAY):
        large = type_byte in (_JSONB_LARGE_OBJECT, _JSONB_LARGE_ARRAY)
        is_obj = type_byte in (_JSONB_SMALL_OBJECT, _JSONB_LARGE_OBJECT)
        w = 4 if large else 2
        base = pos
        count = int.from_bytes(buf[pos : pos + w], "little")
        pos += 2 * w  # count + total size
        keys = []
        if is_obj:
            for i in range(count):
                off = int.from_bytes(buf[pos : pos + w], "little")
                klen = int.from_bytes(buf[pos + w : pos + w + 2], "little")
                keys.append((off, klen))
                pos += w + 2
        vals = []
        for i in range(count):
            vt = buf[pos]
            slot = pos + 1
            if vt == _JSONB_LITERAL:
                lit = buf[slot]
                vals.append({0: None, 1: True, 2: False}[lit])
            elif vt == _JSONB_INT16:
                vals.append(struct.unpack_from("<h", buf, slot)[0])
            elif vt == _JSONB_UINT16:
                vals.append(struct.unpack_from("<H", buf, slot)[0])
            elif large and vt == _JSONB_INT32:
                vals.append(struct.unpack_from("<i", buf, slot)[0])
            elif large and vt == _JSONB_UINT32:
                vals.append(struct.unpack_from("<I", buf, slot)[0])
            else:
                off = int.from_bytes(buf[slot : slot + w], "little")
                vals.append(_jsonb_value(vt, buf, base + off))
            pos += 1 + w
        if is_obj:
            out = {}
            for (koff, klen), v in zip(keys, vals):
                k = buf[base + koff : base + koff + klen].decode("utf-8")
                out[k] = v
            return out
        return vals
    if type_byte == _JSONB_LITERAL:
        return {0: None, 1: True, 2: False}[buf[pos]]
    if type_byte == _JSONB_INT16:
        return int.from_bytes(buf[pos : pos + 2], "little", signed=True)
    if type_byte == _JSONB_UINT16:
        return int.from_bytes(buf[pos : pos + 2], "little")
    if type_byte == _JSONB_INT32:
        return int.from_bytes(buf[pos : pos + 4], "little", signed=True)
    if type_byte == _JSONB_UINT32:
        return int.from_bytes(buf[pos : pos + 4], "little")
    if type_byte == _JSONB_INT64:
        return int.from_bytes(buf[pos : pos + 8], "little", signed=True)
    if type_byte == _JSONB_UINT64:
        return int.from_bytes(buf[pos : pos + 8], "little")
    if type_byte == _JSONB_DOUBLE:
        import struct

        return struct.unpack_from("<d", buf, pos)[0]
    if type_byte == _JSONB_STRING:
        n, pos = _jsonb_varint(buf, pos)
        return buf[pos : pos + n].decode("utf-8")
    raise ValueError(f"unsupported JSONB type byte 0x{type_byte:02x}")


def decode_jsonb(bufs) -> list[str | None]:
    """JSONB wire values → JSON text (sorted keys for determinism)."""
    import json

    out = []
    for b in bufs:
        if b is None or len(b) == 0:
            out.append(None)
            continue
        val = _jsonb_value(b[0], b, 1)
        out.append(json.dumps(val, sort_keys=True, separators=(",", ":")))
    return out


def encode_jsonb(values) -> list[bytes]:
    """Python values → JSONB wire bytes (small-variant containers; the
    test/vector generator side — MySQL is the producer in production)."""
    def enc(v) -> tuple[int, bytes]:
        import struct

        if v is None:
            return _JSONB_LITERAL, b"\x00"
        if v is True:
            return _JSONB_LITERAL, b"\x01"
        if v is False:
            return _JSONB_LITERAL, b"\x02"
        if isinstance(v, int):
            if -(2**15) <= v < 2**15:
                return _JSONB_INT16, struct.pack("<h", v)
            if -(2**31) <= v < 2**31:
                return _JSONB_INT32, struct.pack("<i", v)
            return _JSONB_INT64, struct.pack("<q", v)
        if isinstance(v, float):
            return _JSONB_DOUBLE, struct.pack("<d", v)
        if isinstance(v, str):
            raw = v.encode("utf-8")
            n, ln = len(raw), b""
            while True:
                b7 = n & 0x7F
                n >>= 7
                ln += bytes([b7 | (0x80 if n else 0)])
                if not n:
                    break
            return _JSONB_STRING, ln + raw
        if isinstance(v, (list, dict)):
            is_obj = isinstance(v, dict)
            items = sorted(v.items()) if is_obj else [(None, x) for x in v]
            count = len(items)
            w = 2
            header = 2 * w + count * ((w + 2) if is_obj else 0) + count * (1 + w)
            keys_raw = [k.encode("utf-8") for k, _ in items] if is_obj else []
            key_area = sum(len(k) for k in keys_raw)
            entries = []
            tail = b""
            tail_base = header + key_area
            for _, x in items:
                t, payload = enc(x)
                # inline what fits the 2-byte slot; else offset into tail
                if t == _JSONB_LITERAL or t in (_JSONB_INT16, _JSONB_UINT16):
                    entries.append((t, payload.ljust(w, b"\x00"), None))
                else:
                    entries.append((t, None, tail_base + len(tail)))
                    tail += payload
            total = tail_base + len(tail)
            buf = bytearray()
            buf += count.to_bytes(w, "little") + total.to_bytes(w, "little")
            if is_obj:
                koff = header
                for k in keys_raw:
                    buf += koff.to_bytes(w, "little") + len(k).to_bytes(2, "little")
                    koff += len(k)
            for t, inline, off in entries:
                buf += bytes([t])
                buf += inline if inline is not None else off.to_bytes(w, "little")
            for k in keys_raw:
                buf += k
            buf += tail
            typ = _JSONB_SMALL_OBJECT if is_obj else _JSONB_SMALL_ARRAY
            return typ, bytes(buf)
        raise TypeError(f"cannot encode {type(v)} as JSONB")

    out = []
    for v in values:
        t, payload = enc(v)
        out.append(bytes([t]) + payload)
    return out


# --------------------------------------------------------------------- #
# remaining scalar wire types: DATE, integers, VARCHAR
# --------------------------------------------------------------------- #
def encode_date(dates) -> list[bytes]:
    """DATE: 3 bytes LE of (year << 9 | month << 5 | day)."""
    import pandas as pd

    out = []
    for d in dates:
        d = pd.Timestamp(d)
        out.append(((d.year << 9) | (d.month << 5) | d.day).to_bytes(3, "little"))
    return out


def decode_date(bufs) -> np.ndarray:
    """Vectorized DATE decode → datetime64[D]."""
    n = len(bufs)
    if n == 0:
        return np.array([], dtype="datetime64[D]")
    m = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(n, 3)
    packed = (
        m[:, 0].astype(np.int64)
        + (m[:, 1].astype(np.int64) << 8)
        + (m[:, 2].astype(np.int64) << 16)
    )
    year = packed >> 9
    month = (packed >> 5) & 0x0F
    day = packed & 0x1F
    # zero dates (0000-00-00, month/day 0) → NaT (reference: "0000-00-00")
    zero = (month == 0) | (day == 0)
    month = np.where(zero, 1, month)
    day = np.where(zero, 1, day)
    months = (year - 1970) * 12 + (month - 1)
    out = (np.datetime64("1970-01", "M") + months).astype("datetime64[D]") + (
        day - 1
    )
    out[zero] = np.datetime64("NaT")
    return out


def decode_int_le(bufs, width: int, signed: bool = True) -> np.ndarray:
    """Vectorized little-endian integer decode (TINY/SHORT/INT24/LONG/
    LONGLONG row-image storage; unsigned promotion = signed=False, the
    reference's Carrier unsigned-widening rule)."""
    n = len(bufs)
    if n == 0:
        return np.array([], dtype=np.int64)
    m = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(n, width)
    v = np.zeros(n, dtype=np.uint64)
    for k in range(width - 1, -1, -1):
        v = (v << np.uint64(8)) | m[:, k].astype(np.uint64)
    if not signed:
        if width == 8:
            # full unsigned-BIGINT range: exact python ints (an int64 view
            # would go negative past 2^63 — the Carrier promotion widens
            # to DECIMAL(20,0) instead, TableRowsParser.java:155-186)
            return np.array([int(x) for x in v.tolist()], dtype=object)
        return v.astype(np.int64)
    out = v.astype(np.int64)
    if width < 8:
        sign_bit = np.int64(1) << np.int64(8 * width - 1)
        out = np.where(out & sign_bit, out - (np.int64(1) << np.int64(8 * width)), out)
    return out


# --------------------------------------------------------------------- #
# full row-image decode — the RowsLogBuffer.fetchValue dispatch
# --------------------------------------------------------------------- #
# A ROWS_EVENT row image is: a null bitmap (one bit per column,
# little-endian bit order, bit set = NULL) followed by the packed values
# of the NON-NULL columns in table order (RowsLogBuffer.fetchOneRow →
# fetchValue dispatch).  Column types come from the preceding
# TABLE_MAP_EVENT; here they are the ColumnSpec list.

from dataclasses import dataclass as _dataclass


@_dataclass(frozen=True)
class ColumnSpec:
    """One column of the table map: name + wire type + type metadata.

    ``varchar`` meta is the column's **max BYTE length from the table
    map** (pack_length), NOT the character count: a utf8mb4 VARCHAR(100)
    has meta 400, and the 1-vs-2-byte length-prefix threshold is byte
    length — passing character length would mis-walk every subsequent
    column in the row image.

    ``char`` (MYSQL_TYPE_STRING) meta is the **raw 2-byte table-map meta
    int**: for byte lengths > 255 the real type and length hide inside
    the meta bytes (MySQL bug #37426 encoding; the reference's fetchValue
    special case, RowsLogBuffer.java:252-268) — see :func:`char_meta`.
    """

    name: str
    kind: str          # int8|uint8|int16|uint16|int24|int32|int64|uint64|
                       # float|double|newdecimal|date|datetime2|timestamp2|
                       # time2|datetime_v0|timestamp_v0|time_v0|varchar|
                       # char|blob|geometry|jsonb|year|enum|set|bit
    meta: tuple = ()   # newdecimal: (P, S); *2 temporal: (fsp,);
                       # varchar: (max_BYTES,); char: (raw_meta,);
                       # blob: (len_bytes,); geometry: (len_bytes,)
                       # — GEOMETRY is fetched exactly like a blob
                       # (length-prefixed bytes; the payload is
                       # SRID+WKB, opaque to the decoder) per
                       # RowsLogBuffer.java:986-1019; default len_bytes
                       # 4, MySQL's GEOMETRY pack length
    charset: int = 33  # MySQL COLLATION id for varchar/char text decode
                       # (CharsetConversion.java analog, functions/charset.py);
                       # default 33 = utf8_general_ci; 63 = binary charset
                       # → the column is bytes, not text


def char_meta(meta: int) -> tuple[int, int]:
    """(real_type_byte, max_byte_len) from a MYSQL_TYPE_STRING table-map
    meta.  For meta >= 256 the upper meta byte carries the real type and
    two extra length bits (MySQL bug #37426 layout): when
    (byte0 & 0x30) != 0x30 the length is byte1 | (((byte0 & 0x30) ^ 0x30)
    << 4) — up to 1023 bytes — and the type is byte0 | 0x30; otherwise
    byte0 is the type (ENUM/SET/STRING) and byte1 the length.
    Reference: RowsLogBuffer.java:252-268."""
    if meta < 256:
        return 0xFE, meta  # MYSQL_TYPE_STRING
    byte0, byte1 = meta >> 8, meta & 0xFF
    if (byte0 & 0x30) != 0x30:
        return byte0 | 0x30, byte1 | (((byte0 & 0x30) ^ 0x30) << 4)
    return byte0, byte1


def encode_char_table_meta(max_len: int) -> int:
    """Raw 2-byte table-map meta for a CHAR column of max_len bytes
    (≤1023) — what MySQL writes: byte0 = 0xFE ^ ((len & 0x300) >> 4),
    byte1 = len & 0xFF.  Test-vector side of :func:`char_meta`."""
    if not 0 <= max_len <= 1023:
        raise ValueError(f"CHAR byte length {max_len} out of range")
    return ((0xFE ^ ((max_len & 0x300) >> 4)) << 8) | (max_len & 0xFF)


_FIXED_WIDTH = {
    "int8": 1, "uint8": 1, "int16": 2, "uint16": 2, "int24": 3,
    "int32": 4, "uint32": 4, "int64": 8, "uint64": 8,
    "float": 4, "double": 8,
}


def _col_width(spec: ColumnSpec, buf: bytes, pos: int) -> tuple[int, int]:
    """(value_start, value_end) of one packed value at pos."""
    k = spec.kind
    if k in _FIXED_WIDTH:
        return pos, pos + _FIXED_WIDTH[k]
    if k == "year":
        return pos, pos + 1
    if k == "enum":
        return pos, pos + (spec.meta[0] if spec.meta else 1)
    if k == "set":
        return pos, pos + (spec.meta[0] if spec.meta else 1)
    if k == "bit":
        bits = spec.meta[0] if spec.meta else 1
        return pos, pos + (bits + 7) // 8
    if k == "newdecimal":
        p, s = spec.meta
        return pos, pos + newdecimal_bin_size(p, s)
    if k == "date":
        return pos, pos + 3
    if k == "datetime2":
        return pos, pos + 5 + _frac_bytes(spec.meta[0])
    if k == "timestamp2":
        return pos, pos + 4 + _frac_bytes(spec.meta[0])
    if k == "time2":
        return pos, pos + 3 + _frac_bytes(spec.meta[0])
    if k == "datetime_v0":
        return pos, pos + 8
    if k == "timestamp_v0":
        return pos, pos + 4
    if k == "time_v0":
        return pos, pos + 3
    if k == "varchar":
        # meta[0] is max BYTES from the table map (see ColumnSpec doc)
        lb = 2 if spec.meta and spec.meta[0] > 255 else 1
        ln = int.from_bytes(buf[pos : pos + lb], "little")
        return pos + lb, pos + lb + ln
    if k == "char":
        _, max_len = char_meta(spec.meta[0] if spec.meta else 0)
        lb = 2 if max_len > 255 else 1
        ln = int.from_bytes(buf[pos : pos + lb], "little")
        return pos + lb, pos + lb + ln
    if k in ("blob", "jsonb", "geometry"):
        lb = spec.meta[0] if spec.meta else (4 if k == "geometry" else 2)
        ln = int.from_bytes(buf[pos : pos + lb], "little")
        return pos + lb, pos + lb + ln
    raise ValueError(f"unsupported wire kind {spec.kind!r}")


def split_row_images(images, specs: list[ColumnSpec]) -> list[list[bytes | None]]:
    """Walk each row image once (null bitmap + packed values) and slice out
    every column's raw bytes; None for NULL cells.  The per-column decode
    that follows is vectorized across rows."""
    nbm = (len(specs) + 7) // 8
    out: list[list[bytes | None]] = [[] for _ in specs]
    for img in images:
        if img is None:
            for c in out:
                c.append(None)
            continue
        bitmap = img[:nbm]
        pos = nbm
        for i, spec in enumerate(specs):
            if bitmap[i // 8] >> (i % 8) & 1:
                out[i].append(None)
                continue
            lo, hi = _col_width(spec, img, pos)
            out[i].append(img[lo:hi])
            pos = hi
    return out


def decode_row_images(df, image_col: str, specs: list[ColumnSpec]):
    """ROWS_EVENT row images → typed columns, one fused ``mapInArrow``
    pass (the Spark rebuild of RowsLogBuffer.fetchOneRow/fetchValue,
    RowsLogBuffer.java:248-1031 + TableRowsParser dispatch).

    The image column is replaced by one typed column per ColumnSpec;
    every other input column passes through.  NULL images yield all-NULL
    cells.  Per-column decode is vectorized over the non-null cells; only
    the variable-width walk is per-row (as in the reference)."""
    import struct

    import pyarrow as pa
    from pyspark.sql import types as T

    def spark_type(spec: ColumnSpec):
        k = spec.kind
        if k in ("int8", "uint8"):
            return T.ShortType() if k == "uint8" else T.ByteType()
        if k in ("int16", "uint16", "int24", "int32"):
            return T.IntegerType()
        if k in ("uint32", "int64"):
            return T.LongType()
        if k == "uint64":
            return T.DecimalType(20, 0)  # full unsigned range is exact
        if k == "float":
            return T.FloatType()
        if k == "double":
            return T.DoubleType()
        if k == "newdecimal":
            return T.DecimalType(*spec.meta)
        if k == "date":
            return T.DateType()
        if k in ("datetime2", "timestamp2", "datetime_v0", "timestamp_v0"):
            return T.TimestampNTZType()
        if k in ("time2", "time_v0"):
            return T.DayTimeIntervalType()
        if k in ("varchar", "char"):
            from binlake_spark.functions.charset import codec_for_collation

            # binary-charset CHAR/VARCHAR is VARBINARY (codec None)
            return (
                T.BinaryType()
                if codec_for_collation(spec.charset) is None
                else T.StringType()
            )
        if k == "jsonb":
            return T.StringType()
        if k in ("blob", "geometry"):
            return T.BinaryType()
        if k == "year":
            return T.ShortType()
        if k == "enum":
            return T.IntegerType()
        if k in ("set", "bit"):
            return T.LongType()
        raise ValueError(k)

    fields = [f for f in df.schema.fields if f.name != image_col]
    out_schema = T.StructType(
        fields + [T.StructField(s.name, spark_type(s), True) for s in specs]
    )

    def decode_cells(spec: ColumnSpec, cells: list):
        """Vectorized decode of the non-null cells, reinserting nulls."""
        idx = [i for i, c in enumerate(cells) if c is not None]
        raw = [cells[i] for i in idx]
        k = spec.kind
        if k == "uint64":
            from decimal import Decimal as _D

            vals = [_D(int.from_bytes(c, "little")) for c in raw]
        elif k in _FIXED_WIDTH and k not in ("float", "double"):
            w = _FIXED_WIDTH[k]
            vals = decode_int_le(raw, w, signed=not k.startswith("u"))
            vals = [int(v) for v in vals]
        elif k == "float":
            vals = [struct.unpack("<f", c)[0] for c in raw]
        elif k == "double":
            vals = [struct.unpack("<d", c)[0] for c in raw]
        elif k == "newdecimal":
            vals = decode_newdecimal(raw, *spec.meta)
        elif k == "date":
            vals = list(decode_date(raw).astype("datetime64[D]"))
        elif k == "datetime2":
            vals = list(decode_datetime2(raw, *spec.meta))
        elif k == "timestamp2":
            vals = list(decode_timestamp2(raw, *spec.meta))
        elif k == "time2":
            vals = list(decode_time2(raw, *spec.meta))
        elif k == "datetime_v0":
            vals = list(decode_datetime_v0(raw))
        elif k == "timestamp_v0":
            vals = list(decode_timestamp_v0(raw))
        elif k == "time_v0":
            vals = list(decode_time_v0(raw))
        elif k in ("varchar", "char"):
            from binlake_spark.functions.charset import codec_for_collation

            codec = codec_for_collation(spec.charset)
            vals = raw if codec is None else [c.decode(codec) for c in raw]
        elif k == "jsonb":
            vals = decode_jsonb(raw)
        elif k in ("blob", "geometry"):
            vals = raw
        elif k == "year":
            # 1 byte, offset 1900; wire 0 means year 0000
            vals = [0 if c[0] == 0 else 1900 + c[0] for c in raw]
        elif k == "enum":
            w = spec.meta[0] if spec.meta else 1
            vals = [int(v) for v in decode_int_le(raw, w, signed=False)]
        elif k == "set":
            w = spec.meta[0] if spec.meta else 1
            vals = [int(v) for v in decode_int_le(raw, w, signed=False)]
        elif k == "bit":
            # BIT is stored BIG-endian in the row image (unlike integers)
            vals = [int.from_bytes(c, "big") for c in raw]
        else:
            raise ValueError(k)
        full = [None] * len(cells)
        for i, v in zip(idx, vals):
            full[i] = v
        return full

    def arrow_type(spec: ColumnSpec):
        k = spec.kind
        return {
            "int8": pa.int8(), "uint8": pa.int16(), "int16": pa.int32(),
            "uint16": pa.int32(), "int24": pa.int32(), "int32": pa.int32(),
            "uint32": pa.int64(), "int64": pa.int64(),
            "uint64": pa.decimal128(20, 0),
            "float": pa.float32(), "double": pa.float64(),
            "date": pa.date32(), "jsonb": pa.string(),
            "blob": pa.binary(), "geometry": pa.binary(),
            "year": pa.int16(), "enum": pa.int32(),
            "set": pa.int64(), "bit": pa.int64(),
        }.get(k) or (
            pa.decimal128(*spec.meta) if k == "newdecimal"
            else pa.duration("us") if k in ("time2", "time_v0")
            else _string_arrow_type(spec) if k in ("varchar", "char")
            else pa.timestamp("us")
        )

    def _string_arrow_type(spec: ColumnSpec):
        from binlake_spark.functions.charset import codec_for_collation

        return (
            pa.binary()
            if codec_for_collation(spec.charset) is None
            else pa.string()
        )

    def fn(batches):
        for b in batches:
            passthrough = [
                (nm, col)
                for nm, col in zip(b.schema.names, b.columns)
                if nm != image_col
            ]
            images = [v.as_py() for v in b.column(image_col)]
            per_col = split_row_images(images, specs)
            cols = [c for _, c in passthrough]
            names = [nm for nm, _ in passthrough]
            for spec, cells in zip(specs, per_col):
                vals = decode_cells(spec, cells)
                if spec.kind == "date":
                    vals = [None if v is None else v.astype("datetime64[D]").item() for v in vals]
                cols.append(pa.array(vals, type=arrow_type(spec)))
                names.append(spec.name)
            yield pa.RecordBatch.from_arrays(
                cols, schema=pa.schema([(n, c.type) for n, c in zip(names, cols)])
            )

    return df.mapInArrow(fn, out_schema)


def encode_row_images(rows: list[dict], specs: list[ColumnSpec]) -> list[bytes]:
    """Pack python row dicts into ROWS_EVENT row images (test side)."""
    import struct

    nbm = (len(specs) + 7) // 8
    out = []
    for row in rows:
        bitmap = bytearray(nbm)
        body = bytearray()
        for i, spec in enumerate(specs):
            v = row.get(spec.name)
            if v is None:
                bitmap[i // 8] |= 1 << (i % 8)
                continue
            k = spec.kind
            if k in _FIXED_WIDTH and k not in ("float", "double"):
                w = _FIXED_WIDTH[k]
                body += (int(v) & ((1 << (8 * w)) - 1)).to_bytes(w, "little")
            elif k == "float":
                body += struct.pack("<f", v)
            elif k == "double":
                body += struct.pack("<d", v)
            elif k == "newdecimal":
                body += encode_newdecimal([v], *spec.meta)[0]
            elif k == "date":
                body += encode_date([v])[0]
            elif k == "datetime2":
                body += encode_datetime2([v], *spec.meta)[0]
            elif k == "timestamp2":
                body += encode_timestamp2([v], *spec.meta)[0]
            elif k == "time2":
                body += encode_time2([v], *spec.meta)[0]
            elif k == "datetime_v0":
                body += encode_datetime_v0([v])[0]
            elif k == "timestamp_v0":
                body += encode_timestamp_v0([v])[0]
            elif k == "time_v0":
                body += encode_time_v0([v])[0]
            elif k in ("varchar", "char"):
                from binlake_spark.functions.charset import (
                    codec_for_collation,
                )

                codec = codec_for_collation(spec.charset)
                raw = v if codec is None else v.encode(codec)
                if k == "varchar":
                    lb = 2 if spec.meta and spec.meta[0] > 255 else 1
                else:
                    _, max_len = char_meta(spec.meta[0] if spec.meta else 0)
                    lb = 2 if max_len > 255 else 1
                body += len(raw).to_bytes(lb, "little") + raw
            elif k in ("blob", "jsonb", "geometry"):
                raw = v if isinstance(v, bytes) else encode_jsonb([v])[0]
                lb = spec.meta[0] if spec.meta else (4 if k == "geometry" else 2)
                body += len(raw).to_bytes(lb, "little") + raw
            elif k == "year":
                body += bytes([0 if v == 0 else int(v) - 1900])
            elif k in ("enum", "set"):
                w = spec.meta[0] if spec.meta else 1
                body += int(v).to_bytes(w, "little")
            elif k == "bit":
                bits = spec.meta[0] if spec.meta else 1
                body += int(v).to_bytes((bits + 7) // 8, "big")
            else:
                raise ValueError(k)
        out.append(bytes(bitmap) + bytes(body))
    return out
