"""MySQL wire-format decode (functions/binlog_decode.py): fixed known
vectors from the published format anchor the byte layout; seeded
round-trips cover the range; a Spark mapInArrow pass proves the fused
integration shape (RowsLogBuffer.fetchValue rebuild,
RowsLogBuffer.java:248-1031)."""

from decimal import Decimal

import numpy as np
import pandas as pd
import pytest

from binlake_spark.functions.binlog_decode import (
    decode_datetime2,
    decode_newdecimal,
    decode_time2,
    decode_timestamp2,
    decode_wire_columns,
    encode_datetime2,
    encode_newdecimal,
    encode_time2,
    encode_timestamp2,
    newdecimal_bin_size,
)


def test_newdecimal_known_vector():
    """The canonical published example: DECIMAL(14,4) 1234567890.1234
    packs to 81 0D FB 38 D2 04 D2 (strings/decimal.c group layout)."""
    [b] = encode_newdecimal([Decimal("1234567890.1234")], 14, 4)
    assert b == bytes.fromhex("810DFB38D204D2")
    [d] = decode_newdecimal([b], 14, 4)
    assert d == Decimal("1234567890.1234")
    # negative: whole buffer XOR 0xFF, then MSB flip
    [bn] = encode_newdecimal([Decimal("-1234567890.1234")], 14, 4)
    assert bn == bytes.fromhex("7EF204C72DFB2D")
    [dn] = decode_newdecimal([bn], 14, 4)
    assert dn == Decimal("-1234567890.1234")


def test_newdecimal_bin_sizes():
    # published dig2bytes sizing
    assert newdecimal_bin_size(14, 4) == 7
    assert newdecimal_bin_size(10, 0) == 5
    assert newdecimal_bin_size(18, 9) == 8
    assert newdecimal_bin_size(38, 10) == 18


@pytest.mark.parametrize("p,s", [(10, 0), (14, 4), (18, 9), (27, 13), (38, 10)])
def test_newdecimal_roundtrip(p, s):
    rng = np.random.default_rng(7)
    vals = []
    for _ in range(200):
        digits = rng.integers(0, 10, size=p)
        txt = "".join(map(str, digits[: p - s])) or "0"
        frac = "".join(map(str, digits[p - s :]))
        v = Decimal(f"{txt}.{frac}" if s else txt)
        if rng.random() < 0.5:
            v = -v
        vals.append(v)
    vals += [Decimal(0).scaleb(-s).quantize(Decimal(1).scaleb(-s))] if s else [Decimal(0)]
    enc = encode_newdecimal(vals, p, s)
    assert all(len(b) == newdecimal_bin_size(p, s) for b in enc)
    dec = decode_newdecimal(enc, p, s)
    assert dec == vals


def test_datetime2_known_vector():
    """Independent arithmetic for 2012-06-21 15:45:17.654321 (fsp=6)."""
    packed = 0x8000000000 + (
        ((2012 * 13 + 6) << 22) | (21 << 17) | (15 << 12) | (45 << 6) | 17
    )
    want = packed.to_bytes(5, "big") + (654321).to_bytes(3, "big")
    [b] = encode_datetime2([pd.Timestamp("2012-06-21 15:45:17.654321")], fsp=6)
    assert b == want
    [d] = decode_datetime2([b], fsp=6)
    assert pd.Timestamp(d) == pd.Timestamp("2012-06-21 15:45:17.654321")


@pytest.mark.parametrize("fsp", [0, 2, 4, 6])
def test_temporal_roundtrips(fsp):
    rng = np.random.default_rng(11)
    step = 10 ** (6 - fsp)
    ts = [
        pd.Timestamp("1971-01-01")
        + pd.Timedelta(int(rng.integers(0, 2_000_000_000)), "s")
        + pd.Timedelta((int(rng.integers(0, 1_000_000)) // step) * step, "us")
        for _ in range(100)
    ]
    got = decode_datetime2(encode_datetime2(ts, fsp), fsp)
    assert [pd.Timestamp(g) for g in got] == ts
    got = decode_timestamp2(encode_timestamp2(ts, fsp), fsp)
    assert [pd.Timestamp(g) for g in got] == ts
    td = [
        pd.Timedelta(int(rng.integers(0, 800 * 3600)), "s")
        + pd.Timedelta((int(rng.integers(0, 1_000_000)) // step) * step, "us")
        for _ in range(100)
    ]
    got = decode_time2(encode_time2(td, fsp), fsp)
    assert [pd.Timedelta(g) for g in got] == td


def test_decode_wire_columns_spark(spark):
    """Fused Arrow decode pass: binary wire columns come out typed
    (decimal128 / timestamp), values exact, one mapInArrow stage."""
    rng = np.random.default_rng(3)
    n = 500
    decs = [
        (Decimal(int(rng.integers(-10**12, 10**12))).scaleb(-4))
        for _ in range(n)
    ]
    ts = [
        pd.Timestamp("2020-01-01")
        + pd.Timedelta(int(rng.integers(0, 10**9)), "s")
        + pd.Timedelta(int(rng.integers(0, 10**6)), "us")
        for _ in range(n)
    ]
    pdf = pd.DataFrame(
        {
            "row_id": np.arange(n, dtype=np.int64),
            "price_wire": encode_newdecimal(decs, 14, 4),
            "at_wire": encode_datetime2(ts, 6),
        }
    )
    df = spark.createDataFrame(pdf)
    out = decode_wire_columns(
        df, {"price_wire": ("newdecimal", 14, 4), "at_wire": ("datetime2", 6)}
    )
    assert dict(out.dtypes)["price_wire"] == "decimal(14,4)"
    rows = {r.row_id: r for r in out.collect()}
    for i in range(n):
        assert rows[i].price_wire == decs[i], i
        assert pd.Timestamp(rows[i].at_wire) == ts[i], i


def test_jsonb_known_vector():
    """Hand-packed small object {"k": 17}: count/size header, key entry
    (offset 11, len 1), inlined int16 value entry, then the key bytes."""
    from binlake_spark.functions.binlog_decode import decode_jsonb, encode_jsonb

    raw = bytes.fromhex("0001000c000b0001000511006b")
    assert decode_jsonb([raw]) == ['{"k":17}']
    assert encode_jsonb([{"k": 17}]) == [raw]


def test_jsonb_roundtrip():
    from binlake_spark.functions.binlog_decode import decode_jsonb, encode_jsonb

    import json

    vals = [
        None,
        True,
        False,
        0,
        -1,
        32767,
        -32768,
        2**20,
        -(2**40),
        3.5,
        "",
        "héllo",
        "x" * 300,  # multi-byte varint length
        [],
        {},
        [1, "two", None, [3, {"a": False}]],
        {"k": 17, "nested": {"deep": [1.25, "s"]}, "arr": [True, 2]},
    ]
    got = decode_jsonb(encode_jsonb(vals))
    want = [json.dumps(v, sort_keys=True, separators=(",", ":")) for v in vals]
    assert got == want
    assert decode_jsonb([None, b""]) == [None, None]


def test_row_image_roundtrip_all_types():
    """Full ROWS_EVENT row-image walk: null bitmap + packed values across
    every supported wire kind, including NULLs and both varchar length
    widths."""
    from decimal import Decimal as D

    from binlake_spark.functions.binlog_decode import (
        ColumnSpec,
        encode_row_images,
        split_row_images,
    )

    specs = [
        ColumnSpec("id", "int64"),
        ColumnSpec("tiny", "int8"),
        ColumnSpec("utiny", "uint8"),
        ColumnSpec("small", "int16"),
        ColumnSpec("med", "int24"),
        ColumnSpec("cnt", "uint32"),
        ColumnSpec("big_u", "uint64"),
        ColumnSpec("ratio", "double"),
        ColumnSpec("price", "newdecimal", (14, 4)),
        ColumnSpec("d", "date"),
        ColumnSpec("at", "datetime2", (6,)),
        ColumnSpec("name", "varchar", (100,)),
        ColumnSpec("long_name", "varchar", (1000,)),
        ColumnSpec("props", "jsonb", (2,)),
        ColumnSpec("raw", "blob", (2,)),
        # GEOMETRY: 4-byte default length prefix, opaque SRID+WKB bytes
        # (RowsLogBuffer.java:986-1019 fetches it exactly like a blob)
        ColumnSpec("geom", "geometry"),
    ]
    wkb = (4326).to_bytes(4, "little") + b"\x01\x01\x00\x00\x00" + b"\x3f" * 16
    rows = [
        {
            "id": -(2**40), "tiny": -128, "utiny": 255, "small": -32768,
            "med": -(2**23), "cnt": 2**32 - 1, "big_u": 2**64 - 1,
            "ratio": 2.5, "price": D("-1234567890.1234"),
            "d": "2024-02-29", "at": "2012-06-21 15:45:17.654321",
            "name": "héllo", "long_name": "x" * 300,
            "props": {"k": 17}, "raw": b"\x00\x01\xff", "geom": wkb,
        },
        {  # every nullable cell NULL
            "id": 7, "tiny": None, "utiny": None, "small": None, "med": None,
            "cnt": None, "big_u": None, "ratio": None, "price": None,
            "d": None, "at": None, "name": None, "long_name": None,
            "props": None, "raw": None, "geom": None,
        },
    ]
    imgs = encode_row_images(rows, specs)
    cols = split_row_images(imgs, specs)
    # split gives per-column raw bytes; NULL cells are None
    assert cols[0][0] is not None and cols[1][1] is None
    assert len(cols) == len(specs) and all(len(c) == 2 for c in cols)
    # geometry bytes pass through the walk untouched
    assert cols[-1][0] == wkb and cols[-1][1] is None


def test_decode_row_images_spark(spark):
    """The RowsLogBuffer.fetchOneRow/fetchValue rebuild end-to-end in
    Spark: packed row images come out as typed columns, exact values,
    NULL bitmap honored."""
    from decimal import Decimal as D

    import pandas as pd

    from binlake_spark.functions.binlog_decode import (
        ColumnSpec,
        decode_row_images,
        encode_row_images,
    )

    specs = [
        ColumnSpec("uid", "int64"),
        ColumnSpec("score", "uint32"),
        ColumnSpec("big_u", "uint64"),
        ColumnSpec("price", "newdecimal", (14, 4)),
        ColumnSpec("d", "date"),
        ColumnSpec("at", "datetime2", (6,)),
        ColumnSpec("name", "varchar", (100,)),
        ColumnSpec("props", "jsonb", (2,)),
    ]
    rows = [
        {"uid": i, "score": 3_000_000_000 + i, "big_u": 2**63 + i,
         "price": D(str(i * 7)) / D("10000") * D("10000") + D("0.1234"),
         "d": "2020-01-01", "at": f"2021-03-04 05:06:07.{i % 10}23456",
         "name": f"doc {i}", "props": {"k": i, "t": [str(i)]}}
        for i in range(200)
    ] + [{"uid": 999, "score": None, "big_u": None, "price": None, "d": None,
          "at": None, "name": None, "props": None}]
    imgs = encode_row_images(rows, specs)
    pdf = pd.DataFrame({"seq": range(len(imgs)), "row_image": imgs})
    df = spark.createDataFrame(pdf)
    out = decode_row_images(df, "row_image", specs)
    assert "row_image" not in out.columns
    got = {r.uid: r for r in out.collect()}
    assert got[5].score == 3_000_000_005
    assert got[5].big_u == D(2**63 + 5)
    assert got[5].price == D("35.1234")
    assert str(got[5].d) == "2020-01-01"
    assert pd.Timestamp(got[5].at) == pd.Timestamp("2021-03-04 05:06:07.523456")
    assert got[5].name == "doc 5"
    assert got[5].props == '{"k":5,"t":["5"]}'
    nullrow = got[999]
    assert all(
        getattr(nullrow, c) is None
        for c in ("score", "big_u", "price", "d", "at", "name", "props")
    )


# ---------------------- property-based round-trips ---------------------- #
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=-(10**27 - 1), max_value=10**27 - 1),
    )
    def test_newdecimal_property_roundtrip(unscaled):
        from binlake_spark.functions.binlog_decode import (
            decode_newdecimal,
            encode_newdecimal,
        )

        v = Decimal(unscaled).scaleb(-13)
        [d] = decode_newdecimal(encode_newdecimal([v], 27, 13), 27, 13)
        assert d == v

    _JSON = st.recursive(
        st.none()
        | st.booleans()
        | st.integers(min_value=-(2**62), max_value=2**62)
        | st.floats(allow_nan=False, allow_infinity=False, width=64)
        | st.text(max_size=40),
        lambda children: st.lists(children, max_size=4)
        | st.dictionaries(st.text(max_size=10), children, max_size=4),
        max_leaves=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(_JSON)
    def test_jsonb_property_roundtrip(value):
        import json

        from binlake_spark.functions.binlog_decode import decode_jsonb, encode_jsonb

        [got] = decode_jsonb(encode_jsonb([value]))
        assert got == json.dumps(value, sort_keys=True, separators=(",", ":"))

    @settings(max_examples=200, deadline=None)
    @given(
        # secs capped by the ns-backed Timedelta range (~9.2e9 s)
        st.integers(min_value=0, max_value=9_000_000_000),
        st.integers(min_value=0, max_value=999999),
    )
    def test_datetime2_property_roundtrip(secs, micros):
        from binlake_spark.functions.binlog_decode import (
            decode_datetime2,
            encode_datetime2,
        )

        t = pd.Timestamp("1700-01-01") + pd.Timedelta(int(secs), "s") + pd.Timedelta(
            int(micros), "us"
        )
        [d] = decode_datetime2(encode_datetime2([t], 6), 6)
        assert pd.Timestamp(d) == t


def test_row_image_year_enum_set_bit(spark):
    """The remaining fetchValue kinds: YEAR (1 byte, 1900 offset), ENUM
    (1/2-byte ordinal), SET (bitmask), BIT (big-endian, 1-64 bits)."""
    import pandas as pd

    from binlake_spark.functions.binlog_decode import (
        ColumnSpec,
        decode_row_images,
        encode_row_images,
    )

    specs = [
        ColumnSpec("uid", "int32"),
        ColumnSpec("y", "year"),
        ColumnSpec("e1", "enum", (1,)),
        ColumnSpec("e2", "enum", (2,)),
        ColumnSpec("s", "set", (8,)),
        ColumnSpec("b", "bit", (48,)),
    ]
    rows = [
        {"uid": 0, "y": 2024, "e1": 3, "e2": 300, "s": (1 << 63) - 1, "b": 0},
        {"uid": 1, "y": 0, "e1": 255, "e2": 65535, "s": 0b1010, "b": (1 << 48) - 1},
        {"uid": 2, "y": None, "e1": None, "e2": None, "s": None, "b": None},
    ]
    imgs = encode_row_images(rows, specs)
    pdf = pd.DataFrame({"row_image": imgs})
    out = decode_row_images(spark.createDataFrame(pdf), "row_image", specs)
    got = {r.uid: r for r in out.collect()}
    assert (got[0].y, got[0].e1, got[0].e2, got[0].s, got[0].b) == (
        2024, 3, 300, (1 << 63) - 1, 0
    )
    assert (got[1].y, got[1].e1, got[1].e2, got[1].s, got[1].b) == (
        0, 255, 65535, 0b1010, (1 << 48) - 1
    )
    r2 = got[2]
    assert all(getattr(r2, c) is None for c in ("y", "e1", "e2", "s", "b"))


# ------------------------------------------------------------------ #
# round 3: negative TIME2, pre-5.6 v0 temporals, zero dates, long CHAR,
# NULLs through decode_wire_columns
# ------------------------------------------------------------------ #
def test_time2_negative_known_vector():
    """-00:00:05.13 at fsp=4: my_time.c stores intpart floor-shifted and
    the frac two's-complemented — int3 = 0x800000 - 6, int2 = 2^16 - 1300
    (the reference's intpart++/frac adjustment, RowsLogBuffer TIME2)."""
    from binlake_spark.functions.binlog_decode import decode_time2, encode_time2

    v = -pd.Timedelta(seconds=5, microseconds=130_000)
    [b] = encode_time2([v], fsp=4)
    assert b == (0x800000 - 6).to_bytes(3, "big") + (0x10000 - 1300).to_bytes(2, "big")
    [d] = decode_time2([b], fsp=4)
    assert pd.Timedelta(d) == v
    # whole-second negative (no frac adjustment): -838:59:59 at fsp=0
    vmax = -pd.Timedelta(hours=838, minutes=59, seconds=59)
    [b0] = encode_time2([vmax], fsp=0)
    hms = (838 << 12) | (59 << 6) | 59
    assert b0 == (0x800000 - hms).to_bytes(3, "big")
    [d0] = decode_time2([b0], fsp=0)
    assert pd.Timedelta(d0) == vmax


@pytest.mark.parametrize("fsp", [0, 1, 2, 3, 4, 5, 6])
def test_time2_negative_roundtrip(fsp):
    from binlake_spark.functions.binlog_decode import decode_time2, encode_time2

    rng = np.random.default_rng(17)
    step = 10 ** (6 - fsp)
    td = []
    for _ in range(200):
        mag = pd.Timedelta(int(rng.integers(0, 838 * 3600)), "s") + pd.Timedelta(
            (int(rng.integers(0, 1_000_000)) // step) * step, "us"
        )
        td.append(-mag if rng.random() < 0.5 else mag)
    td += [pd.Timedelta(0), -pd.Timedelta(500_000 // step * step, "us")]
    got = decode_time2(encode_time2(td, fsp), fsp)
    assert [pd.Timedelta(g) for g in got] == td


def test_v0_temporal_known_vectors():
    """Pre-5.6 formats (RowsLogBuffer.java:402-560): TIMESTAMP = LE epoch
    seconds; DATETIME = LE decimal-packed YYYYMMDDHHMMSS; TIME = signed
    LE int24 of HHMMSS."""
    from binlake_spark.functions.binlog_decode import (
        decode_datetime_v0,
        decode_time_v0,
        decode_timestamp_v0,
        encode_datetime_v0,
        encode_time_v0,
        encode_timestamp_v0,
    )

    t = pd.Timestamp("2012-06-21 15:45:17")
    [b] = encode_timestamp_v0([t])
    assert b == int(t.value // 10**9).to_bytes(4, "little")
    assert pd.Timestamp(decode_timestamp_v0([b])[0]) == t

    [b] = encode_datetime_v0([t])
    assert b == (20120621154517).to_bytes(8, "little")
    assert pd.Timestamp(decode_datetime_v0([b])[0]) == t

    v = -pd.Timedelta(hours=12, minutes=34, seconds=56)
    [b] = encode_time_v0([v])
    assert b == ((-123456) & 0xFFFFFF).to_bytes(3, "little")
    assert pd.Timedelta(decode_time_v0([b])[0]) == v


def test_v0_temporal_roundtrips():
    from binlake_spark.functions.binlog_decode import (
        decode_datetime_v0,
        decode_time_v0,
        decode_timestamp_v0,
        encode_datetime_v0,
        encode_time_v0,
        encode_timestamp_v0,
    )

    rng = np.random.default_rng(23)
    ts = [
        pd.Timestamp("1971-01-01") + pd.Timedelta(int(rng.integers(0, 2 * 10**9)), "s")
        for _ in range(200)
    ]
    assert [pd.Timestamp(g) for g in decode_timestamp_v0(encode_timestamp_v0(ts))] == ts
    assert [pd.Timestamp(g) for g in decode_datetime_v0(encode_datetime_v0(ts))] == ts
    td = [
        (-1 if rng.random() < 0.5 else 1)
        * pd.Timedelta(int(rng.integers(0, 838 * 3600)), "s")
        for _ in range(200)
    ]
    assert [pd.Timedelta(g) for g in decode_time_v0(encode_time_v0(td))] == td


def test_zero_dates_decode_to_nat():
    """0000-00-00 (and month/day 0) → NaT, not a shifted bogus date (the
    reference emits the zero literal; NULL is the lake-typed analog)."""
    from binlake_spark.functions.binlog_decode import (
        decode_date,
        decode_datetime2,
        decode_datetime_v0,
    )

    assert np.isnat(decode_date([b"\x00\x00\x00"])[0])
    # 2024-00-15 and 2024-05-00 are also zero-ish per MySQL semantics
    assert np.isnat(decode_date([((2024 << 9) | (0 << 5) | 15).to_bytes(3, "little")])[0])
    assert np.isnat(decode_date([((2024 << 9) | (5 << 5) | 0).to_bytes(3, "little")])[0])
    # DATETIME2 packed == zero datetime
    zero_dt2 = (0x8000000000).to_bytes(5, "big")
    assert np.isnat(decode_datetime2([zero_dt2], fsp=0)[0])
    assert np.isnat(decode_datetime_v0([(0).to_bytes(8, "little")])[0])
    # and a real value next to a zero stays exact
    got = decode_datetime_v0(
        [(0).to_bytes(8, "little"), (20240517123456).to_bytes(8, "little")]
    )
    assert np.isnat(got[0]) and pd.Timestamp(got[1]) == pd.Timestamp(
        "2024-05-17 12:34:56"
    )


def test_long_char_meta_quirk():
    """CHAR columns >255 bytes hide type+length in the meta bytes (MySQL
    bug #37426; fetchValue special case RowsLogBuffer.java:252-268):
    the decoded max length drives a 2-byte length prefix."""
    from binlake_spark.functions.binlog_decode import (
        char_meta,
        encode_char_table_meta,
    )

    # 300-byte CHAR: meta byte0 = 0xFE ^ 0x10 = 0xEE, byte1 = 44
    meta = encode_char_table_meta(300)
    assert meta == (0xEE << 8) | 44
    typ, ln = char_meta(meta)
    assert (typ, ln) == (0xFE, 300)
    # short CHAR keeps the plain layout
    typ, ln = char_meta(encode_char_table_meta(255))
    assert (typ, ln) == (0xFE, 255)
    for want in (0, 1, 255, 256, 300, 511, 767, 1020, 1023):
        _, ln = char_meta(encode_char_table_meta(want))
        assert ln == want


def test_row_image_long_char_and_v0(spark):
    """Row-image walk with a 300-byte CHAR (2-byte prefix via the meta
    quirk), a short CHAR, v0 temporals, and NULLs interleaved."""
    from binlake_spark.functions.binlog_decode import (
        ColumnSpec,
        decode_row_images,
        encode_char_table_meta,
        encode_row_images,
    )

    specs = [
        ColumnSpec("uid", "int32"),
        ColumnSpec("c_long", "char", (encode_char_table_meta(300),)),
        ColumnSpec("c_short", "char", (encode_char_table_meta(40),)),
        ColumnSpec("dt0", "datetime_v0"),
        ColumnSpec("t0", "time_v0"),
        ColumnSpec("amount", "newdecimal", (12, 2)),
    ]
    long_text = "x" * 299 + "Z"
    rows = [
        {
            "uid": 0,
            "c_long": long_text,
            "c_short": "hello",
            "dt0": pd.Timestamp("2011-03-04 05:06:07"),
            "t0": -pd.Timedelta(hours=100, minutes=2, seconds=3),
            "amount": Decimal("12345.67"),
        },
        {
            "uid": 1,
            "c_long": None,
            "c_short": "",
            "dt0": None,
            "t0": pd.Timedelta(0),
            "amount": Decimal("-0.01"),
        },
    ]
    imgs = encode_row_images(rows, specs)
    out = decode_row_images(
        spark.createDataFrame(pd.DataFrame({"row_image": imgs})), "row_image", specs
    )
    got = {r.uid: r for r in out.collect()}
    assert got[0].c_long == long_text and got[0].c_short == "hello"
    assert got[0].dt0 == pd.Timestamp("2011-03-04 05:06:07")
    assert got[0].t0 == -pd.Timedelta(hours=100, minutes=2, seconds=3)
    assert got[0].amount == Decimal("12345.67")
    assert got[1].c_long is None and got[1].c_short == ""
    assert got[1].dt0 is None and got[1].t0 == pd.Timedelta(0)
    assert got[1].amount == Decimal("-0.01")


def test_decode_wire_columns_nulls(spark):
    """NULL binary cells propagate as typed NULLs through the fused
    Arrow pass (was 'nulls unsupported by design')."""
    from binlake_spark.functions.binlog_decode import (
        decode_wire_columns,
        encode_newdecimal,
        encode_time2,
    )

    n = 100
    decs = [Decimal(i).scaleb(-2) for i in range(n)]
    denc = encode_newdecimal(decs, 10, 2)
    tds = [
        (-1 if i % 3 == 0 else 1) * pd.Timedelta(seconds=i, microseconds=i)
        for i in range(n)
    ]
    tenc = encode_time2(tds, 6)
    pdf = pd.DataFrame(
        {
            "row_id": np.arange(n, dtype=np.int64),
            "amount": [None if i % 7 == 0 else denc[i] for i in range(n)],
            "elapsed": [None if i % 5 == 0 else tenc[i] for i in range(n)],
        }
    )
    df = spark.createDataFrame(pdf)
    out = decode_wire_columns(
        df, {"amount": ("newdecimal", 10, 2), "elapsed": ("time2", 6)}
    )
    rows = {r.row_id: r for r in out.collect()}
    for i in range(n):
        if i % 7 == 0:
            assert rows[i].amount is None
        else:
            assert rows[i].amount == decs[i]
        if i % 5 == 0:
            assert rows[i].elapsed is None
        else:
            assert rows[i].elapsed == tds[i].to_pytimedelta()


def test_charset_collation_table():
    """Public SHOW COLLATION mapping (CharsetConversion.java analog) —
    including the two mappings the reference gets wrong (utf8mb4 ids
    45/46 → MacCentralEurope there; latin5 → ISO8859_5 there)."""
    from binlake_spark.functions.charset import (
        charset_for_collation,
        codec_for_collation,
    )

    assert charset_for_collation(28) == "gbk"
    assert charset_for_collation(33) == "utf8"
    assert charset_for_collation(8) == "latin1"
    assert charset_for_collation(45) == "utf8mb4"
    assert charset_for_collation(255) == "utf8mb4"  # 8.0 uca900 default
    assert charset_for_collation(63) == "binary"
    assert charset_for_collation(248) == "gb18030"
    assert codec_for_collation(45) == "utf-8"       # NOT MacCentralEurope
    assert codec_for_collation(30) == "iso8859-9"   # Turkish, NOT 8859-5
    assert codec_for_collation(63) is None
    with pytest.raises(ValueError, match="unknown MySQL collation"):
        charset_for_collation(17_000)
    with pytest.raises(LookupError, match="no.*exact Python codec"):
        codec_for_collation(10)  # swe7


def test_charset_known_byte_vectors():
    """Byte-level truth: the same text has different wire bytes per
    charset, and the decoder must pick the right codec from the
    collation id (RowsLogBuffer fetchValue string arm + charset from the
    table meta)."""
    from binlake_spark.functions.binlog_decode import (
        ColumnSpec,
        encode_row_images,
        split_row_images,
    )

    # "中文" in gbk is 4 bytes, in utf8 6 bytes; "café" latin1 has 0xE9
    specs = [
        ColumnSpec("g", "varchar", (80,), charset=28),
        ColumnSpec("u", "varchar", (80,), charset=45),
        ColumnSpec("l", "varchar", (80,), charset=8),
    ]
    img = encode_row_images([{"g": "中文", "u": "中文", "l": "café"}], specs)[0]
    cells = split_row_images([img], specs)
    assert cells[0][0] == "中文".encode("gbk") and len(cells[0][0]) == 4
    assert cells[1][0] == "中文".encode("utf-8") and len(cells[1][0]) == 6
    assert cells[2][0] == b"caf\xe9"


def test_row_image_charsets_spark(spark):
    """gbk / latin1 / big5 / binary-collation columns through the fused
    Spark decode pass: text survives bit-exactly per charset, and the
    binary charset (63) yields bytes, not a string."""
    from binlake_spark.functions.binlog_decode import (
        ColumnSpec,
        decode_row_images,
        encode_char_table_meta,
        encode_row_images,
    )

    specs = [
        ColumnSpec("uid", "int32"),
        ColumnSpec("zh", "varchar", (120,), charset=28),      # gbk
        ColumnSpec("fr", "char", (encode_char_table_meta(40),), charset=8),
        ColumnSpec("tw", "varchar", (120,), charset=1),       # big5
        ColumnSpec("raw", "varchar", (40,), charset=63),      # binary
    ]
    rows = [
        {"uid": 0, "zh": "数据库同步", "fr": "déjà vu", "tw": "資料庫",
         "raw": b"\x00\xff\xfe"},
        {"uid": 1, "zh": None, "fr": "", "tw": "繁體", "raw": b""},
    ]
    imgs = encode_row_images(rows, specs)
    out = decode_row_images(
        spark.createDataFrame(pd.DataFrame({"row_image": imgs})),
        "row_image",
        specs,
    )
    assert dict(out.dtypes)["raw"] == "binary"
    got = {r.uid: r for r in out.collect()}
    assert got[0].zh == "数据库同步" and got[0].fr == "déjà vu"
    assert got[0].tw == "資料庫" and bytes(got[0].raw) == b"\x00\xff\xfe"
    assert got[1].zh is None and got[1].fr == ""
    assert got[1].tw == "繁體" and bytes(got[1].raw) == b""


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.text(
                # chars every tested charset can carry: ASCII + a CJK set
                alphabet=st.sampled_from(
                    list("abcXYZ09 _-") + list("数据库同步变更日志")
                ),
                max_size=40,
            )
            | st.none(),
            min_size=1,
            max_size=6,
        ),
        st.sampled_from([28, 45, 24, 1, 248]),  # gbk utf8mb4 gb2312 big5 gb18030
    )
    def test_charset_property_roundtrip(texts, collation):
        """Any charset-encodable text survives the row-image walk under
        any of the CJK-capable collations, NULLs included."""
        from hypothesis import assume

        from binlake_spark.functions.binlog_decode import (
            ColumnSpec,
            encode_row_images,
            split_row_images,
        )
        from binlake_spark.functions.charset import codec_for_collation

        codec = codec_for_collation(collation)
        try:  # e.g. simplified-only chars are not big5-encodable
            for t in texts:
                if t is not None:
                    t.encode(codec)
        except UnicodeEncodeError:
            assume(False)
        specs = [
            ColumnSpec(f"c{i}", "varchar", (300,), charset=collation)
            for i in range(len(texts))
        ]
        imgs = encode_row_images([dict(zip((s.name for s in specs), texts))], specs)
        cells = split_row_images(imgs, specs)
        got = [
            None if cells[i][0] is None else cells[i][0].decode(codec)
            for i in range(len(texts))
        ]
        assert got == list(texts)

except ImportError:  # pragma: no cover
    pass


def test_decode_wire_columns_string_charsets(spark):
    """Whole-cell string wire columns decode per collation, NULLs
    propagate, binary collation stays bytes."""
    from binlake_spark.functions.binlog_decode import decode_wire_columns

    pdf = pd.DataFrame(
        {
            "row_id": [0, 1, 2],
            "zh": ["中文".encode("gbk"), None, "日志".encode("gbk")],
            "fr": ["café".encode("latin-1"), "".encode(), None],
            "raw": [b"\x00\xff", b"", None],
        }
    )
    out = decode_wire_columns(
        spark.createDataFrame(pdf),
        {"zh": ("string", 28), "fr": ("string", 8), "raw": ("string", 63)},
    )
    assert dict(out.dtypes)["raw"] == "binary"
    rows = {r.row_id: r for r in out.collect()}
    assert rows[0].zh == "中文" and rows[0].fr == "café"
    assert bytes(rows[0].raw) == b"\x00\xff"
    assert rows[1].zh is None and rows[1].fr == "" and bytes(rows[1].raw) == b""
    assert rows[2].zh == "日志" and rows[2].fr is None and rows[2].raw is None


def test_zero_timestamp_decodes_to_nat():
    """Zero TIMESTAMP ('0000-00-00 00:00:00', 0 epoch seconds on the
    wire) → NaT in both formats, not a fabricated 1970-01-01 (the
    module's zero-date rule; the reference emits the zero literal)."""
    import numpy as np

    from binlake_spark.functions.binlog_decode import (
        decode_timestamp2,
        decode_timestamp_v0,
    )

    v0 = decode_timestamp_v0([b"\x00\x00\x00\x00", (1000).to_bytes(4, "little")])
    assert np.isnat(v0[0]) and not np.isnat(v0[1])
    t2 = decode_timestamp2([b"\x00\x00\x00\x00", (1000).to_bytes(4, "big")], fsp=0)
    assert np.isnat(t2[0]) and not np.isnat(t2[1])
