"""MySQL collation-id → character-set → Python codec mapping.

The binlog TABLE_MAP carries no per-column charset; the reference fetches
it from the upstream schema and keeps a collation-id lookup table to
convert string column bytes (CharsetConversion.java:14-260, itself built
from the public ``com.mysql.jdbc.CharsetMapping`` table; consumed per
column in RowsLogBuffer.fetchValue's string arm).  This module is the
same public MySQL collation table (``SHOW COLLATION`` /
INFORMATION_SCHEMA.COLLATIONS) expressed as Python codec names, consumed
by :func:`binlake_spark.functions.binlog_decode.decode_row_images` via
``ColumnSpec.charset``.

Two mappings in the reference's table are known-wrong and deliberately
NOT reproduced here: utf8mb4 (ids 45/46) is mapped to MacCentralEurope
there (CharsetConversion.java:106-107) but is UTF-8, and latin5 (id 30)
is mapped to ISO8859_5 (Cyrillic) there but MySQL latin5 is Turkish,
ISO-8859-9.

Charsets with no exact Python codec (dec8, hp8, swe7, armscii8, keybcs2,
geostd8, eucjpms) raise :class:`LookupError` at decode time rather than
silently mis-decoding through a near-miss codec.  Collation 63
(``binary``) returns codec ``None``: the column is bytes, not text
(MySQL treats CHAR/VARCHAR with the binary charset as VARBINARY).
"""

from __future__ import annotations

# charset name -> Python codec (None = bytes passthrough; absent from
# _CODECS = real MySQL charset with no exact Python codec)
_CODECS: dict[str, str | None] = {
    "big5": "big5",
    "cp850": "cp850",
    "koi8r": "koi8_r",
    "latin1": "latin-1",
    "latin2": "iso8859-2",
    "ascii": "ascii",
    "ujis": "euc_jp",
    "sjis": "shift_jis",
    "hebrew": "iso8859-8",
    "tis620": "tis_620",
    "euckr": "euc_kr",
    "koi8u": "koi8_u",
    "gb2312": "gb2312",
    "greek": "iso8859-7",
    "cp1250": "cp1250",
    "gbk": "gbk",
    "latin5": "iso8859-9",  # Turkish (the reference's ISO8859_5 is wrong)
    "utf8": "utf-8",
    "cp866": "cp866",
    "macce": "mac_latin2",
    "macroman": "mac_roman",
    "cp852": "cp852",
    "latin7": "iso8859-13",
    "utf8mb4": "utf-8",  # (the reference's MacCentralEurope is wrong)
    "cp1251": "cp1251",
    "utf16": "utf-16-be",  # MySQL utf16 is big-endian
    "utf16le": "utf-16-le",
    "cp1256": "cp1256",
    "cp1257": "cp1257",
    "utf32": "utf-32-be",
    "ucs2": "utf-16-be",  # UCS-2 decodes as UTF-16-BE (BMP only)
    "cp932": "cp932",
    "gb18030": "gb18030",
    "binary": None,
    # no exact Python codec — raise rather than approximate:
    "dec8": ...,  # type: ignore[dict-item]
    "hp8": ...,  # type: ignore[dict-item]
    "swe7": ...,  # type: ignore[dict-item]
    "armscii8": ...,  # type: ignore[dict-item]
    "keybcs2": ...,  # type: ignore[dict-item]
    "geostd8": ...,  # type: ignore[dict-item]
    "eucjpms": ...,  # type: ignore[dict-item]
}

# collation id -> charset name: the sparse singles, then the UCA ranges.
_COLLATIONS: dict[int, str] = {
    1: "big5", 2: "latin2", 3: "dec8", 4: "cp850", 5: "latin1", 6: "hp8",
    7: "koi8r", 8: "latin1", 9: "latin2", 10: "swe7", 11: "ascii",
    12: "ujis", 13: "sjis", 14: "cp1251", 15: "latin1", 16: "hebrew",
    18: "tis620", 19: "euckr", 20: "latin7", 21: "latin2", 22: "koi8u",
    23: "cp1251", 24: "gb2312", 25: "greek", 26: "cp1250", 27: "latin2",
    28: "gbk", 29: "cp1257", 30: "latin5", 31: "latin1", 32: "armscii8",
    33: "utf8", 34: "cp1250", 35: "ucs2", 36: "cp866", 37: "keybcs2",
    38: "macce", 39: "macroman", 40: "cp852", 41: "latin7", 42: "latin7",
    43: "macce", 44: "cp1250", 45: "utf8mb4", 46: "utf8mb4", 47: "latin1",
    48: "latin1", 49: "latin1", 50: "cp1251", 51: "cp1251", 52: "cp1251",
    53: "macroman", 54: "utf16", 55: "utf16", 56: "utf16le", 57: "cp1256",
    58: "cp1257", 59: "cp1257", 60: "utf32", 61: "utf32", 62: "utf16le",
    63: "binary", 64: "armscii8", 65: "ascii", 66: "cp1250", 67: "cp1256",
    68: "cp866", 69: "dec8", 70: "greek", 71: "hebrew", 72: "hp8",
    73: "keybcs2", 74: "koi8r", 75: "koi8u", 76: "utf8", 77: "latin2",
    78: "latin5", 79: "latin7", 80: "cp850", 81: "cp852", 82: "swe7",
    83: "utf8", 84: "big5", 85: "euckr", 86: "gb2312", 87: "gbk",
    88: "sjis", 89: "tis620", 90: "ucs2", 91: "ujis", 92: "geostd8",
    93: "geostd8", 94: "latin1", 95: "cp932", 96: "cp932", 97: "eucjpms",
    98: "eucjpms", 99: "cp1250", 159: "ucs2", 223: "utf8",
}
for _lo, _hi, _cs in (
    (101, 124, "utf16"),      # utf16 UCA collations
    (128, 151, "ucs2"),       # ucs2 UCA collations
    (160, 183, "utf32"),      # utf32 UCA collations
    (192, 215, "utf8"),       # utf8 UCA collations
    (224, 247, "utf8mb4"),    # utf8mb4 UCA 5.2.0 collations
    (248, 250, "gb18030"),    # gb18030 collations
    (255, 323, "utf8mb4"),    # utf8mb4 UCA 9.0.0 collations (MySQL 8.0)
):
    for _i in range(_lo, _hi + 1):
        _COLLATIONS.setdefault(_i, _cs)


def charset_for_collation(collation_id: int) -> str:
    """MySQL character-set name for a protocol collation id."""
    try:
        return _COLLATIONS[collation_id]
    except KeyError:
        raise ValueError(
            f"unknown MySQL collation id {collation_id!r} — not in the "
            "public SHOW COLLATION table"
        ) from None


def codec_for_collation(collation_id: int) -> str | None:
    """Python codec for a collation id; ``None`` means bytes passthrough
    (the ``binary`` charset).  Raises :class:`LookupError` for real MySQL
    charsets Python has no exact codec for — mis-decoding through a
    near-miss codec would silently corrupt text."""
    name = charset_for_collation(collation_id)
    codec = _CODECS[name]
    if codec is ...:
        raise LookupError(
            f"MySQL charset {name!r} (collation {collation_id}) has no "
            "exact Python codec; decode this column as binary and convert "
            "downstream"
        )
    return codec
