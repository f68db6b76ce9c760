"""Avro binary codec — spec known vectors + round trips.  The reference
ships this converter empty (AvroConverter.java:18-93); this is the real
published Avro 1.11 binary encoding."""

import pandas as pd
import pytest

from binlake_spark.functions.avro_codec import (
    ENVELOPE_SCHEMA,
    decode,
    encode,
    encode_envelopes,
)


def test_avro_spec_known_vectors():
    """Vectors straight from the Avro specification's binary-encoding
    section (zigzag table + the string/record examples)."""
    for n, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                    (-2, b"\x03"), (2, b"\x04"), (-64, b"\x7f"),
                    (64, b"\x80\x01")]:
        assert encode("long", n) == want, n
        assert decode("long", want) == n
    assert encode("string", "foo") == b"\x06foo"
    # spec's record example: {"a": 27, "b": "foo"} -> 36 06 66 6f 6f
    rec_schema = {
        "type": "record", "name": "test",
        "fields": [{"name": "a", "type": "long"},
                   {"name": "b", "type": "string"}],
    }
    assert encode(rec_schema, {"a": 27, "b": "foo"}) == b"\x36\x06foo"
    # spec's array example: [3, 27] as {"type":"array","items":"long"}
    # -> 04 06 36 00
    assert encode({"type": "array", "items": "long"}, [3, 27]) == \
        b"\x04\x06\x36\x00"
    # spec's union example: ["null","string"] null -> 00 ; "a" -> 02 02 61
    assert encode(["null", "string"], None) == b"\x00"
    assert encode(["null", "string"], "a") == b"\x02\x02a"
    assert decode(["null", "string"], b"\x02\x02a") == "a"


def test_avro_envelope_roundtrip():
    recs = [
        {"seq": 1, "doc_id": "doc42", "op": "I", "n_tok": 3,
         "payload": b"\x01\x02\x03", "extra": {"lang": "zh"}},
        {"seq": 2**40, "doc_id": "d-7", "op": "D", "n_tok": None,
         "payload": None, "extra": None},
        {"seq": 0, "doc_id": "", "op": "U", "n_tok": 0,
         "payload": b"", "extra": {}},
    ]
    for r in recs:
        buf = encode(ENVELOPE_SCHEMA, r)
        got = decode(ENVELOPE_SCHEMA, buf)
        # empty map round-trips as {} (or None stays None)
        assert got == r, r
    with pytest.raises(ValueError, match="trailing bytes"):
        decode(ENVELOPE_SCHEMA, encode(ENVELOPE_SCHEMA, recs[0]) + b"\x00")
    with pytest.raises(ValueError, match="no union branch"):
        encode(["null", "long"], "not-a-long")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def test_avro_long_property(n):
        assert decode("long", encode("long", n)) == n

    @settings(max_examples=150, deadline=None)
    @given(
        st.fixed_dictionaries(
            {
                "seq": st.integers(min_value=0, max_value=2**62),
                "doc_id": st.text(max_size=12),
                "op": st.sampled_from(["I", "U", "D", "Q"]),
                "n_tok": st.none() | st.integers(min_value=0, max_value=10**6),
                "payload": st.none() | st.binary(max_size=64),
                "extra": st.none()
                | st.dictionaries(
                    st.text(max_size=8), st.text(max_size=16), max_size=4
                ),
            }
        )
    )
    def test_avro_envelope_property(rec):
        assert decode(ENVELOPE_SCHEMA, encode(ENVELOPE_SCHEMA, rec)) == rec

except ImportError:  # pragma: no cover
    pass


def test_encode_envelopes_spark(spark):
    """Change-log DataFrame -> (key, avro) produce records; every value
    decodes back to the source row."""
    from binlake_spark.changelog.generator import (
        GenSpec,
        generate_change_log,
    )

    pdf = generate_change_log(GenSpec(n_docs=15, n_events=120))
    df = spark.createDataFrame(pdf)
    out = encode_envelopes(
        df.select("seq", "doc_id", "op", "n_tok", "payload", "extra")
    ).collect()
    assert len(out) == len(pdf)
    by_seq = {}
    for r in out:
        rec = decode(ENVELOPE_SCHEMA, bytes(r.avro))
        by_seq[rec["seq"]] = (rec, bytes(r.key))
    for _, src in pdf.iterrows():
        rec, key = by_seq[int(src["seq"])]
        assert key == str(src["doc_id"]).encode()
        assert rec["doc_id"] == src["doc_id"]
        assert rec["op"] == src["op"]
        want_payload = src["payload"]
        assert rec["payload"] == (
            None if want_payload is None else bytes(want_payload)
        )


def test_batch_envelope_encoder_bit_identical_to_generic():
    """encode_envelope_batch is a hand-inlined fast path: it must stay
    bit-identical to the schema-walking encoder for every envelope
    shape — null/None unions, empty and multi-entry maps, empty
    payloads, negative/huge seqs, unicode ids and ops."""
    from binlake_spark.functions.avro_codec import (
        ENVELOPE_SCHEMA,
        encode,
        encode_envelope_batch,
        envelope_record,
    )

    rows = [
        (0, "a", "I", None, None, None),
        (-1, "β-doc", "U", 0, b"", {}),
        (2**62, "x" * 300, "D", 2**31 - 1, b"\x00\xff" * 100, {"k": "v"}),
        (7, "d7", "Q", None, b"\x01\x02\x03\x04", {"lang": "en", "z": ""}),
        (-(2**62), "", "?", 5, None, {"a": "1", "b": "2", "c": "3"}),
    ]
    d = {
        "seq": [r[0] for r in rows],
        "doc_id": [r[1] for r in rows],
        "op": [r[2] for r in rows],
        "n_tok": [r[3] for r in rows],
        "payload": [r[4] for r in rows],
        # arrow map columns arrive as list-of-pairs: mimic that for some
        "extra": [
            list(r[5].items()) if isinstance(r[5], dict) and i % 2 else r[5]
            for i, r in enumerate(rows)
        ],
    }
    n = len(rows)
    got = encode_envelope_batch(d, n)
    exp = [encode(ENVELOPE_SCHEMA, envelope_record(d, i, n)) for i in range(n)]
    assert got == exp


def test_batch_envelope_encoder_dedupes_duplicate_map_keys():
    """An Arrow list-of-pairs extra with a DUPLICATE key must encode
    exactly like the generic path, which dict()-normalizes first (last
    value wins) — the raw pair list would emit both entries and break
    the bit-identical contract (ADVICE r4)."""
    from binlake_spark.functions.avro_codec import (
        ENVELOPE_SCHEMA,
        encode,
        encode_envelope_batch,
        envelope_record,
    )

    d = {
        "seq": [1],
        "doc_id": ["dup"],
        "op": ["U"],
        "n_tok": [3],
        "payload": [None],
        "extra": [[("k", "first"), ("k", "second"), ("o", "x")]],
    }
    got = encode_envelope_batch(d, 1)
    exp = [encode(ENVELOPE_SCHEMA, envelope_record(d, 0, 1))]
    assert got == exp
    # and the winning value is the LAST pair, matching dict() semantics
    assert b"second" in got[0] and b"first" not in got[0]
