"""Protobuf wire codec: spec known-vectors, property round-trips, the
formatByRows packet-split semantics, and the Spark produce pass.

Known vectors come from the published protobuf encoding documentation
(the classic Test1/Test2/Test3 examples), so the codec is checked
against the wire format itself, not against its own inverse only.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from binlake_spark.functions.proto_codec import (
    DESCRIPTORS,
    ENTRY_TYPE,
    EVENT_TYPE,
    MAX_PACKET_SIZE,
    MessageDesc,
    decode_message,
    encode_message,
    pack_entries,
    row_to_rowdata,
    transaction_marker,
)

# ------------------------------------------------------------------ #
# spec known-vectors
# ------------------------------------------------------------------ #

DESCRIPTORS["_T1"] = MessageDesc("_T1", {"a": (1, "int32", False)})
DESCRIPTORS["_T2"] = MessageDesc("_T2", {"b": (2, "string", False)})
DESCRIPTORS["_T3"] = MessageDesc("_T3", {"c": (3, "_T1", False)})


def test_spec_vector_varint_150():
    # protobuf docs: Test1{a=150} -> 08 96 01
    assert encode_message("_T1", {"a": 150}) == bytes.fromhex("089601")
    assert decode_message("_T1", bytes.fromhex("089601")) == {"a": 150}


def test_spec_vector_string():
    # Test2{b="testing"} -> 12 07 74 65 73 74 69 6e 67
    want = bytes.fromhex("120774657374696e67")
    assert encode_message("_T2", {"b": "testing"}) == want
    assert decode_message("_T2", want) == {"b": "testing"}


def test_spec_vector_embedded_message():
    # Test3{c=Test1{a=150}} -> 1a 03 08 96 01
    want = bytes.fromhex("1a03089601")
    assert encode_message("_T3", {"c": {"a": 150}}) == want
    assert decode_message("_T3", want) == {"c": {"a": 150}}


def test_spec_vector_negative_int_is_ten_byte_varint():
    # proto2 int32 -1 -> 08 ff ff ff ff ff ff ff ff ff 01
    want = bytes.fromhex("08ffffffffffffffffff01")
    assert encode_message("_T1", {"a": -1}) == want
    assert decode_message("_T1", want) == {"a": -1}


def test_unknown_fields_are_skipped():
    # decoding Test2 bytes with Test1's descriptor: field 2 is unknown,
    # skipped; result is empty (forward compatibility)
    assert decode_message("_T1", encode_message("_T2", {"b": "x"})) == {}


# ------------------------------------------------------------------ #
# property round-trips over the WaveEntry model
# ------------------------------------------------------------------ #

_txt = st.text(max_size=40)


@st.composite
def _column(draw):
    c = {
        "index": draw(st.integers(0, 63)),
        "sqlType": draw(st.sampled_from([12, 4, -1, 93])),
        "name": draw(_txt),
        "isKey": draw(st.booleans()),
        "isNull": draw(st.booleans()),
    }
    if not c["isNull"]:
        c["value"] = draw(_txt)
        c["length"] = len(c["value"])
    if draw(st.booleans()):
        c["updated"] = draw(st.booleans())
    return c


@st.composite
def _row_change(draw):
    rows = draw(
        st.lists(
            st.fixed_dictionaries(
                {},
                optional={
                    "beforeColumns": st.lists(_column(), max_size=4),
                    "afterColumns": st.lists(_column(), max_size=4),
                },
            ).filter(bool),
            max_size=4,
        )
    )
    rc = {
        "tableId": draw(st.integers(0, 2**62)),
        "eventType": draw(st.sampled_from(sorted(EVENT_TYPE.values()))),
        "isDdl": draw(st.booleans()),
    }
    if rows:
        rc["rowDatas"] = [r for r in rows if r]
    if rc["isDdl"]:
        rc["sql"] = draw(_txt)
        rc["ddlSchemaName"] = draw(_txt)
    return rc


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_row_change())
def test_rowchange_roundtrip(rc):
    enc = encode_message("RowChange", rc)
    dec = decode_message("RowChange", enc)

    # empty repeated lists are indistinguishable from absent on the wire
    def norm(v):
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items() if x != []}
        if isinstance(v, list):
            return [norm(x) for x in v]
        return v

    assert dec == norm(rc)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(-(2**62), 2**62),
    st.integers(0, 2**31 - 1),
    _txt,
)
def test_entry_header_roundtrip(off, ln, name):
    e = {
        "header": {
            "version": 1,
            "logfileName": name,
            "logfileOffset": off,
            "eventLength": ln,
            "props": [{"key": "gtid", "value": "uuid:1-5"}],
        },
        "entryType": ENTRY_TYPE["ROWDATA"],
        "storeValue": name.encode(),
        "batchId": abs(off),
        "ip": "spark",
    }
    assert decode_message("Entry", encode_message("Entry", e)) == e


# ------------------------------------------------------------------ #
# formatByRows analog semantics
# ------------------------------------------------------------------ #


def _mk_row(i, op="I", ntok=3, before=None):
    return {
        "op": op,
        "doc_id": f"doc{i:06d}",
        "tokens": list(range(ntok)),
        "n_tok": ntok,
        "source": "web",
        "before_tokens": before,
        "seq": i,
    }


def test_row_images_match_op_layout():
    ins = row_to_rowdata("I", "d", [1, 2], 2, "web")
    assert "beforeColumns" not in ins and len(ins["afterColumns"]) == 4
    dele = row_to_rowdata("D", "d", [1, 2], 2, "web")
    assert "afterColumns" not in dele and len(dele["beforeColumns"]) == 4
    upd = row_to_rowdata("U", "d", [9, 9], 2, "web", before_tokens=[1, 2])
    # UPDATE: both images in ONE RowData; updated flags only on after
    assert len(upd["beforeColumns"]) == 4 and len(upd["afterColumns"]) == 4
    assert "updated" not in upd["beforeColumns"][0]
    flags = [c["updated"] for c in upd["afterColumns"]]
    assert flags == [False, True, False, False]  # only tokens changed
    # NULL cell: isNull set, no value (tokens None on a delete tombstone)
    tomb = row_to_rowdata("D", "d", None, None, "web")
    tok_col = tomb["beforeColumns"][1]
    assert tok_col["isNull"] and "value" not in tok_col


def test_pack_splits_at_10k_on_row_boundaries():
    rows = [_mk_row(i, ntok=200) for i in range(40)]  # ~1 KiB each
    packets = pack_entries(rows)
    assert len(packets) > 1
    total = 0
    for key, et, nr, eb in packets:
        entry = decode_message("Entry", eb)
        assert entry["entryType"] == ENTRY_TYPE["ROWDATA"]
        rc = decode_message("RowChange", entry["storeValue"])
        n = len(rc["rowDatas"])
        assert n >= 1 and n == nr
        total += n
        # split happens at the first row boundary after the cap: a packet
        # never exceeds cap + one row's size (rows here ~1 KiB)
        assert len(entry["storeValue"]) < MAX_PACKET_SIZE + 4096
        assert rc["eventType"] == EVENT_TYPE["INSERT"]
        assert entry["header"]["tableName"] == "documents"
    assert total == 40


def test_pack_groups_runs_by_op_and_keeps_update_whole():
    rows = [
        _mk_row(0, "I"),
        _mk_row(1, "I"),
        _mk_row(2, "U", before=[7]),
        _mk_row(3, "D"),
    ]
    packets = pack_entries(rows)
    kinds = []
    for _, et, _, eb in packets:
        rc = decode_message("RowChange", decode_message("Entry", eb)["storeValue"])
        kinds.append((et, len(rc["rowDatas"])))
        if et == EVENT_TYPE["UPDATE"]:
            rd = rc["rowDatas"][0]
            assert "beforeColumns" in rd and "afterColumns" in rd
    assert kinds == [
        (EVENT_TYPE["INSERT"], 2),
        (EVENT_TYPE["UPDATE"], 1),
        (EVENT_TYPE["DELETE"], 1),
    ]


def test_transaction_markers_roundtrip():
    b = decode_message("Entry", transaction_marker("begin", 42, 1700000000000, 7))
    assert b["entryType"] == ENTRY_TYPE["TRANSACTIONBEGIN"]
    tb = decode_message("TransactionBegin", b["storeValue"])
    assert tb == {"executeTime": 1700000000000, "transactionId": "42", "threadId": 7}
    e = decode_message("Entry", transaction_marker("end", 42, 1700000000001))
    assert e["entryType"] == ENTRY_TYPE["TRANSACTIONEND"]


# ------------------------------------------------------------------ #
# Spark produce pass
# ------------------------------------------------------------------ #


def test_encode_entries_spark_pass(spark, tmp_path):
    from binlake_spark.changelog.generator import (
        CHANGE_LOG_SCHEMA,
        GenSpec,
        generate_change_log,
        write_change_log,
    )
    from binlake_spark.functions.proto_codec import encode_entries

    pdf = generate_change_log(GenSpec(n_docs=40, n_events=600, retransmit_frac=0.1))
    write_change_log(pdf, str(tmp_path / "log"))
    log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(str(tmp_path / "log"))

    n_events = log.count()
    out = encode_entries(log.select("op", "doc_id", "tokens", "n_tok", "source", "seq"))
    rows = out.collect()
    assert sum(r["n_rows"] for r in rows) == n_events  # every event packed exactly once
    # decode every packet back and compare against the source rows
    seen = []
    for r in rows:
        entry = decode_message("Entry", bytes(r["entry"]))
        rc = decode_message("RowChange", entry["storeValue"])
        assert len(rc["rowDatas"]) == r["n_rows"]
        for rd in rc["rowDatas"]:
            cols = rd.get("afterColumns") or rd.get("beforeColumns")
            byname = {c["name"]: c for c in cols}
            assert byname["doc_id"]["isKey"] is True
            seen.append(
                (
                    byname["doc_id"]["value"],
                    byname["tokens"].get("value"),
                    rc["eventType"],
                )
            )
    src = [
        (
            r["doc_id"],
            None if r["tokens"] is None else ",".join(map(str, r["tokens"])),
            {"I": 1, "U": 2, "D": 3}[r["op"]],
        )
        for r in log.select("doc_id", "tokens", "op").collect()
    ]
    assert sorted(seen) == sorted(src)


def test_pack_per_row_mode():
    # formatByOneRow analog: max_packet_size=0 degenerates to one Entry
    # per row, each keyed by its own doc_id (BUSINESS_KEY_ORDER needs this)
    rows = [_mk_row(i) for i in range(5)]
    packets = pack_entries(rows, max_packet_size=0)
    assert len(packets) == 5
    assert [k.decode() for k, _, _, _ in packets] == [r["doc_id"] for r in rows]


def test_pack_ddl_query_rows():
    """Non-I/U/D ops become their own RowChange{isDdl, sql} packet with
    no row images (formatQuery analog), splitting the surrounding runs."""
    rows = [
        _mk_row(0, "I"),
        {"op": "Q", "doc_id": "", "sql": "ALTER TABLE documents ADD COLUMN lang STRING",
         "seq": 1, "ts_ms": 1700000000000},
        _mk_row(2, "I"),
    ]
    packets = pack_entries(rows)
    assert [(et, nr) for _, et, nr, _ in packets] == [
        (EVENT_TYPE["INSERT"], 1), (EVENT_TYPE["QUERY"], 0), (EVENT_TYPE["INSERT"], 1),
    ]
    q = decode_message("Entry", packets[1][3])
    rc = decode_message("RowChange", q["storeValue"])
    assert rc["isDdl"] is True and rc["sql"].startswith("ALTER TABLE")
    assert "rowDatas" not in rc
    assert q["header"]["executeTime"] == 1700000000000


def test_encode_entries_populates_execute_time_and_ddl(spark, tmp_path):
    from binlake_spark.changelog.generator import (
        CHANGE_LOG_SCHEMA, GenSpec, generate_change_log, write_change_log,
    )
    from binlake_spark.functions.proto_codec import encode_entries

    pdf = generate_change_log(
        GenSpec(n_docs=20, n_events=200, evolution_at=100, ddl_events=True)
    )
    write_change_log(pdf, str(tmp_path / "log"))
    log = spark.read.schema(CHANGE_LOG_SCHEMA).parquet(str(tmp_path / "log"))
    out = encode_entries(
        log.select("op", "doc_id", "tokens", "n_tok", "source", "seq", "ts", "extra")
    ).collect()
    assert sum(r["n_rows"] for r in out) == log.filter(F.col("op") != "Q").count()
    qs = [r for r in out if r["event_type"] == EVENT_TYPE["QUERY"]]
    assert len(qs) == 1
    rc = decode_message("RowChange", decode_message("Entry", bytes(qs[0]["entry"]))["storeValue"])
    assert rc["isDdl"] is True and "ADD COLUMN" in rc["sql"].upper()
    # executeTime carries the event timestamp, not zero
    some = decode_message("Entry", bytes(out[0]["entry"]))
    assert some["header"]["executeTime"] > 1_500_000_000_000
