"""Ordered produce: the per-key in-partition ordering guarantee
(IKeyGenerator.java:22 key → HashUtils hash&1023 partition → sequential
producer queue), verified on the PHYSICAL emission order."""

import pandas as pd
from pyspark.sql import functions as F

from binlake_spark.functions.avro_codec import ENVELOPE_SCHEMA, decode
from binlake_spark.streaming.produce import ordered_produce, partition_for_key


def test_ordered_produce_physical_order(spark):
    from binlake_spark.changelog.generator import (
        GenSpec,
        generate_change_log,
    )

    pdf = generate_change_log(
        GenSpec(n_docs=40, n_events=900, retransmit_frac=0.1, hot_keys=2,
                hot_frac=0.3, shuffle_window=80)
    )
    df = spark.createDataFrame(pdf)
    out = ordered_produce(df, num_partitions=8).collect()
    assert len(out) == len(pdf)

    by_pt: dict[int, list] = {}
    for r in out:
        by_pt.setdefault(r.pt, []).append(r)
    assert set(by_pt) <= set(range(8))
    for pt, rows in by_pt.items():
        rows.sort(key=lambda r: r.emit_idx)
        # emit_idx dense 0..n-1 (a real counter, not a rank)
        assert [r.emit_idx for r in rows] == list(range(len(rows)))
        # THE guarantee: seq non-decreasing along physical emission order
        seqs = [r.seq for r in rows]
        assert seqs == sorted(seqs), f"partition {pt} emitted out of order"
        # all events of one key live in one partition
    key_pts = {}
    for r in out:
        key_pts.setdefault(r.key, set()).add(r.pt)
    assert all(len(p) == 1 for p in key_pts.values())

    # value payloads decode back to the source events
    sample = by_pt[next(iter(by_pt))][0]
    rec = decode(ENVELOPE_SCHEMA, bytes(sample.avro))
    assert rec["doc_id"] == sample.key and rec["seq"] == sample.seq


def test_partition_for_key_portable_matches_md5(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [f"doc{i:06d}" for i in range(200)]})
    )
    got = df.select(
        "doc_id", partition_for_key("doc_id", 16, portable=True).alias("pt")
    ).collect()
    import hashlib

    for r in got:
        want = int(hashlib.md5(r.doc_id.encode()).hexdigest()[:15], 16) % 16
        assert r.pt == want


def test_ordered_produce_proto_format(spark):
    """format='proto': same ordering contract, value = one WaveEntry per
    row (the per-row converter BUSINESS_KEY_ORDER requires); packets
    decode back to the source rows."""
    from binlake_spark.changelog.generator import GenSpec, generate_change_log
    from binlake_spark.functions.proto_codec import decode_message

    pdf = generate_change_log(GenSpec(n_docs=20, n_events=300))
    df = spark.createDataFrame(pdf)
    out = ordered_produce(df, num_partitions=4, format="proto").collect()
    assert len(out) == len(pdf)

    by_pt: dict[int, list] = {}
    for r in out:
        by_pt.setdefault(r.pt, []).append(r)
    for pt, rows in by_pt.items():
        rows.sort(key=lambda r: r.emit_idx)
        seqs = [r.seq for r in rows]
        assert seqs == sorted(seqs), f"partition {pt} emitted out of order"

    want = {
        (int(t.seq), t.doc_id, ",".join(map(str, t.tokens)) if t.tokens is not None else None)
        for t in pdf.itertuples()
    }
    got = set()
    for r in out:
        entry = decode_message("Entry", bytes(r.entry))
        rc = decode_message("RowChange", entry["storeValue"])
        (rd,) = rc["rowDatas"]
        cols = rd.get("afterColumns") or rd.get("beforeColumns")
        byname = {c["name"]: c for c in cols}
        got.add((int(r.seq), byname["doc_id"]["value"], byname["tokens"].get("value")))
    assert got == want


def test_ordered_produce_proto_passthrough_entries(spark):
    """ROWS_QUERY (op 'R') and HEARTBEAT (op 'H') entries are producible
    through ordered_produce's proto format (IConvert.java:120-132):
    statement text survives the round-trip, heartbeats carry the
    liveness header only, and per-key ordering still holds."""
    from binlake_spark.functions.proto_codec import decode_message

    rows = []
    for i in range(60):
        rows.append((i, f"d{i % 7}", "I", [i, i + 1], 2, "web", None))
        if i % 10 == 0:
            rows.append(
                (1000 + i, f"d{i % 7}", "R", None, None, None,
                 {"sql": f"SELECT /* audit */ {i}"})
            )
        if i % 15 == 0:
            rows.append((2000 + i, f"d{i % 7}", "H", None, None, None, None))
    df = spark.createDataFrame(
        rows,
        "seq long, doc_id string, op string, tokens array<int>, n_tok int,"
        " source string, extra map<string,string>",
    )
    out = ordered_produce(df, num_partitions=4, format="proto").collect()
    assert len(out) == len(rows)
    n_rq = n_hb = 0
    for r in out:
        entry = decode_message("Entry", bytes(r.entry))
        if entry["entryType"] == 4:
            n_hb += 1
            assert entry["storeValue"] == b""
            assert entry["header"]["logfileOffset"] == r.seq
            continue
        rc = decode_message("RowChange", entry["storeValue"])
        if rc.get("sql") is not None and not rc.get("isDdl"):
            n_rq += 1
            assert rc["sql"] == f"SELECT /* audit */ {r.seq - 1000}"
            assert rc["eventType"] == 7
            assert "tableId" not in rc  # bare passthrough, not a DDL
    assert n_rq == 6 and n_hb == 4
    # ordering guarantee unchanged: seqs non-decreasing per partition
    by_pt = {}
    for r in out:
        by_pt.setdefault(r.pt, []).append(r)
    for rows_pt in by_pt.values():
        rows_pt.sort(key=lambda r: r.emit_idx)
        seqs = [r.seq for r in rows_pt]
        assert seqs == sorted(seqs)
