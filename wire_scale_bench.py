"""Wire-walk scaling: does the binlog stream decode (deframe + event
walk + row split + typed image decode — the round-5 layer) scale with
cores like the rest of the engine?

The walk is Python inside mapInArrow, so the obvious 100x question is
whether it serializes.  It shouldn't: each blob is self-contained, the
walk distributes with the scan, and there is no shuffle at all.  This
harness measures it the same way every other scaling gate here is
measured (scale_bench.py protocol): fixed deterministic input, each leg
in its OWN JVM via subprocess, best-of-N with cpu probes, artifact with
every rep recorded.

    python wire_scale_bench.py          # orchestrates; writes WIRE_SCALING_<label>.json
    BINLAKE_WIRE_CPUS=8 BINLAKE_WIRE_ROWS=800000 python wire_scale_bench.py --one

Legs: (local[2], R rows), (local[2], 4R), (local[8], 4R) → weak
efficiency t_2(R)/t_8(4R), strong efficiency t_2(4R)/t_8(4R)/4.
Work per leg: read the blob parquet → binlog_rows_stream → decode_row_
images → count + checksum aggregate (forces every image through the
typed decode).
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

ROWS = int(os.environ.get("BINLAKE_WIRE_BASE_ROWS", "200000"))
REPS = int(os.environ.get("BINLAKE_WIRE_REPS", "2"))
LABEL = os.environ.get("BINLAKE_WIRE_LABEL", "r05")
ROWS_PER_EVENT = 100   # MySQL batches many rows per ROWS event
EVENTS_PER_BLOB = 20   # ~2000 rows per blob → hundreds of blobs per leg
CACHE = "/tmp/binlake_wire_scale"


def _blobs_dir(n_rows: int) -> str:
    """Build (once) a deterministic blob directory of n_rows changes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from binlake_spark.functions.binlog_decode import encode_row_images
    from binlake_spark.functions.binlog_events import (
        GTID_EVENT,
        TABLE_MAP_EVENT,
        XID_EVENT,
        encode_event,
        encode_gtid_body,
        encode_rows_event,
        encode_table_map,
        encode_xid_body,
    )
    from binlake_spark.functions.framing import frame_payloads
    from binlake_spark.sources.binlog_bridge import (
        DOCS_WIRE_COLUMNS,
        docs_wire_specs,
    )

    out = os.path.join(CACHE, f"rows{n_rows}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    specs = docs_wire_specs()
    # 64 distinct payloads of 16 tokens, reused round-robin: content is
    # irrelevant to the walk, byte LAYOUT (varints, null bitmap, varchar
    # lengths) is what's being exercised
    rows = [
        {
            "doc_id": f"doc{i % 50000:06d}",
            "payload": bytes((i + j) % 251 for j in range(64)),
            "n_tok": 16,
            "source": "web" if i % 4 else "books",
            "schema_ver": 1,
        }
        for i in range(n_rows)
    ]
    images = encode_row_images(rows, specs)
    tmap = encode_table_map(1, "shop", "docs", DOCS_WIRE_COLUMNS)
    blob_id, events, batch_rows = 0, [], 0
    tables, gno = [], 0
    for lo in range(0, len(images), ROWS_PER_EVENT):
        chunk = [(img, None) for img in images[lo : lo + ROWS_PER_EVENT]]
        if not events:
            gno += 1
            events.append(encode_event(GTID_EVENT, encode_gtid_body(
                "e6954592-8dba-11e6-af0e-fa163e1cf111", gno)))
            events.append(encode_event(TABLE_MAP_EVENT, tmap))
        events.append(encode_event(
            *encode_rows_event(1, "I", chunk, len(specs))
        ))
        batch_rows += len(chunk)
        if len(events) >= EVENTS_PER_BLOB:
            events.append(encode_event(XID_EVENT, encode_xid_body(gno)))
            tables.append((blob_id, frame_payloads(events)))
            blob_id += 1
            events, batch_rows = [], 0
    if events:
        events.append(encode_event(XID_EVENT, encode_xid_body(gno)))
        tables.append((blob_id, frame_payloads(events)))
    import pyarrow as pa  # noqa: F811

    # one ROW GROUP per blob: byte-range splits then map to row groups,
    # so the scan parallelizes — a single default row group would pin
    # the whole walk to one task no matter the split size
    pq.write_table(
        pa.table({
            "blob_id": pa.array([b for b, _ in tables], type=pa.int64()),
            "frames": pa.array([f for _, f in tables], type=pa.binary()),
        }),
        os.path.join(out, "blobs.parquet"),
        row_group_size=1,
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out


def one_leg() -> int:
    import time

    from binlake_spark.session import get_spark
    from binlake_spark.sources.binlog_bridge import (
        DOCS_WIRE_OVERLAY,
        docs_wire_specs,
    )
    from pyspark.sql import functions as F

    cpus = int(os.environ["BINLAKE_WIRE_CPUS"])
    n_rows = int(os.environ["BINLAKE_WIRE_ROWS"])
    path = _blobs_dir(n_rows)
    spark = get_spark("wire_scale", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # size file splits to the core count: the blob files are small
    # (~hundreds of KB) and the default 128 MB maxPartitionBytes would
    # coalesce them all into ONE task, measuring nothing.  Production
    # spools size blobs in MBs where the default packing is fine.
    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet")
    )
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes",
        str(max(1 << 20, total // (cpus * 4))),
    )
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        frames = spark.read.schema("blob_id long, frames binary").parquet(path)
        # warmup: python workers + JIT on a small slice
        warm = frames.limit(4)
        _run(warm, DOCS_WIRE_OVERLAY, docs_wire_specs(), F)
        t0 = time.monotonic()
        got = _run(frames, DOCS_WIRE_OVERLAY, docs_wire_specs(), F)
        wall = time.monotonic() - t0
        assert got == n_rows, (got, n_rows)
        print(json.dumps({
            "cpus": cpus, "rows": n_rows, "wall_sec": round(wall, 3),
            "rows_per_sec": round(n_rows / wall, 1),
        }))
        return 0
    finally:
        spark.stop()


def _run(frames, overlay, specs, F) -> int:
    from binlake_spark.functions.binlog_decode import decode_row_images
    from binlake_spark.functions.binlog_events import binlog_rows_stream

    rows = binlog_rows_stream(frames, schema_overlay={("shop", "docs"): overlay})
    typed = decode_row_images(rows.select("op", "image"), "image", specs)
    out = typed.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("payload")).alias("bytes"),
        F.sum("n_tok").alias("toks"),
    ).collect()[0]
    return int(out["n"])


def run_leg(cpus: int, rows: int) -> dict:
    from bench_util import cpu_probe

    reps, probes = [], []
    for _ in range(REPS):
        p0 = cpu_probe()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one"],
            env=dict(os.environ, BINLAKE_WIRE_CPUS=str(cpus),
                     BINLAKE_WIRE_ROWS=str(rows)),
            capture_output=True, text=True, timeout=1800,
        )
        p1 = cpu_probe()
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        reps.append(json.loads(line))
        probes.append((p0, p1))
    best = min(reps, key=lambda r: r["wall_sec"])
    return {**best, "rep_walls": [r["wall_sec"] for r in reps],
            "probes": probes}


def main() -> int:
    if "--one" in sys.argv:
        return one_leg()
    started = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds")
    legs = {
        "n2_base": run_leg(2, ROWS),
        "n2_4x": run_leg(2, 4 * ROWS),
        "n8_4x": run_leg(8, 4 * ROWS),
    }
    weak = round(legs["n2_base"]["wall_sec"] / legs["n8_4x"]["wall_sec"], 3)
    strong = round(
        legs["n2_4x"]["wall_sec"] / legs["n8_4x"]["wall_sec"] / 4, 3
    )
    result = {
        "metric": "wire_walk_scaling",
        "label": LABEL,
        "base_rows": ROWS,
        "rows_per_event": ROWS_PER_EVENT,
        "events_per_blob": EVENTS_PER_BLOB,
        "started_utc": started,
        "legs": legs,
        "weak_efficiency_2_to_8": weak,
        "strong_efficiency_2_to_8": strong,
        "finished_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
    }
    print(json.dumps(result, indent=1))
    with open(os.path.join(HERE, f"WIRE_SCALING_{LABEL}.json"), "w") as f:
        json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
