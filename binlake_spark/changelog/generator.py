"""Deterministic synthetic change log — the binlog stand-in.

Produces the envelope stream of FIXTURES.md §2: row-change events over the
tokenized-sequence table ``docs(doc_id, tokens:array<int32>, n_tok,
source)``, with GTID-style identity (server_uuid, gno), transaction ids,
a strictly-increasing global ``seq`` (the flattened (binlogFile, logPos)
total order of the reference, LogPosition.java:38-44), and the failure
scenarios the reference exhibits:

- **retransmit**: a duplicated suffix of events re-emitted with the same
  ``seq`` — models the duplicate tail after leader failover
  (doc/binlake-arc.md:27: position never lost, some duplicates appear).
- **hot keys**: a configurable fraction of updates concentrated on a few
  doc_ids — the skew case the salted compaction path must absorb.
- **out-of-order within files**: rows are shuffled inside small windows so
  physical file order ≠ ``seq`` order; only the logical order is trusted.
- **evolution**: from a given seq on, ``schema_ver`` bumps and a new column
  rides in the ``extra`` map until the engine promotes it
  (add-column-only rule, BinlogWorker.java:1079).
- **tokens as binary payload**: each event also carries the token array as
  a little-endian int32 byte blob (``payload``), exercising the
  Arrow-vectorized binlog-decode path (RowsLogBuffer analog).

Everything is seeded; the same (spec, seed) always yields byte-identical
output.  No external data.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

CHANGE_LOG_SCHEMA = (
    "seq long, server_uuid string, gno long, trx_id long, ts timestamp,"
    " op string, doc_id string, tokens array<int>, n_tok int, source string,"
    " payload binary, before_payload binary, schema_ver int,"
    " extra map<string,string>, epoch_hint int"
)

_ARROW_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("server_uuid", pa.string()),
        ("gno", pa.int64()),
        ("trx_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("op", pa.string()),
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("payload", pa.binary()),
        ("before_payload", pa.binary()),
        ("schema_ver", pa.int32()),
        ("extra", pa.map_(pa.string(), pa.string())),
        ("epoch_hint", pa.int32()),
    ]
)

SOURCES = ["web", "books", "code", "wiki"]
LANGS = ["en", "zh", "de", "fr"]
VOCAB = 50257


@dataclass
class GenSpec:
    n_docs: int = 200
    n_events: int = 2000
    seed: int = 42
    n_servers: int = 2
    events_per_epoch: int = 500
    max_tokens: int = 64
    # scenario knobs (FIXTURES.md §2 scenarios 1-6)
    retransmit_frac: float = 0.0   # duplicate this tail fraction verbatim
    hot_keys: int = 0              # this many doc_ids absorb hot_frac of events
    hot_frac: float = 0.2
    evolution_at: int | None = None  # seq at which schema_ver→2, extra["lang"] appears
    shuffle_window: int = 50       # out-of-order window inside files
    corrupt_frac: float = 0.0      # events with n_tok != len(tokens) (validation path)
    ddl_events: bool = False       # emit a QUERY/DDL event just before evolution_at
    before_images: bool = False    # U events carry the prior row image (before_payload)


# the ALTER the DDL scenario emits: `lang` is ALSO carried by the extra map
# after evolution_at (the promote path), while `quality` arrives ONLY via
# the DDL — proving the QUERY_EVENT → add-column path does real work
DDL_STATEMENT = (
    "ALTER TABLE docs ADD COLUMN lang varchar(8), ADD COLUMN quality double"
)


def generate_change_log(spec: GenSpec = GenSpec()) -> pd.DataFrame:
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events
    seq = np.arange(1, n + 1, dtype=np.int64)

    # doc assignment: uniform, with optional hot set
    docs = rng.integers(0, spec.n_docs, size=n)
    if spec.hot_keys > 0:
        hot_mask = rng.random(n) < spec.hot_frac
        docs[hot_mask] = rng.integers(0, spec.hot_keys, size=int(hot_mask.sum()))
    doc_id = np.array([f"doc{d:06d}" for d in docs])

    # ops ~ 10:4:1 insert/update/delete (upsert semantics: I on existing is
    # an update, D on missing is a no-op — matches the LWW oracle)
    r = rng.random(n)
    op = np.where(r < 10 / 15, "I", np.where(r < 14 / 15, "U", "D"))

    # GTID identity: server by round-robin, per-server monotone gno,
    # transactions of ~3 events (XID analog, BinlogWorker.java:953-961)
    server_idx = (seq % spec.n_servers).astype(np.int64)
    server_uuid = np.array(
        [f"00000000-0000-0000-0000-{i:012d}" for i in range(spec.n_servers)]
    )[server_idx]
    gno = np.zeros(n, dtype=np.int64)
    for s in range(spec.n_servers):
        m = server_idx == s
        gno[m] = np.arange(1, int(m.sum()) + 1)
    trx_id = ((seq - 1) // 3 + 1).astype(np.int64)
    ts = pd.Timestamp("2026-01-01", tz=None) + pd.to_timedelta(seq, unit="s")

    # token payloads: log-normal lengths, vocab-bounded ids
    lengths = np.clip(
        np.exp(rng.normal(2.2, 0.8, size=n)).astype(np.int64), 1, spec.max_tokens
    )
    flat = rng.integers(0, VOCAB, size=int(lengths.sum()), dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    tokens = [flat[offsets[i] : offsets[i + 1]] for i in range(n)]
    n_tok = lengths.astype(np.int32)
    if spec.corrupt_frac > 0:
        bad = rng.random(n) < spec.corrupt_frac
        n_tok = np.where(bad, n_tok + 1, n_tok).astype(np.int32)
    payload = [t.astype("<i4").tobytes() for t in tokens]
    source = np.array(SOURCES)[rng.integers(0, len(SOURCES), size=n)]

    # schema evolution: lang appears in `extra` from evolution_at on
    schema_ver = np.ones(n, dtype=np.int32)
    extra: list[list[tuple[str, str]]] = [[] for _ in range(n)]
    if spec.evolution_at is not None:
        evolved = seq >= spec.evolution_at
        schema_ver[evolved] = 2
        langs = np.array(LANGS)[rng.integers(0, len(LANGS), size=n)]
        for i in np.flatnonzero(evolved):
            extra[i] = [("lang", str(langs[i]))]

    pdf = pd.DataFrame(
        {
            "seq": seq,
            "server_uuid": server_uuid,
            "gno": gno,
            "trx_id": trx_id,
            "ts": ts,
            "op": op,
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": n_tok,
            "source": source,
            "payload": payload,
            # positioned to match CHANGE_LOG_SCHEMA (createDataFrame's
            # Arrow path aligns pandas columns by position)
            "before_payload": None,
            "schema_ver": schema_ver,
            "extra": extra,
        }
    )

    # DDL event (QUERY_EVENT analog, SimpleDdlParser.java:55-140): replace
    # the event just before the evolution point with an additive ALTER; the
    # engine classifies it and evolves the table schema from it
    if spec.ddl_events and spec.evolution_at is not None and spec.evolution_at >= 2:
        i = int(spec.evolution_at) - 2  # row with seq == evolution_at - 1
        pdf.loc[i, "op"] = "Q"
        pdf.loc[i, "doc_id"] = ""
        pdf.at[i, "tokens"] = np.array([], dtype=np.int32)
        pdf.loc[i, "n_tok"] = 0
        pdf.at[i, "payload"] = b""
        pdf.at[i, "extra"] = [("ddl", DDL_STATEMENT)]

    # before images (the reference's UPDATE (before, after) row pairs —
    # RowsLogEvent.java:112-168, entry.proto RowData before/afterColumns
    # :75-117): each U event carries the payload of the key's previous
    # row-change event; I/D/Q events and chain heads carry NULL
    if spec.before_images:
        mask = pdf["op"] != "Q"
        prev = pdf["payload"].where(mask).groupby(pdf["doc_id"].where(mask)).shift(1)
        is_u = (pdf["op"] == "U") & prev.notna()
        pdf.loc[is_u, "before_payload"] = prev[is_u]

    # retransmit tail: verbatim duplicates appended (failover replay)
    if spec.retransmit_frac > 0:
        k = max(1, int(n * spec.retransmit_frac))
        pdf = pd.concat([pdf, pdf.tail(k)], ignore_index=True)

    # out-of-order within shuffle windows (file order ≠ seq order)
    if spec.shuffle_window > 1:
        idx = np.arange(len(pdf))
        for lo in range(0, len(pdf), spec.shuffle_window):
            w = idx[lo : lo + spec.shuffle_window]
            rng.shuffle(w)
            idx[lo : lo + len(w)] = w
        pdf = pdf.iloc[idx].reset_index(drop=True)

    pdf["epoch_hint"] = (np.arange(len(pdf)) // spec.events_per_epoch).astype(np.int32)
    return pdf


def to_spark(spark, pdf: pd.DataFrame):
    """Create a Spark DataFrame from a generated log (Arrow path).

    ``extra`` is stored as list-of-(k, v) for the pyarrow writer; Spark's
    Arrow createDataFrame wants dicts for map columns.
    """
    p = pdf.copy()
    p["extra"] = p["extra"].map(dict)
    return spark.createDataFrame(p, CHANGE_LOG_SCHEMA)


def pairwise_swapped_order(n: int) -> list[int]:
    """[1,0,3,2,...] — every adjacent pair applied wrong-way round, the
    canonical mtime-tie reordering a file stream can produce after a
    resume.  Shared by the reorder replay test and the
    ``cdc_reordered_replay`` driver oracle so both exercise the same
    contract."""
    order: list[int] = []
    for i in range(0, n - 1, 2):
        order += [i + 1, i]
    if n % 2:
        order.append(n - 1)
    return order


def write_change_log(
    pdf: pd.DataFrame, out_dir: str, row_group_size: int = 32_768
) -> list[str]:
    """Write one parquet file per epoch_hint, lexicographically ordered so a
    file streaming source replays epochs deterministically.

    Small row groups matter: Spark's scan parallelism splits files at
    row-group boundaries (spark.sql.files.maxPartitionBytes), so a single
    monolithic row group would serialize the scan + map-side combine of a
    whole epoch onto one task regardless of cluster size.

    Each file gets a STRICTLY INCREASING mtime (1 s apart, like a real
    spool filling over time): Spark's file stream orders new files by
    modification time, and files written back-to-back routinely collide
    at the FS timestamp granularity — the tie order is then
    listing-dependent, and a resume can hand epochs to the engine out of
    order.  The engine survives that (delete tombstones + per-row LWW),
    but the fixture should still present the order a live source would.
    Stamps are BACKDATED (last file ≈ now, earlier files in the past) so
    no file ever carries a future mtime.  Single-writer-per-directory is
    assumed (every caller writes a fresh dir): a SECOND call into the
    same directory would backdate its own early epochs before this
    call's files — appending to a live spool is ``spool_dump``'s job,
    whose monotone-cursor stamps do order across calls."""
    os.makedirs(out_dir, exist_ok=True)
    groups = list(pdf.groupby("epoch_hint", sort=True))
    paths = []
    now = time.time()
    for i, (ep, grp) in enumerate(groups):
        tbl = pa.Table.from_pandas(grp.reset_index(drop=True), schema=_ARROW_SCHEMA)
        p = os.path.join(out_dir, f"epoch-{int(ep):05d}.parquet")
        pq.write_table(tbl, p, row_group_size=row_group_size)
        mt = now - (len(groups) - 1 - i)
        os.utime(p, (mt, mt))
        paths.append(p)
    return paths
