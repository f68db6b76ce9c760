"""IVM refresh-cost evidence: one JSON line.

Claim under test (lake/ivm.py): a TokenVocabAggregate / FeedAggregate /
WindowIndexAggregate refresh costs ∝ the epoch's changed buckets
(manifest-pruned feed window), NOT the table size.
BINLAKE_IVM_AGG=vocab (default) | winidx selects the aggregate.

Protocol: tables of 1x/4x/16x rows with bucket count scaled to keep
bucket SIZE constant (the production sizing — at 10^10 rows you grow
buckets, not bucket bytes), then one identical update epoch touching
only keys with pmod(murmur3, 512) == 0.  512 is a multiple of every
bucket count used, so those keys land in bucket 0 at ALL scales: every
epoch dirties exactly one constant-size bucket.  If the claim holds,
refresh wall stays ~flat while the table grows 16x; the from-scratch
recompute (timed for contrast) grows with the table.

    python ivm_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench_util import cpu_probe  # noqa: E402

BASE_DOCS = int(os.environ.get("BINLAKE_IVM_BASE_DOCS", "20000"))
AGG = os.environ.get("BINLAKE_IVM_AGG", "vocab")
SCALES = ((1, 32), (4, 128), (16, 512))  # (table scale, num_buckets)
REPS = int(os.environ.get("BINLAKE_IVM_REPS", "2"))


def main() -> int:
    from binlake_spark.changelog import GenSpec, generate_change_log, write_change_log
    from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA
    from binlake_spark.lake import TokenVocabAggregate, WindowIndexAggregate
    from binlake_spark.operators.tokens import window_fingerprints
    from binlake_spark.session import get_spark
    from binlake_spark.streaming import CdcEngine

    spark = get_spark("ivm_bench", cpus=8, shuffle_partitions=8)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    work = tempfile.mkdtemp(prefix="binlake_ivm_bench_")
    probe_before = cpu_probe()
    rows = []
    try:
        for scale, num_buckets in SCALES:
            n_docs = BASE_DOCS * scale
            wdir = os.path.join(work, f"s{scale}")
            # base corpus: inserts only (deterministic doc ids, so the
            # scale-1 id space is a subset of every larger scale's)
            base = generate_change_log(
                GenSpec(n_docs=n_docs, n_events=n_docs, events_per_epoch=n_docs,
                        retransmit_frac=0.0, seed=42)
            )
            write_change_log(base, f"{wdir}/base")

            # the update epoch: rows of the SMALLEST base whose key lands
            # in bucket 0 at every bucket count used (pmod(hash,512)==0)
            small_ids = base["doc_id"].unique()[: BASE_DOCS]
            ids_df = spark.createDataFrame(
                [(d,) for d in small_ids], "doc_id string"
            ).filter(F.pmod(F.hash("doc_id"), F.lit(512)) == 0)
            hot = {r.doc_id for r in ids_df.collect()}
            ep = base[base["doc_id"].isin(hot)].copy()
            ep["op"] = "U"
            ep["seq"] = ep["seq"] + int(base["seq"].max()) + 1
            write_change_log(ep, f"{wdir}/epoch")

            table = CdcEngine.create_table(f"{wdir}/docs", num_buckets=num_buckets)
            engine = CdcEngine(table)
            engine.apply_batch(
                spark.read.schema(CHANGE_LOG_SCHEMA).parquet(f"{wdir}/base"),
                epoch_id=0,
            )
            if AGG == "winidx":
                vocab = WindowIndexAggregate(table, f"{wdir}/winidx")
            else:
                vocab = TokenVocabAggregate(table, f"{wdir}/vocab")
            vocab.refresh(spark)  # bootstrap (full scan, expected ∝ table)

            engine.apply_batch(
                spark.read.schema(CHANGE_LOG_SCHEMA).parquet(f"{wdir}/epoch"),
                epoch_id=1,
            )
            dirty = table.changed_buckets(1)
            # timed: the REAL refresh (feed read + delta agg + old-state
            # merge + state write + publish).  refresh() advances exactly
            # once, so it cannot be repped — it is a single measurement;
            # the probes mark whether the window was quiet.
            t0 = time.monotonic()
            assert vocab.refresh(spark) is True
            refresh_sec = time.monotonic() - t0
            # secondary, best-of-REPS: the window's delta plan alone
            # (read_changes → per-token deltas), the part whose cost the
            # ∝-changed-buckets claim is about — NOT comparable to
            # refresh_sec, which adds the state merge + write
            best_win = None
            for _ in range(max(1, REPS)):
                changes = table.read_changes(
                    spark, from_version=1, with_preimage=True
                )
                t0 = time.monotonic()
                vocab._aggregate(vocab._deltas(changes)).write.mode(
                    "overwrite"
                ).format("noop").save()
                dt = time.monotonic() - t0
                best_win = dt if best_win is None else min(best_win, dt)

            # contrast: from-scratch recompute over the full table
            def full_plan():
                if AGG == "winidx":
                    return (
                        window_fingerprints(
                            table.read(spark).select("doc_id", "tokens")
                        )
                        .groupBy("wh")
                        .agg(F.count(F.lit(1)).alias("n_rows"))
                    )
                return (
                    table.read(spark)
                    .select("doc_id", F.explode("tokens").alias("tok"))
                    .groupBy("tok")
                    .agg(
                        F.countDistinct("doc_id").alias("n_docs"),
                        F.count("*").alias("n_occ"),
                    )
                )

            best_full = None
            for _ in range(max(1, REPS)):
                t0 = time.monotonic()
                full_plan().write.mode("overwrite").format("noop").save()
                dt = time.monotonic() - t0
                best_full = dt if best_full is None else min(best_full, dt)

            rows.append(
                {
                    "scale": scale,
                    "num_buckets": num_buckets,
                    "table_rows": int(table.read(spark).count()),
                    "epoch_events": int(len(ep)),
                    "dirty_buckets": len(dirty),
                    "refresh_sec": round(refresh_sec, 3),
                    "window_plan_sec": round(best_win, 3),
                    "full_recompute_sec": round(best_full, 3),
                }
            )
        probe_after = cpu_probe()
        r1, rn = rows[0], rows[-1]
        print(
            json.dumps(
                {
                    "metric": f"{AGG}_ivm_refresh_vs_table_size",
                    "rows": rows,
                    "refresh_growth_1x_to_16x": round(
                        rn["refresh_sec"] / r1["refresh_sec"], 2
                    ),
                    "full_growth_1x_to_16x": round(
                        rn["full_recompute_sec"] / r1["full_recompute_sec"], 2
                    ),
                    "reps": REPS,
                    "probe_sec": {"before": probe_before, "after": probe_after},
                }
            )
        )
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
