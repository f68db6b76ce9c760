"""Benchmark harness — one JSON line on stdout.

Measures (1) the headline metric of BASELINE.json: end-to-end change
events/sec applied through the full CDC pipeline (generate → stream →
decode → compact → COW MERGE → commit), and (2) wall seconds for the
headline analytic queries at $SPARK_GRAFT_SF_DIR.

    python bench.py                # default: sf0.1, local[$SPARK_GRAFT_CPUS]
    BINLAKE_BENCH_CPUS=8 python bench.py   # override parallelism (scaling runs)

The N-vs-4N scaling evidence (north rule) is produced by
``python scale_bench.py`` which runs the same CDC replay at local[8] and
local[32] and reports throughput + efficiency into BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# fallback 16 when no explicit core count is given: this VM's 32 vCPUs are
# hypervisor-oversubscribed and local[32] measures ~2.5x SLOWER than
# local[8] on identical input (128.5k vs 52.7k events/s, BENCH.md); 16 is
# the measured sweet spot (142.8k).  An explicit $SPARK_GRAFT_CPUS or
# $BINLAKE_BENCH_CPUS is always honored.
CPUS = int(os.environ.get("BINLAKE_BENCH_CPUS", os.environ.get("SPARK_GRAFT_CPUS", "16")))
# the VM's neighbor load makes single runs swing 2-3x on identical input
# (BENCH.md noise log) — every timed thing runs REPS times, best kept, and
# a fixed single-thread CPU probe before/after the suite marks whether the
# window was quiet (probe ~1 s quiet; >1.5x the best-known value = noisy)
QUERY_REPS = int(os.environ.get("BINLAKE_BENCH_QUERY_REPS", "2"))
CDC_REPS = int(os.environ.get("BINLAKE_BENCH_CDC_REPS", "2"))


from bench_util import cpu_probe  # noqa: E402  (shared noise probe)

HEADLINE = [
    "cdc_lww_state",
    "cdc_retransmit_dedup",
    "cdc_net_changes",
    "tpch_q1",
    "tpch_q3",
    "evt_sessionization",
    "text_quality",
    "text_langid",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "sim_topk_dot",
    "sim_ivf",
    "text_token_bpe",
    "mm_frame_sample",
    # round 3 additions (token-sequence pipeline ops) — new keys, the
    # pre-existing keys stay comparable round-over-round
    "tok_pack_sequences",
    "tok_contamination",
    "tok_dup_windows",
    "tok_bpe_pairs",
    # round 5 additions (release-hygiene passes) — new keys, ditto
    "text_pii_scrub",
    "dedup_lines",
]


def sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _cached_change_log(spec) -> tuple[str, list[str], int]:
    """Generate the deterministic change log once per spec, cache on disk.

    Generation is pure pandas on the driver and costs more wall than the
    replay itself at bench scale; since (spec, seed) fully determines the
    bytes, repeated bench/scaling runs reuse the files.  Returns
    (dir, files, n_events_including_retransmits).
    """
    import hashlib
    from dataclasses import asdict

    from binlake_spark.changelog import generate_change_log, write_change_log

    key = hashlib.sha256(json.dumps(asdict(spec), sort_keys=True).encode()).hexdigest()[
        :16
    ]
    root = os.path.join(tempfile.gettempdir(), "binlake_cl_cache", key)
    marker = os.path.join(root, "_COMPLETE")
    if os.path.exists(marker):
        with open(marker) as f:
            n = int(f.read().strip())
        files = sorted(
            os.path.join(root, p) for p in os.listdir(root) if p.endswith(".parquet")
        )
        return root, files, n
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    pdf = generate_change_log(spec)
    files = write_change_log(pdf, root)
    with open(marker, "w") as f:
        f.write(str(len(pdf)))
    return root, files, len(pdf)


def run_cdc_replay(spark, sf: float, work: str, epochs: int = 4) -> dict:
    """The headline metric: events/sec through the full exactly-once path."""
    from binlake_spark.changelog import GenSpec
    from binlake_spark.streaming import CdcEngine

    # sized so per-epoch work dominates per-epoch fixed cost (~3-4 s):
    # 500k-event epochs at sf0.1; the deterministic log is generated once
    # and disk-cached across runs
    n_events = int(
        os.environ.get("BINLAKE_BENCH_EVENTS", max(50_000, int(20_000_000 * sf)))
    )
    epochs = int(os.environ.get("BINLAKE_BENCH_EPOCHS", epochs))
    spec = GenSpec(
        n_docs=max(1_000, n_events // 25),
        n_events=n_events,
        events_per_epoch=max(1, n_events // epochs),
        retransmit_frac=0.05,
        hot_keys=5,
        hot_frac=0.1,
        evolution_at=n_events // 2,
        seed=42,
    )
    src, files, total = _cached_change_log(spec)

    # steady-state warmup: run the full pipeline once on a tiny log into a
    # throwaway table — JIT/codegen, Python workers, Arrow streams, parquet
    # readers and the broadcast path all come up before the clock starts
    # (a long-running ingest job lives in steady state; the bench should
    # measure that, not JVM cold start)
    wsrc, _, _ = _cached_change_log(
        GenSpec(n_docs=1_000, n_events=20_000, events_per_epoch=10_000,
                retransmit_frac=0.05, hot_keys=2, hot_frac=0.1,
                evolution_at=10_000, seed=7)
    )
    wtable = CdcEngine.create_table(os.path.join(work, "warmup_docs"), num_buckets=8)
    weng = CdcEngine(wtable)
    weng.run_batch_replay(spark, wsrc)
    weng.run_batch_replay(spark, wsrc)

    # size scan splits so every core has work each epoch: split ≈
    # epoch_bytes / 2·cores, clamped to [4 MiB, 128 MiB] (the local stand-in
    # for tuning maxPartitionBytes to the cluster; at 1000 executors the
    # default 128 MiB is right because epochs are TBs)
    epoch_bytes = sum(os.path.getsize(f) for f in files) / max(1, len(files))
    split = int(min(max(epoch_bytes // (2 * CPUS), 4 << 20), 128 << 20))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))

    # bucket count models the TABLE layout, not the local core count — it
    # must be identical across cluster sizes for a fair scaling comparison
    num_buckets = int(os.environ.get("BINLAKE_BENCH_BUCKETS", "32"))
    mode = os.environ.get("BINLAKE_BENCH_ENGINE_MODE", "cow")
    # best-of-CDC_REPS: one rep can catch a neighbor-load burst (documented
    # 2-3x same-input swings); each rep replays into a fresh table + ckpt
    best = None
    walls = []
    for rep in range(max(1, CDC_REPS)):
        rdir = os.path.join(work, f"rep{rep}")
        table = CdcEngine.create_table(
            os.path.join(rdir, "docs"), num_buckets=num_buckets
        )
        # salt off: max_by's map-side partial aggregation absorbs the
        # generated hot-key skew; the salted two-stage path is covered by
        # tests and kept for adversarial skew (see CdcEngine docstring)
        engine = CdcEngine(table, salt=None, mode=mode)
        t0 = time.monotonic()
        engine.run_stream(
            spark, src, os.path.join(rdir, "ckpt"), max_files_per_trigger=2
        )
        wall = time.monotonic() - t0
        walls.append(round(wall, 3))
        if best is None or wall < best["wall_sec"]:
            best = {
                "events": total,
                "wall_sec": round(wall, 3),
                "events_per_sec": round(total / wall, 1),
                "epochs": int(table.last_epoch("cdc")) + 1,
                "final_rows": table.read(spark).count(),
            }
    best["rep_walls"] = walls
    return best


def main() -> int:
    from binlake_spark.plans import EXTRA_QUERIES, QUERIES
    from binlake_spark.session import get_spark

    sf = sf_from_dir(SF_DIR)
    spark = get_spark("binlake_bench", cpus=CPUS, shuffle_partitions=CPUS)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    work = tempfile.mkdtemp(prefix="binlake_bench_")
    probe_before = cpu_probe()
    try:
        cdc = run_cdc_replay(spark, sf, work)

        queries: dict[str, float] = {}
        headline = [] if os.environ.get("BINLAKE_BENCH_MODE") == "cdc" else HEADLINE
        for name in headline:
            # HEADLINE keys stay comparable round-over-round even when a
            # near-twin was demoted out of the 50-row driver registry
            fn = QUERIES.get(name) or EXTRA_QUERIES[name]
            # best-of-QUERY_REPS per query: a single rep is uninterpretable
            # under this VM's neighbor-load bursts (round-2 verdict item #2)
            best_q = None
            for _ in range(max(1, QUERY_REPS)):
                t0 = time.monotonic()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                dt = time.monotonic() - t0
                best_q = dt if best_q is None else min(best_q, dt)
            queries[name] = round(best_q, 3)

        probe_after = cpu_probe()
        total = round(sum(queries.values()) + cdc["wall_sec"], 3)
        print(
            json.dumps(
                {
                    "metric": "cdc_replay_plus_headline_queries_wall",
                    "value": total,
                    "unit": "sec",
                    "queries": queries,
                    "sf": sf,
                    "cdc": cdc,
                    "cpus": CPUS,
                    "query_reps": QUERY_REPS,
                    "cdc_reps": CDC_REPS,
                    # noise marker: single-thread fixed CPU work, ~1.0-1.2 s
                    # on this VM when quiet; >1.5x that = neighbor load was
                    # present and wall times above are inflated
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
