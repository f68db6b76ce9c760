"""LWW compaction: plain vs salted vs pandas — all must agree."""

import numpy as np

from binlake_spark.changelog import GenSpec, generate_change_log
from binlake_spark.changelog.generator import CHANGE_LOG_SCHEMA, to_spark
from binlake_spark.operators.compaction import compact_lww, compact_lww_pandas


def _df(spark, spec):
    return to_spark(spark, generate_change_log(spec))


def _winners(rows):
    return {r.doc_id: (r.seq, r.op, tuple(r.tokens or [])) for r in rows}


def test_one_row_per_key_and_max_seq(spark):
    df = _df(spark, GenSpec(n_docs=30, n_events=500))
    out = compact_lww(df).collect()
    assert len(out) == len({r.doc_id for r in out})
    expect = {
        r.doc_id: r.mx for r in df.groupBy("doc_id").agg(
            __import__("pyspark.sql.functions", fromlist=["max"]).max("seq").alias("mx")
        ).collect()
    }
    for r in out:
        assert r.seq == expect[r.doc_id]


def test_salted_two_stage_identical(spark):
    df = _df(spark, GenSpec(n_docs=10, n_events=800, hot_keys=2, hot_frac=0.5))
    plain = _winners(compact_lww(df).collect())
    salted = _winners(compact_lww(df, salt=8).collect())
    assert plain == salted


def test_pandas_variant_identical(spark):
    df = _df(spark, GenSpec(n_docs=15, n_events=300))
    plain = _winners(compact_lww(df).collect())
    pandas_ = _winners(compact_lww_pandas(df).collect())
    assert plain == pandas_


def test_retransmit_duplicates_absorbed(spark):
    df = _df(spark, GenSpec(n_docs=15, n_events=300, retransmit_frac=0.3))
    out = compact_lww(df).collect()
    assert len(out) == len({r.doc_id for r in out})


def test_decode_roundtrip(spark):
    from binlake_spark.operators.decode import decode_and_validate

    pdf = generate_change_log(GenSpec(n_docs=10, n_events=100))
    df = to_spark(spark, pdf)
    decoded = decode_and_validate(df.drop("tokens")).orderBy("seq").collect()
    assert "payload" not in decoded[0].asDict()
    src = pdf.sort_values("seq")
    for row, (_, ref) in zip(decoded, src.iterrows()):
        assert np.array_equal(np.array(row.tokens), ref.tokens), row.seq


def test_decode_drops_corrupt_rows(spark):
    from binlake_spark.operators.decode import decode_and_validate

    pdf = generate_change_log(GenSpec(n_docs=10, n_events=200, corrupt_frac=0.2))
    n_bad = int((pdf.n_tok.to_numpy() != pdf.tokens.map(len).to_numpy()).sum())
    assert n_bad > 0
    df = to_spark(spark, pdf)
    out = decode_and_validate(df.drop("tokens"))
    assert out.count() == len(pdf) - n_bad


def test_joinback_identical_to_agg(spark):
    df = _df(
        spark,
        GenSpec(n_docs=20, n_events=600, hot_keys=3, hot_frac=0.4, retransmit_frac=0.2),
    )
    agg = _winners(compact_lww(df, strategy="agg").collect())
    jb = _winners(compact_lww(df, strategy="joinback").collect())
    jb_nb = _winners(
        compact_lww(df, strategy="joinback", broadcast_winners=False).collect()
    )
    assert agg == jb == jb_nb


def test_auto_strategy_selection(spark):
    df = _df(spark, GenSpec(n_docs=10, n_events=100))
    # wide payload -> joinback plan (a join shows up); salt forces agg
    jb_plan = compact_lww(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in jb_plan
    agg_plan = compact_lww(df, salt=4)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in agg_plan


def test_bucketed_compaction_identical_winners(spark):
    from pyspark.sql import functions as F

    from binlake_spark.operators.compaction import compact_lww_bucketed

    df = _df(
        spark,
        GenSpec(n_docs=25, n_events=700, hot_keys=2, hot_frac=0.3, retransmit_frac=0.2),
    )
    plain = _winners(compact_lww(df, strategy="agg").collect())
    bexpr = F.pmod(F.hash(F.col("doc_id")), F.lit(8)).cast("int")
    bucketed = compact_lww_bucketed(
        df, bucket_col_expr=bexpr, num_partitions=8
    )
    rows = bucketed.collect()
    assert _winners(rows) == plain
    # bucket column is attached and consistent with the key hash
    for r in rows:
        assert r._bucket is not None
    # exactly one row per key even for hot keys with duplicate retransmits
    assert len(rows) == len({r.doc_id for r in rows})
