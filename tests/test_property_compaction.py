"""Property-based compaction equivalence (hypothesis).

All four physical LWW strategies — agg, salted two-stage agg, joinback,
bucketed joinback with Arrow partition dedup — must produce the identical
winner set for ANY event log: random keys, random unique seqs, duplicate
retransmits, deletes, empty payloads.  This pins the algebraic claims the
scale design rests on (max is associative/commutative; partition-local
first-after-bucket-colocation == global LWW).
"""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from binlake_spark.operators.compaction import (
    compact_lww,
    compact_lww_bucketed,
    compact_lww_pandas,
)

SCHEMA = "doc_id string, seq long, op string, n_tok int"


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    n_keys = draw(st.integers(min_value=1, max_value=8))
    seqs = draw(
        st.lists(
            st.integers(min_value=1, max_value=10_000),
            min_size=n, max_size=n, unique=True,
        )
    )
    rows = []
    for i in range(n):
        k = f"k{draw(st.integers(min_value=0, max_value=n_keys - 1))}"
        op = draw(st.sampled_from(["I", "U", "D"]))
        rows.append((k, seqs[i], op, i % 7))
    # retransmit: duplicate a verbatim suffix
    dup = draw(st.integers(min_value=0, max_value=min(5, n)))
    rows.extend(rows[-dup:] if dup else [])
    return rows


def expected_winners(rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "seq", "op", "n_tok"])
    pdf = pdf.drop_duplicates()
    idx = pdf.groupby("doc_id")["seq"].idxmax()
    return {
        r.doc_id: (r.seq, r.op, r.n_tok) for r in pdf.loc[idx].itertuples()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=event_logs())
def test_all_strategies_agree(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    exp = expected_winners(rows)
    got = {}
    got["agg"] = compact_lww(df, strategy="agg")
    got["salted"] = compact_lww(df, salt=4, strategy="agg")
    got["joinback"] = compact_lww(df, strategy="joinback")
    got["joinback_nb"] = compact_lww(df, strategy="joinback", broadcast_winners=False)
    got["bucketed"] = compact_lww_bucketed(
        df, bucket_col_expr=F.pmod(F.hash("doc_id"), F.lit(4)).cast("int"),
        num_partitions=4,
    ).drop("_bucket")
    got["pandas"] = compact_lww_pandas(df)
    for name, out in got.items():
        res = {r.doc_id: (r.seq, r.op, r.n_tok) for r in out.collect()}
        assert res == exp, name


# ------------------- sequence packing (operators/tokens.py) ------------ #
@st.composite
def doc_streams(draw):
    n_sources = draw(st.integers(min_value=1, max_value=3))
    rows = []
    for s in range(n_sources):
        n_docs = draw(st.integers(min_value=1, max_value=20))
        for d in range(n_docs):
            rows.append((f"s{s}", d, draw(st.integers(min_value=0, max_value=40))))
    return rows


def _pack_reference(rows, L):
    """Independent concat-then-chunk packer: walk each source's docs in
    order, appending doc_id n_tok times to the stream, then chunk."""
    out = {}
    streams = {}
    for src, doc, n in sorted(rows):
        streams.setdefault(src, []).extend([doc] * n)
    for src, toks in streams.items():
        for w in range(0, len(toks), L):
            chunk = toks[w : w + L]
            docs = sorted(set(chunk))
            out[(src, w // L)] = (len(docs), len(chunk), docs[0], docs[-1])
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=doc_streams(), L=st.sampled_from([1, 7, 64]))
def test_pack_sequences_matches_reference(spark, rows, L):
    from binlake_spark.operators.tokens import pack_sequences

    df = spark.createDataFrame(rows, "source string, doc_id long, n_tok int")
    got = {
        (r.source, r.seq_no): (r.n_docs, r.n_tok_in_seq, r.first_doc, r.last_doc)
        for r in pack_sequences(df, seq_len=L).collect()
    }
    assert got == _pack_reference(rows, L)
