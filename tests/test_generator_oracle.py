"""M0: the generator + oracle contract (pure Python, no Spark)."""

import numpy as np
import pandas as pd

from binlake_spark.changelog import GenSpec, generate_change_log, oracle_final_state


def test_generator_deterministic():
    a = generate_change_log(GenSpec(n_docs=50, n_events=300))
    b = generate_change_log(GenSpec(n_docs=50, n_events=300))
    pd.testing.assert_frame_equal(
        a.drop(columns=["tokens"]), b.drop(columns=["tokens"])
    )
    assert all(np.array_equal(x, y) for x, y in zip(a.tokens, b.tokens))


def test_seq_unique_and_total_order():
    log = generate_change_log(GenSpec(n_docs=50, n_events=300))
    assert log.seq.is_unique
    assert set(log.op) <= {"I", "U", "D"}
    assert (log.n_tok.to_numpy() == log.tokens.map(len).to_numpy()).all()


def test_retransmit_appends_verbatim_duplicates():
    log = generate_change_log(GenSpec(n_docs=50, n_events=300, retransmit_frac=0.1))
    assert len(log) == 330
    dupes = log[log.duplicated(subset=["seq"], keep=False)]
    assert len(dupes) == 60
    # duplicates are verbatim: same doc/op per seq
    g = dupes.groupby("seq").agg(doc_n=("doc_id", "nunique"), op_n=("op", "nunique"))
    assert (g == 1).all().all()


def test_oracle_lww_semantics():
    log = generate_change_log(GenSpec(n_docs=20, n_events=200))
    final = oracle_final_state(log)
    last = log.sort_values("seq").groupby("doc_id").tail(1)
    # every live doc's tokens match its last event's tokens exactly
    last_by_doc = {r.doc_id: r for r in last.itertuples()}
    for row in final.itertuples():
        ref = last_by_doc[row.doc_id]
        assert ref.op != "D"
        assert np.array_equal(row.tokens, ref.tokens)
    # docs whose last op is D are absent
    dead = {r.doc_id for r in last.itertuples() if r.op == "D"}
    assert dead.isdisjoint(set(final.doc_id))


def test_oracle_retransmit_invariant():
    clean = generate_change_log(GenSpec(n_docs=30, n_events=400))
    dup = generate_change_log(GenSpec(n_docs=30, n_events=400, retransmit_frac=0.2))
    a, b = oracle_final_state(clean), oracle_final_state(dup)
    pd.testing.assert_frame_equal(
        a.drop(columns=["tokens"]), b.drop(columns=["tokens"])
    )


def test_payload_roundtrip():
    log = generate_change_log(GenSpec(n_docs=10, n_events=50))
    for row in log.itertuples():
        assert np.array_equal(
            np.frombuffer(row.payload, dtype="<i4"), np.asarray(row.tokens)
        )


def test_evolution_scenario():
    log = generate_change_log(GenSpec(n_docs=20, n_events=200, evolution_at=100))
    pre = log[log.seq < 100]
    post = log[log.seq >= 100]
    assert (pre.schema_ver == 1).all() and (post.schema_ver == 2).all()
    assert pre.extra.map(len).sum() == 0
    assert (post.extra.map(len) == 1).all()
    final = oracle_final_state(log)
    assert "lang" in final.columns
