"""Reliable-checkpoint knob (checkpointing.py): the iterative operators
that truncate lineage must produce IDENTICAL results whether the
materialization primitive is executor-pinned ``localCheckpoint`` (fast,
dies with an executor) or directory-backed ``checkpoint`` (survives
executor loss — the 100-TB deployment posture; the reference keeps its
resume state in ZooKeeper for the same reason,
ZkLeaderSelector.java:184-220)."""

import pytest
from pyspark.sql import functions as F

from binlake_spark.checkpointing import (
    checkpoint_mode,
    set_checkpoint_mode,
)


@pytest.fixture
def reliable(spark, tmp_path):
    set_checkpoint_mode("reliable", spark, str(tmp_path / "ckpt"))
    assert checkpoint_mode() == "reliable"
    yield
    set_checkpoint_mode("local")


def _docs(spark):
    from binlake_spark.operators.tokens import tokenize

    return tokenize(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
            "doc_id", "text"
        )
    )


def test_mode_validation(spark):
    with pytest.raises(ValueError):
        set_checkpoint_mode("bogus")
    # reliable without any checkpoint dir configured anywhere is an
    # immediate error, not a deferred runtime surprise
    jsc_dir = spark.sparkContext._jsc.sc().getCheckpointDir()
    if jsc_dir.isEmpty():
        with pytest.raises(ValueError):
            set_checkpoint_mode("reliable", spark)
    assert checkpoint_mode() == "local"


def test_dup_chain_identical_under_reliable_mode(spark, reliable):
    """dup_doc_pairs → dup_clusters → collapse_clusters under reliable
    checkpoints: same pairs, same components, same survivors."""
    from binlake_spark.operators.tokens import (
        collapse_clusters,
        dup_clusters,
        dup_doc_pairs,
    )

    d = _docs(spark)
    pairs = dup_doc_pairs(d, window=8, stride=1, min_shared=3, max_df=50)
    got_pairs = {
        (r.doc_a, r.doc_b, r.n_shared) for r in pairs.collect()
    }
    clusters = dup_clusters(pairs)
    got_clusters = {(r.doc_id, r.cluster_id) for r in clusters.collect()}
    survivors = {r.doc_id for r in collapse_clusters(d, pairs).collect()}

    set_checkpoint_mode("local")
    exp_pairs_df = dup_doc_pairs(d, window=8, stride=1, min_shared=3, max_df=50)
    exp_pairs = {
        (r.doc_a, r.doc_b, r.n_shared) for r in exp_pairs_df.collect()
    }
    exp_clusters = {
        (r.doc_id, r.cluster_id) for r in dup_clusters(exp_pairs_df).collect()
    }
    exp_survivors = {r.doc_id for r in collapse_clusters(d, exp_pairs_df).collect()}

    assert got_pairs == exp_pairs and got_pairs
    assert got_clusters == exp_clusters and got_clusters
    assert survivors == exp_survivors


def test_bpe_train_identical_under_reliable_mode(spark, reliable):
    """bpe_train's per-round checkpoints under reliable mode: the merge
    list (order, ids, counts) and the final corpus are identical."""
    from binlake_spark.operators.tokens import bpe_train

    d = _docs(spark).limit(60).select("doc_id", "tokens")
    merges_r, final_r = bpe_train(d, n_merges=5)
    rows_r = {r.doc_id: r.tokens for r in final_r.collect()}

    set_checkpoint_mode("local")
    merges_l, final_l = bpe_train(d, n_merges=5)
    rows_l = {r.doc_id: r.tokens for r in final_l.collect()}

    assert merges_r == merges_l and len(merges_r) == 5
    assert rows_r == rows_l


def test_reliable_mode_writes_to_checkpoint_dir(spark, tmp_path):
    """The reliable primitive actually lands files in the configured
    directory (i.e. the knob switches the primitive, not just a flag)."""
    import os

    from binlake_spark.checkpointing import materialize

    ckdir = tmp_path / "ck2"
    set_checkpoint_mode("reliable", spark, str(ckdir))
    try:
        df = materialize(spark.range(100).withColumn("x", F.col("id") * 2))
        assert df.count() == 100
        found = any(files for _, _, files in os.walk(ckdir))
        assert found, "no checkpoint files written under the reliable dir"
    finally:
        set_checkpoint_mode("local")
