"""Incremental view maintenance (IVM) over the change data feed.

A downstream consumer that keeps a GROUP-BY aggregate of the CDC table
current *without rescanning it*: each feed window's I/U/D rows become
additive deltas (+post for inserts, +post − pre for updates, −pre for
deletes — updates use the feed's ``_pre`` image, so groups that a row
*moves between* are both adjusted), merged into a persisted state table.
This is the materialized-view half of the reference's consumer story:
BinLake's MQ consumers typically maintain exactly such rollups by
re-applying row changes; here the lake itself is the transport
(LakeTable.read_changes) and the maintenance is pure DataFrame algebra.

Exactly-once without a second log: the aggregate state and the consumed
feed position publish in ONE atomic rename (state parquet written first,
then the marker JSON that names it).  A crash anywhere before the
publish leaves the previous state+position pair intact; the re-run
recomputes the identical window deterministically.  This is the same
commit pattern as LakeTable snapshots.

Scale posture: a refresh costs one change-feed read (manifest-pruned to
moved buckets) plus a shuffle sized to |changed rows| and a merge sized
to |groups| — never the table.  At 10^10 rows with thousands of groups,
state stays tiny and the window cost tracks the epoch's write rate.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binlake_spark.lake.table import LakeTable, _atomic_write_json

_KEEP_STATES = 2  # previous state retained for crash-window readers


class FeedAggregate:
    """A persisted ``GROUP BY group_cols`` rollup maintained from the
    change feed.

    ``sums`` maps output column name → SQL expression over the table's
    data columns (evaluated on both pre- and post-images); a ``n_rows``
    count column is always maintained.  Sum expressions are maintained in
    BIGINT (exact under incremental +/-); fractional rollups should scale
    to integers first (floating sums would drift across windows).  Groups whose ``n_rows`` reaches
    zero are dropped (sum-of-deltas would otherwise pin empty groups)."""

    def __init__(
        self,
        table: LakeTable,
        path: str,
        group_cols: list[str],
        sums: dict[str, str] | None = None,
    ):
        self.table = table
        self.path = path
        self.group_cols = list(group_cols)
        self.sums = dict(sums or {})
        if not self.group_cols:
            raise ValueError("group_cols must be non-empty")
        bad = set(self.sums) & ({"n_rows"} | set(self.group_cols))
        if bad:
            raise ValueError(
                f"sum names {sorted(bad)} collide with n_rows/group columns"
            )
        os.makedirs(path, exist_ok=True)
        self._marker = os.path.join(path, "CURRENT.json")

    # ------------------------------------------------------------------ #
    def _state(self) -> dict | None:
        if not os.path.exists(self._marker):
            return None
        with open(self._marker) as f:
            return json.load(f)

    def position(self) -> int | None:
        """Feed version the current state reflects (None = never built)."""
        st = self._state()
        return None if st is None else int(st["feed_version"])

    def reset(self) -> None:
        """Drop the state and position: the next refresh re-bootstraps
        from the full current table (the recovery path when the feed
        position fell behind snapshot retention)."""
        if os.path.exists(self._marker):
            os.unlink(self._marker)
        for name in os.listdir(self.path):
            if name.startswith("state.v"):
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    def read(self, spark: SparkSession) -> DataFrame:
        """The current rollup: (group_cols..., n_rows, <sums...>)."""
        st = self._state()
        if st is None:
            raise FileNotFoundError(f"no published state under {self.path}")
        return spark.read.parquet(os.path.join(self.path, st["state_dir"]))

    # ------------------------------------------------------------------ #
    def _bootstrap_contribs(self, base: DataFrame) -> DataFrame:
        """Full-table contributions for the first refresh (sign +1)."""
        sel = [F.lit(1).cast("long").alias("_d_rows")] + [
            F.col(c).alias(c) for c in self.group_cols
        ]
        for name, expr in self.sums.items():
            sel.append(
                F.coalesce(F.expr(expr).cast("long"), F.lit(0)).alias(f"_d_{name}")
            )
        return base.select(*sel)

    def _deltas(self, changes: DataFrame) -> DataFrame:
        """I/U/D feed rows → signed group contributions."""
        key = self.table.snapshot()["key_col"]
        post_cols = [F.col(c) for c in self.group_cols]
        # the merge key is top-level on both sides (and immutable per
        # row), so a per-key rollup groups on the top-level column; every
        # other group column reads its update preimage from _pre
        pre_cols = [
            F.col(c) if c == key else F.col(f"_pre.{c}") for c in self.group_cols
        ]

        def contrib(cols, sign, img):
            sel = [c.alias(g) for c, g in zip(cols, self.group_cols)]
            sel.append(F.lit(sign).cast("long").alias("_d_rows"))
            for name, expr in self.sums.items():
                e = F.expr(expr) if img == "post" else F.expr(
                    _rewrite_pre(expr, self.table)
                )
                sel.append(
                    (F.lit(sign) * F.coalesce(e.cast("long"), F.lit(0))).alias(
                        f"_d_{name}"
                    )
                )
            return sel

        post = changes.filter(F.col("_change_op").isin("I", "U")).select(
            *contrib(post_cols, 1, "post")
        )
        # D rows carry the preimage at top level; U preimages live in _pre
        dele = changes.filter(F.col("_change_op") == "D").select(
            *contrib(post_cols, -1, "post")
        )
        upd_pre = changes.filter(F.col("_change_op") == "U").select(
            *contrib(pre_cols, -1, "pre")
        )
        return post.unionByName(dele).unionByName(upd_pre)

    def _aggregate(self, contributions: DataFrame) -> DataFrame:
        aggs = [F.sum("_d_rows").alias("n_rows")] + [
            F.sum(f"_d_{name}").alias(name) for name in self.sums
        ]
        return contributions.groupBy(*self.group_cols).agg(*aggs)

    def refresh(self, spark: SparkSession) -> bool:
        """Advance the rollup by one feed window.  Returns False when
        already caught up.  First call bootstraps from the full current
        table (the feed's initial-snapshot analog)."""
        st = self._state()
        snap = self.table.snapshot()
        cur = int(snap["version"])

        if st is None:
            base = self.table.read(spark, version=cur)
            new_state = self._aggregate(self._bootstrap_contribs(base))
            self._publish(spark, new_state, state_no=0, feed_version=cur)
            return True

        pos = int(st["feed_version"])
        if cur == pos:
            return False
        try:
            changes = self.table.read_changes(
                spark, from_version=pos, to_version=cur, with_preimage=True
            )
        except FileNotFoundError as e:
            from binlake_spark.lake.feed import FeedBehindRetention

            raise FeedBehindRetention(
                f"rollup at {self.path} is committed at version {pos}, which "
                f"expire_snapshots has reclaimed: {e}. reset() to re-bootstrap "
                "from the full current table."
            ) from e
        window = self._aggregate(self._deltas(changes))
        old = self.read(spark)
        merged = (
            old.unionByName(window)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(name).alias(name) for name in self.sums],
            )
            .filter(F.col("n_rows") > 0)
        )
        self._publish(spark, merged, state_no=int(st["state_no"]) + 1, feed_version=cur)
        return True

    # ------------------------------------------------------------------ #
    def _publish(self, spark, df: DataFrame, state_no: int, feed_version: int):
        """Write the state, then atomically publish state+position as one
        marker (the snapshot commit pattern — crash before the rename
        leaves the previous pair fully intact)."""
        state_dir = f"state.v{state_no}"
        full = os.path.join(self.path, state_dir)
        if os.path.exists(full):  # crashed previous attempt: rebuild
            shutil.rmtree(full)
        df.coalesce(1).write.mode("overwrite").parquet(full)
        _atomic_write_json(
            self._marker,
            {"state_no": state_no, "state_dir": state_dir, "feed_version": feed_version},
        )
        # GC states older than the retained window
        for name in os.listdir(self.path):
            if name.startswith("state.v"):
                no = int(name.split("v", 1)[1])
                if no <= state_no - _KEEP_STATES:
                    shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)


class TokenVocabAggregate(FeedAggregate):
    """Per-token corpus statistics — document frequency and total
    occurrence count — maintained incrementally from the change feed.

    This is the tokenizer-vocabulary view of the CDC table: the histogram
    a tokenizer trainer, mixture sampler, or drift monitor reads stays
    current as the corpus mutates (doc inserts, edits, deletes) without
    ever rescanning the table.  It is the consumer-side materialized
    rollup a BinLake MQ subscriber maintains by re-applying row images
    (doc/binlake-arc.md consumer story), specialized to the token payload
    where the aggregate key lives *inside* the row's token array rather
    than in a column.

    Delta algebra per change row: every (doc, token) pair of the post
    image contributes (+1 doc, +occurrences), of the pre image
    (−1 doc, −occurrences); a doc that keeps a token across an update
    nets to zero, a token vanishing from its last doc drops out of the
    state (``n_rows`` reaches 0).  Contributions are pre-aggregated per
    (doc, token) before the global token groupBy, so the wide shuffle is
    bounded by |changed docs| × |distinct tokens per doc| — the window's
    write rate, never corpus size; state stays |vocab|-sized.

    State columns: ``tok``, ``n_rows`` (= document frequency) and
    ``n_occ`` (= total occurrences); :meth:`vocab` renames ``n_rows`` to
    ``n_docs`` for readers.  Commit/crash semantics (atomic
    state+position publish, reset/re-bootstrap) are inherited.
    """

    def __init__(self, table: LakeTable, path: str, tokens_col: str = "tokens"):
        # sums names the maintained column; both contribution hooks are
        # overridden, so the expression itself is never evaluated
        super().__init__(table, path, group_cols=["tok"], sums={"n_occ": tokens_col})
        self.tokens_col = tokens_col

    def _contribs(self, df: DataFrame, tokens, sign: int) -> DataFrame:
        key = self.table.snapshot()["key_col"]
        return _token_contribs(df, key, tokens, sign)

    def _bootstrap_contribs(self, base: DataFrame) -> DataFrame:
        return self._contribs(base, F.col(self.tokens_col), 1)

    def _deltas(self, changes: DataFrame) -> DataFrame:
        return _token_change_contribs(
            changes, self.table.snapshot()["key_col"], self.tokens_col
        )

    def vocab(self, spark: SparkSession) -> DataFrame:
        """The current vocabulary: (tok, n_docs, n_occ)."""
        return self.read(spark).select(
            "tok", F.col("n_rows").alias("n_docs"), F.col("n_occ")
        )


def _token_contribs(df: DataFrame, key_col: str, tokens, sign: int) -> DataFrame:
    """(doc, token)-pre-aggregated signed contributions of one image set:
    one output row per (doc, distinct token) with ±1 doc and
    ±occurrences — the shuffle is bounded by the images' token content,
    never the corpus."""
    per_doc = (
        df.select(F.col(key_col).alias("_k"), F.explode(tokens).alias("tok"))
        .groupBy("_k", "tok")
        .agg(F.count(F.lit(1)).alias("_occ"))
    )
    return per_doc.select(
        "tok",
        F.lit(sign).cast("long").alias("_d_rows"),
        (F.lit(sign) * F.col("_occ")).cast("long").alias("_d_n_occ"),
    )


def _token_change_contribs(
    changes: DataFrame, key_col: str, tokens_col: str
) -> DataFrame:
    """Change-feed rows → signed per-token contributions (+post for I/U,
    −pre for U/D).  D rows carry the preimage at top level; U preimages
    live in ``_pre``."""
    op = F.col("_change_op")
    t = tokens_col
    post = _token_contribs(changes.filter(op.isin("I", "U")), key_col, F.col(t), 1)
    dele = _token_contribs(changes.filter(op == "D"), key_col, F.col(t), -1)
    upd_pre = _token_contribs(
        changes.filter(op == "U"), key_col, F.col(f"_pre.{t}"), -1
    )
    return post.unionByName(dele).unionByName(upd_pre)


def token_vocab_drift(
    spark: SparkSession,
    table: LakeTable,
    from_version: int,
    to_version: int | None = None,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Net per-token histogram drift between two committed versions —
    the corpus-drift monitor a data pipeline runs between training
    snapshots ("which tokens got more/less common, which appeared or
    vanished?") — computed ONLY from the change feed, never by scanning
    either snapshot: cost ∝ changed buckets (manifest-pruned), exactly
    like a :class:`TokenVocabAggregate` refresh window.

    Returns (tok, d_docs, d_occ): the signed change in document frequency
    and occurrence count, zero-net tokens dropped.  By the IVM delta
    algebra this equals the full histogram diff hist(to) − hist(from)
    bit-exactly (driver query ``tok_vocab_drift`` proves it against an
    independent two-full-scan oracle)."""
    changes = table.read_changes(
        spark, from_version=from_version, to_version=to_version, with_preimage=True
    )
    key = table.snapshot(to_version)["key_col"]
    return (
        _token_change_contribs(changes, key, tokens_col)
        .groupBy("tok")
        .agg(
            F.sum("_d_rows").alias("d_docs"),
            F.sum("_d_n_occ").alias("d_occ"),
        )
        .filter((F.col("d_docs") != 0) | (F.col("d_occ") != 0))
    )


def _rewrite_pre(expr: str, table: LakeTable) -> str:
    """Rewrite a sum expression to read the `_pre` image: every data
    column reference becomes ``_pre.<col>``.  Token-level textual rewrite
    over the table's known column names (expressions here are simple
    arithmetic over columns; names are word-delimited)."""
    import re

    key = table.snapshot()["key_col"]  # key is top-level on both sides
    cols = sorted(
        (f.name for f in table.schema().fields if f.name != key),
        key=len,
        reverse=True,
    )
    out = expr
    for c in cols:
        out = re.sub(rf"\b{re.escape(c)}\b", f"_pre.{c}", out)
    return out


class WindowIndexAggregate(FeedAggregate):
    """The substring-dedup candidate index — per-fingerprint document
    frequency over distinct ``window``-token spans — maintained
    incrementally from the change feed.

    ``dup_token_windows`` / ``dup_doc_pairs`` (operators/tokens.py) start
    from exactly this (wh → df) map; recomputing it means re-exploding
    every token window of a 10^10-doc corpus per dedup run.  This view
    keeps it current as CDC lands: each changed document contributes ±1
    per distinct fingerprint of its post/pre image (a doc that keeps a
    span across an update nets to zero; a span vanishing from its last
    doc drops out of the state).  Refresh cost is ∝ the window's changed
    docs' token content — the write rate, never corpus size — the same
    flat-refresh regime IVM_BENCH measures for :class:`TokenVocabAggregate`.

    State: ``(wh, n_rows)`` with ``n_rows`` = document frequency;
    :meth:`dup_windows` is the df ≥ 2 duplicated-span set (the gated
    join-back side of the batch detectors), :meth:`stop_windows` the
    df > ``max_df`` drop set the pair-resolution stage anti-joins.
    Commit/crash semantics (atomic state+position publish, reset and
    re-bootstrap) are inherited from :class:`FeedAggregate`.
    """

    def __init__(
        self,
        table: LakeTable,
        path: str,
        window: int = 8,
        stride: int = 1,
        tokens_col: str = "tokens",
    ):
        super().__init__(table, path, group_cols=["wh"])
        self.window = int(window)
        self.stride = int(stride)
        self.tokens_col = tokens_col

    # ------------------------------------------------------------------ #
    def _fp_contribs(self, df: DataFrame, tokens, sign: int) -> DataFrame:
        """Distinct (doc, wh) fingerprints of one image set → signed ±1
        contributions per wh (pre-distinct per doc, so an update that
        keeps a span nets exactly zero against its preimage)."""
        from binlake_spark.operators.tokens import window_fingerprints

        key = self.table.snapshot()["key_col"]
        frame = df.select(F.col(key).alias("_k"), tokens.alias("_t"))
        fps = window_fingerprints(
            frame, self.window, self.stride, tokens_col="_t", id_col="_k"
        )
        return fps.select("wh", F.lit(sign).cast("long").alias("_d_rows"))

    def _bootstrap_contribs(self, base: DataFrame) -> DataFrame:
        return self._fp_contribs(base, F.col(self.tokens_col), 1)

    def _deltas(self, changes: DataFrame) -> DataFrame:
        op = F.col("_change_op")
        t = self.tokens_col
        post = self._fp_contribs(changes.filter(op.isin("I", "U")), F.col(t), 1)
        dele = self._fp_contribs(changes.filter(op == "D"), F.col(t), -1)
        upd_pre = self._fp_contribs(
            changes.filter(op == "U"), F.col(f"_pre.{t}"), -1
        )
        return post.unionByName(dele).unionByName(upd_pre)

    # ------------------------------------------------------------------ #
    def dup_windows(self, spark: SparkSession) -> DataFrame:
        """Duplicated-span set: (wh, n_docs) with df ≥ 2 — the candidate
        join-back side of the batch substring-dedup detectors."""
        return self.read(spark).filter(F.col("n_rows") >= 2).select(
            "wh", F.col("n_rows").alias("n_docs")
        )

    def stop_windows(self, spark: SparkSession, max_df: int = 50) -> DataFrame:
        """Boilerplate spans (df > ``max_df``) — the drop set the
        pair-resolution stage anti-joins before its self-join."""
        return self.read(spark).filter(F.col("n_rows") > int(max_df)).select("wh")
