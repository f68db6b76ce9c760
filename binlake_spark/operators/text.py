"""Text analysis operators (library form of the driver queries).

All JVM built-ins — the whole family stays inside whole-stage codegen;
a BPE-ish regex tokenizer is the only place a regex runs per row, and it
compiles once JVM-side (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": [" the ", " and ", " of ", " to "],
    "de": [" der ", " und ", " die ", " das "],
    "fr": [" le ", " et ", " la ", " les "],
}

# GPT-2-style pretokenizer shape: optional space + word / number / punct run
BPE_ISH = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def occurrences(text: Column, pat: str) -> Column:
    """Count non-overlapping literal occurrences via length arithmetic."""
    return (F.length(text) - F.length(F.replace(text, F.lit(pat)))) / len(pat)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish token counts per doc."""
    return df.withColumns(
        {
            "n_ws_tokens": F.size(F.split(F.col(text_col), " ")),
            "n_bpe_tokens": F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), F.lit(0))
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals + a composite score in [0, 1]."""
    t = F.col(text_col)
    n_words = F.size(F.split(t, " "))
    avg_wl = F.length(F.replace(t, F.lit(" "))).cast("double") / n_words
    punct_ratio = (
        F.length(t) - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    ).cast("double") / F.greatest(F.length(t), F.lit(1))
    stop_ratio = sum(
        (occurrences(t, w) for w in STOPWORDS["en"]), F.lit(0.0)
    ) / F.greatest(n_words, F.lit(1))
    score = (
        F.when((avg_wl >= 3) & (avg_wl <= 10), 0.4).otherwise(0.0)
        + F.when(stop_ratio > 0.01, 0.3).otherwise(0.0)
        + F.when(punct_ratio < 0.1, 0.3).otherwise(0.0)
    )
    return df.withColumns(
        {
            "n_words": n_words,
            "avg_word_len": F.round(avg_wl, 4),
            "punct_ratio": F.round(punct_ratio, 4),
            "stopword_ratio": F.round(stop_ratio, 4),
            "quality": F.round(score, 2),
        }
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-count language ID over STOPWORDS; ties break by dict order."""
    t = F.col(text_col)
    scores = {
        lang: sum((occurrences(t, w) for w in ws), F.lit(0.0))
        for lang, ws in STOPWORDS.items()
    }
    langs = list(scores)
    best = F.greatest(*scores.values())
    pred = F.when(scores[langs[0]] == best, langs[0])
    for lang in langs[1:]:
        pred = pred.when(scores[lang] == best, lang)
    out = df.withColumn("predicted_lang", pred)
    for lang in langs:
        out = out.withColumn(f"score_{lang}", scores[lang].cast("long"))
    return out


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit content fingerprints: xxhash64 (fast) + md5-prefix (portable
    across engines, used by the DuckDB oracles)."""
    return df.withColumns(
        {
            "fp_xxh": F.xxhash64(F.col(text_col)),
            "fp_md5": F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10).cast(
                "long"
            ),
        }
    )


def repetition_score(
    df: DataFrame,
    text_col: str = "text",
    ngram: int = 3,
) -> DataFrame:
    """Intra-document repetition (the Gopher/RefinedWeb quality rule the
    inter-document dedup family can't see): per doc,

    - ``dup_word_pml`` — ‰ of word occurrences beyond each word's first
      (1000·(n_words − n_distinct_words) DIV n_words), and
    - ``dup_ngram_pml`` — same for word-``ngram`` occurrences, the
      boilerplate/loop-generation signal.

    Integer ‰ arithmetic (DIV) so two engines agree exactly.  Pure JVM:
    split + transform + array_distinct per row — no explode, no shuffle,
    no Python; cost ∝ tokens, embarrassingly parallel at any scale."""
    w = f"split({text_col}, ' ')"
    # guard the short-doc case: sequence(1, 0) is a DESCENDING range in
    # Spark and its i=0 slice throws (same trap as contamination's gram
    # explode) — a doc shorter than the n-gram has zero n-grams
    g = (
        f"CASE WHEN size({w}) >= {ngram}"
        f" THEN transform(sequence(1, size({w}) - {ngram} + 1),"
        f"      i -> concat_ws(' ', slice({w}, i, {ngram})))"
        f" ELSE CAST(array() AS array<string>) END"
    )
    # BIGINT ‰ via DIV (floor division, exact past 2^53 and identical to
    # DuckDB's //) — never double division
    dup_w = (
        f"CASE WHEN size({w}) > 0 THEN CAST(size({w}) - size(array_distinct({w}))"
        f" AS BIGINT) * 1000 DIV size({w}) ELSE CAST(0 AS BIGINT) END"
    )
    dup_g = (
        f"CASE WHEN size({g}) > 0 THEN CAST(size({g}) - size(array_distinct({g}))"
        f" AS BIGINT) * 1000 DIV size({g}) ELSE CAST(0 AS BIGINT) END"
    )
    return df.withColumns(
        {"dup_word_pml": F.expr(dup_w), "dup_ngram_pml": F.expr(dup_g)}
    )


# PII patterns — shared by the operator and its DuckDB oracle, so they
# are restricted to syntax Java regex (Spark) and RE2 (DuckDB) parse
# IDENTICALLY: character classes, bounded repetition, \d, \b, literal
# escapes; no backreferences, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d[\d-]{7,}\d"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction (the C4/The-Pile/RefinedWeb release-hygiene pass —
    a training-data engine that can't strip emails/IPs/phones before
    publishing shards is incomplete): replaces emails, IPv4 addresses
    and international phone numbers with ``<EMAIL>``/``<IP>``/``<PHONE>``
    and reports per-category match counts.

    Scrub order matters and is fixed: emails first (an address can
    embed digit runs a later pass would misread), then phones (the
    ``+``-prefixed digit/dash run would otherwise be cut by the IP
    pass), then IPs.  Counts are taken BEFORE any replacement, each
    against the original text, so they are order-independent.

    Pure JVM ``regexp_count``/``regexp_replace`` — patterns compile
    once per task, no Python, no shuffle; cost ∝ bytes, embarrassingly
    parallel at any scale."""
    t = F.col(text_col)
    out = df.withColumns(
        {
            "n_email": F.regexp_count(t, F.lit(PII_EMAIL)).cast("long"),
            "n_phone": F.regexp_count(t, F.lit(PII_PHONE)).cast("long"),
            "n_ip": F.regexp_count(t, F.lit(PII_IPV4)).cast("long"),
        }
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
        ),
        PII_IPV4,
        "<IP>",
    )
    return out.withColumn("scrubbed", scrubbed)
