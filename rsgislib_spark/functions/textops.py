"""Text-analysis operators for training-data pipelines over ``documents``.

All pure Catalyst column expressions (JVM-side, codegen'd) — no Python in
the hot path. Each has an ANSI-SQL equivalent (used by the DuckDB oracle
in the driver's correctness gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# small fixed stopword lists per candidate language for the n-gram/stopword
# language-ID heuristic (classic public approach: argmax of stopword hits)
LANG_MARKERS = {
    "en": "(?:the|and|of|to|in)",
    "es": "(?:el|la|de|que|y)",
    "de": "(?:der|die|und|das|ist)",
}

STOPWORDS_EN = "(?:the|a|an|and|or|of|to|in|is|it)"


def token_count(text: Column) -> Column:
    """Whitespace tokens, empty-safe: filter('' != x) over split."""
    return F.size(F.filter(F.split(text, " "), lambda x: x != F.lit("")))


def punct_ratio(text: Column) -> Column:
    """punctuation chars / total chars (0 for empty strings)."""
    total = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return F.when(total > 0, punct.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def stopword_count(text: Column, pattern: str = STOPWORDS_EN) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(rf"\b{pattern}\b"), F.lit(0)))


def quality_score_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """length/punct/stopword quality features (public heuristics family:
    Gopher/C4-style quality rules)."""
    t = F.col(text_col)
    n_tok = token_count(t)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_chars_m", F.length(t))
        .withColumn("punct_ratio", F.round(punct_ratio(t), 6))
        .withColumn("stopword_cnt", stopword_count(t))
        .withColumn(
            "mean_tok_len",
            F.round(
                F.when(n_tok > 0, F.length(F.regexp_replace(t, r"\s+", "")).cast("double") / n_tok)
                .otherwise(F.lit(0.0)),
                6,
            ),
        )
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: argmax of per-language marker hits, ties →
    lexicographically smallest language code, no hits → 'und'."""
    t = F.lower(F.col(text_col))
    hits = [
        F.size(F.regexp_extract_all(t, F.lit(rf"\b{pat}\b"), F.lit(0))).alias(f"hits_{lang}")
        for lang, pat in sorted(LANG_MARKERS.items())
    ]
    out = df.select("*", *hits)
    best = None
    langs = sorted(LANG_MARKERS)
    # deterministic argmax: strictly-greater beats, ties keep earlier (sorted) lang
    pred = F.lit("und")
    best_hits = F.lit(0)
    for lang in langs:
        h = F.col(f"hits_{lang}")
        pred = F.when(h > best_hits, F.lit(lang)).otherwise(pred)
        best_hits = F.when(h > best_hits, h).otherwise(best_hits)
    return out.withColumn("pred_lang", pred)


def fingerprint(text: Column) -> Column:
    """Normalized document fingerprint: lower → collapse whitespace →
    strip punctuation → md5 (identical ANSI construction on oracle side)."""
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(text), r"[.,;:!?]", ""), r"\s+", " "
    )
    return F.md5(F.trim(norm))


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021
    §A1.1 repetition filters; beyond the reference — training-data
    quality family): duplicate-word fraction and the fraction of the
    document covered by its most frequent word bigram (ties resolved
    lexicographically).

    Plan: split → posexplode → windowed LEAD bigram → two per-doc
    aggregations. Everything is JVM-side Catalyst; the only shuffles are
    on the document id, and the per-doc state is O(distinct bigrams).
    """
    from pyspark.sql import Window as W

    words = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w")
    )
    base = words.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.countDistinct("w").alias("n_distinct"),
    )
    lead = words.withColumn(
        "w2", F.lead("w").over(W.partitionBy(id_col).orderBy("pos"))
    ).filter(F.col("w2").isNotNull())
    big = lead.groupBy(id_col, "w", "w2").agg(F.count("*").alias("n"))
    top = (
        big.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy(id_col).orderBy(F.desc("n"), F.asc("w"), F.asc("w2"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("n").alias("top_bigram_n"))
    )
    return (
        base.join(top, id_col)
        .select(
            id_col,
            "n_words",
            "n_distinct",
            F.round(1.0 - F.col("n_distinct") / F.col("n_words"), 6).alias("dup_word_frac"),
            "top_bigram_n",
            F.round(F.col("top_bigram_n") / (F.col("n_words") - 1), 6).alias("top_bigram_frac"),
        )
    )


# Conservative RE2/Java-common regex subset: character classes, +, {n},
# no backreferences/lookaround — identical semantics in Spark (Java
# regex) and DuckDB (RE2), so oracles can scrub byte-identically.
PII_EMAIL = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
PII_PHONE = "[0-9]{3}-[0-9]{4}"


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    email_pattern: str = PII_EMAIL,
    phone_pattern: str = PII_PHONE,
) -> DataFrame:
    """PII redaction pass (the standard pre-training scrub stage):
    counts and replaces email-like and phone-like substrings with
    <EMAIL> / <TEL> placeholders. Pure Catalyst (regexp_extract_all +
    regexp_replace inside whole-stage codegen — zero Python, rides the
    scan at 100 TB). Patterns are restricted to the RE2/Java-common
    subset above so a SQL oracle reproduces the scrub byte-for-byte.
    Adds n_emails, n_phones, and the scrubbed text column.

    The email scrub is built ONCE (an intermediate column) and both the
    phone count and the final scrub read it — no re-stated regex to
    drift out of sync with the count, and one fewer full-text regex
    pass per row if codegen doesn't CSE the duplicate trees."""
    pat = lambda p: F.lit(p)  # noqa: E731 — DSL regexp args are Columns
    emails = F.regexp_extract_all(F.col(text_col), pat(email_pattern), F.lit(0))
    return (
        df.withColumn("n_emails", F.size(emails).cast("long"))
        .withColumn("_scrub1", F.regexp_replace(F.col(text_col), email_pattern, "<EMAIL>"))
        .withColumn(
            "n_phones",
            F.size(F.regexp_extract_all(F.col("_scrub1"), pat(phone_pattern), F.lit(0))).cast("long"),
        )
        .withColumn("scrubbed", F.regexp_replace(F.col("_scrub1"), phone_pattern, "<TEL>"))
        .drop("_scrub1")
    )
