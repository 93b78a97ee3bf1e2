"""Text-analysis operators for a large-scale training-data pipeline:
language ID, quality scoring, token counting, document fingerprinting.

All JVM-side column expressions (codegen'd, shuffle-free per row) except
langid's per-language stopword scoring which is a small expression tree.
Each has a matching ANSI-SQL form in plans/queries.py for the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from data_prep_opensearch_spark.functions.text import tokens_col

# tiny per-language stopword sets for the n-gram/stopword langid heuristic;
# deliberately ASCII-only so the SQL oracle matches byte-for-byte
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "por"],
}

# BPE-ish pre-tokenization regex (GPT-2-style word/number/punct splits,
# ASCII approximation — public pattern shape)
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def token_count_cols(text: Column) -> dict[str, Column]:
    """Whitespace token count + BPE-ish piece count."""
    ws = F.size(F.filter(F.split(text, r"\s+"), lambda x: x != ""))
    bpe = F.size(F.regexp_extract_all(text, F.lit(f"({BPE_ISH_PATTERN})"), 1))
    return {"ws_tokens": ws, "bpe_tokens": bpe}


def quality_score_col(text: Column) -> Column:
    """Deterministic quality heuristic in [0, 1]:
      0.25 * min(1, n_tokens/64)            (length)
      + 0.25 * alpha_ratio                  (alphabetic mass)
      + 0.25 * (1 - punct_ratio)            (not punctuation soup)
      + 0.25 * min(1, distinct_ratio * 2)   (vocabulary diversity)
    Mirrors the reference's should_summarise_text gates (token floor +
    alpha ratio, stages/improver/text_utils.py:24-35) as a graded score.
    """
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    distinct_ratio = F.when(
        n_tok > 0, F.size(F.array_distinct(toks)) / n_tok
    ).otherwise(F.lit(0.0))
    score = (
        0.25 * F.least(F.lit(1.0), n_tok / F.lit(64.0))
        + 0.25 * F.when(n_chars > 0, alpha / n_chars).otherwise(0.0)
        + 0.25 * (1.0 - F.when(n_chars > 0, punct / n_chars).otherwise(0.0))
        + 0.25 * F.least(F.lit(1.0), distinct_ratio * 2.0)
    )
    return F.round(score, 6)


def langid_scores(df: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-hit langid: per language, fraction of the doc's tokens that
    are in that language's stopword set; predicted = argmax (ties -> first
    alphabetically). Pure JVM expressions, no UDF."""
    toks = tokens_col(F.col(text))
    out = df.withColumn("_toks", toks).withColumn("_n", F.greatest(F.size("_toks"), F.lit(1)))
    for lang, words in LANG_STOPWORDS.items():
        hits = F.size(F.filter(F.col("_toks"), lambda x: x.isin(*words)))
        out = out.withColumn(f"score_{lang}", F.round(hits / F.col("_n"), 6))
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):  # first alphabetically wins ties
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred).drop("_toks", "_n")


def fingerprint_cols(text: Column) -> dict[str, Column]:
    """Document fingerprints:
      - content_fp: sha2 of the raw content — the reference's
        compute_content_fp (stages/downloader/fingerprints.py:54-55)
      - norm_fp: md5 of whitespace-normalized lowercase content (rolling-
        hash-style near-identity under reflow)
    """
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return {
        "content_fp": F.sha2(text, 256),
        "norm_fp": F.md5(norm),
    }
