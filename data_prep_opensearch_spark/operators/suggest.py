"""Suggesters: OpenSearch's `suggest` API re-expressed Spark-first.

The reference serves its corpus through OpenSearch, whose search body
accepts `suggest` sections — the term suggester ("did you mean":
per-token spelling corrections drawn from the index dictionary) and the
completion suggester (prefix -> ranked completions). This module is
that capability over the segment index:

- :func:`term_suggest` — Lucene DirectSpellChecker semantics: analyze
  the input text with the index's own tokenizer, gate each token by
  ``min_word_length`` and ``suggest_mode`` (``missing`` = only tokens
  absent from the dictionary, ``popular`` = only candidates with higher
  df than the input token, ``always``), and rank dictionary candidates
  within ``max_edits`` Levenshtein distance by the similarity score
  ``1 - dist / min(|token|, |candidate|)`` (the same FuzzyTermsEnum
  formula the fuzzy-query path boosts with) — ``sort="score"`` orders
  score desc / df desc / term asc, ``sort="frequency"`` df desc /
  score desc / term asc. ``prefix_length`` (default 1, the
  OpenSearch default) pins the first chars like the real suggester.

- :func:`completion_suggest` — prefix completions ranked by document
  frequency (the df IS the suggestion weight), capped at ``size``.

Scale: one suggest call is ONE dictionary pass however many input
tokens need correcting — the (tiny) token list broadcasts into a
cross-join filtered by the length window + pinned prefix + thresholded
built-in ``levenshtein`` (JVM, early-exit past the budget), and the
ranking window's input is bounded by candidate count, not corpus size.
The completion path is a filtered aggregate whose StringStartsWith
predicate pushes to the term-sorted parquet scan (row-group min/max
pruning keeps it a dictionary point-read). No driver collect on either
path; the dictionary never materializes in full.

Reference parity: the serving-side OpenSearch suggesters
(`search` body `suggest`) over the indexes built by
`opensearch/index_docs.py`; semantics follow the public Lucene
DirectSpellChecker / ES term & completion suggester docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T

SUGGEST_SCHEMA = T.StructType([
    T.StructField("token", T.StringType(), False),
    T.StructField("suggestion", T.StringType(), False),
    T.StructField("dist", T.IntegerType(), False),
    T.StructField("score", T.DoubleType(), False),
    T.StructField("df", T.LongType(), False),
])


def term_suggest(
    engine,
    text: str,
    size: int = 5,
    max_edits: int = 2,
    prefix_length: int = 1,
    min_word_length: int = 4,
    suggest_mode: str = "missing",
    sort: str = "score",
) -> DataFrame:
    """Spelling suggestions for every eligible token of ``text`` from
    the index dictionary of ``engine`` (a ``BM25Engine``). Returns
    (token, suggestion, dist, score, df) rows, at most ``size`` per
    token, ranked per ``sort``. The input token itself is never a
    suggestion (dist >= 1), matching the real suggester."""
    from data_prep_opensearch_spark.functions.tokenize import TOKENIZERS

    if suggest_mode not in ("missing", "popular", "always"):
        raise ValueError(f"unknown suggest_mode {suggest_mode!r}")
    if sort not in ("score", "frequency"):
        raise ValueError(f"unknown sort {sort!r}")

    engine._maybe_refresh()
    tok = TOKENIZERS[engine.meta["tokenizer"]]
    tokens = sorted({t for t in tok(text or "") if len(t) >= min_word_length})
    if suggest_mode in ("missing", "popular"):
        df_map = engine.resolve_df(tokens)
        if suggest_mode == "missing":
            tokens = [t for t in tokens if df_map.get(t, 0) == 0]
    if not tokens:
        return engine.spark.createDataFrame([], SUGGEST_SCHEMA)

    toks = engine.spark.createDataFrame(
        [(t, int(df_map.get(t, 0)) if suggest_mode == "popular" else 0)
         for t in tokens],
        "token string, token_df long",
    )
    # global dictionary: per-term df summed across shards; select first
    # so the scan reads only the two dictionary columns, never postings
    dic = (
        engine.seg.select("term", "df")
        .groupBy("term").agg(F.sum("df").alias("df"))
    )
    cand = dic.crossJoin(F.broadcast(toks)).filter(
        F.length("term").between(
            F.length("token") - max_edits, F.length("token") + max_edits
        )
    )
    if prefix_length > 0:
        cand = cand.filter(
            F.expr(f"startswith(term, substring(token, 1, {prefix_length}))")
        )
    cand = cand.withColumn(
        "dist", F.levenshtein(F.col("term"), F.col("token"), max_edits)
    ).filter(F.col("dist") >= 1)
    score = 1.0 - F.col("dist") / F.least(
        F.length("term"), F.length("token")
    )
    cand = cand.withColumn("score", score).filter(F.col("score") > 0)
    if suggest_mode == "popular":
        cand = cand.filter(F.col("df") > F.col("token_df"))
    order = (
        [F.desc("score"), F.desc("df"), F.asc("term")]
        if sort == "score"
        else [F.desc("df"), F.desc("score"), F.asc("term")]
    )
    w = Window.partitionBy("token").orderBy(*order)
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= size)
        .select(
            "token",
            F.col("term").alias("suggestion"),
            F.col("dist").cast("int").alias("dist"),
            F.col("score").cast("double").alias("score"),
            F.col("df").cast("long").alias("df"),
        )
    )


def completion_suggest(engine, prefix: str, size: int = 10) -> DataFrame:
    """Prefix completions from the index dictionary, weight = global df
    (desc, term asc ties), capped at ``size``. Declarative filtered
    aggregate — StringStartsWith pushes to the term-sorted parquet scan,
    so this stays a point-read at any corpus size."""
    engine._maybe_refresh()
    return (
        engine.seg.select("term", "df")
        .filter(F.col("term").startswith(prefix))
        .groupBy("term").agg(F.sum("df").cast("long").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(size)
        .select(F.col("term").alias("suggestion"), "df")
    )
