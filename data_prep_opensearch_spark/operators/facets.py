"""Faceted search: OpenSearch-style aggregations over a query's FULL
match set (not the hits page).

The reference's serving side is an OpenSearch index whose search API
pairs every query with `aggregations` (terms buckets, histograms); this
module is that capability on the Spark engine: ``BM25Engine.match_ids``
yields every matching docID (distributed, one row per match), the
caller joins its attribute table, and :func:`facet_counts` turns any
set of columns/expressions into ranked (facet, value, n_docs) buckets.

Semantics (OpenSearch terms aggregation):
- one bucket per distinct value, counting matching DOCS,
- top ``size`` buckets per facet by count desc (ties value asc — our
  deterministic refinement of ES's undefined tie order),
- NULL values are skipped (ES `missing` docs drop out unless mapped).

Scale: the whole pipeline is match-emit → hash aggregate → per-facet
top-``size`` window; the explode multiplies rows by len(facets) (a
handful), counts combine map-side, and the window input is one row per
(facet, value) — bounded by facet cardinality, not corpus size. No
driver collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def facet_counts(
    df: DataFrame,
    facets: dict[str, Column | str],
    size: int = 10,
) -> DataFrame:
    """(facet, value, n_docs) buckets over ``df`` — one input row per
    matching doc. ``facets`` maps facet name -> column (or expression;
    numeric expressions make range/histogram facets: pass e.g.
    ``(F.floor(F.col("n_chars") / 256) * 256)`` for fixed-width bins).
    Values are cast to string (one tidy output schema for all facets).
    """
    entries = [
        F.struct(
            F.lit(name).alias("facet"),
            (F.col(c) if isinstance(c, str) else c)
            .cast("string").alias("value"),
        )
        for name, c in sorted(facets.items())
    ]
    ex = (
        df.select(F.explode(F.array(*entries)).alias("fv"))
        .select("fv.facet", "fv.value")
        .filter(F.col("value").isNotNull())
    )
    counts = ex.groupBy("facet", "value").agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("facet").orderBy(
        F.desc("n_docs"), F.asc("value")
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= size)
        .drop("_rn")
    )


def stats_counts(df: DataFrame, fields: list[str]) -> DataFrame:
    """OpenSearch ``stats`` aggregation (plus the exact interpolated
    median) per numeric field over the match set: one row per field
    with (n_docs, min_v, max_v, sum_v, avg_v, p50). All map-side
    combinable except the exact percentile, whose input is the match
    set's single column — still one aggregation, no collect."""
    parts = [
        df.agg(
            F.count(c).alias("n_docs"),
            F.min(c).cast("double").alias("min_v"),
            F.max(c).cast("double").alias("max_v"),
            F.sum(c).cast("double").alias("sum_v"),
            F.avg(c).alias("avg_v"),
            F.expr(f"percentile({c}, 0.5)").alias("p50"),
        ).select(F.lit(c).alias("field"), "*")
        for c in sorted(fields)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def search_facets(
    spark,
    index_dir: str,
    query: str,
    attrs: DataFrame,
    facets: dict[str, Column | str],
    size: int = 10,
    min_should_match: int | str | None = None,
    max_expansions: int | None = None,
) -> DataFrame:
    """One-call search-with-aggregations: match the boolean ``query``
    against the segment index, join the (docID-keyed) attribute table,
    and bucket-count ``facets``. ``attrs`` must carry ``doc_id`` in
    ENGINE docID space (map external ids through the doc_stats table
    first if needed — see plans.queries ft_search_facets)."""
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    eng = BM25Engine(spark, index_dir, cache=True)
    matches = eng.match_ids(query, min_should_match=min_should_match,
                            max_expansions=max_expansions)
    return facet_counts(matches.join(attrs, "doc_id"), facets, size)


def significant_terms(
    engine,
    query: str,
    docs: DataFrame,
    text_col: str = "text",
    size: int = 10,
    min_doc_count: int = 3,
    min_should_match=None,
) -> DataFrame:
    """OpenSearch significant_terms/significant_text aggregation: terms
    whose frequency in the query's match set (foreground) departs most
    from their corpus frequency (background), scored with JLH — ES's
    default significance heuristic:

        score = (fg% - bg%) * (fg% / bg%)   where fg% = fg_df / fg_n

    Foreground doc frequencies come from RE-ANALYZING only the MATCHED
    docs (``significant_text`` semantics — we store no term vectors,
    the same rationale as the highlighter/MLT), so the tokenize cost is
    bounded by the match set, never the corpus. Background frequencies
    are the index DICTIONARY dfs (one filtered two-column aggregate —
    the postings are never read), and the background doc count is the
    index's n_docs, exactly the index-wide statistics OpenSearch uses.
    Buckets keep fg_df >= ``min_doc_count`` (ES default 3) and fg% >
    bg% (JLH is meaningless for under-represented terms), top ``size``
    by score desc / term asc.

    ``docs`` carries (doc_id, ``text_col``) keyed by ENGINE doc_id.
    Plan shape: match-emit -> left-semi join -> per-doc distinct-token
    explode -> hash aggregate -> dictionary join -> 1-row foreground
    count broadcast -> TakeOrdered. No driver collect.
    """
    from pyspark.sql import functions as F

    from data_prep_opensearch_spark.functions.tokenize import (
        SIMPLE_TOKEN_SQL_PATTERN,
    )

    matches = engine.match_ids(query, min_should_match=min_should_match)
    bg_n = int(engine.meta["n_docs"])
    fg_docs = docs.join(matches, "doc_id", "left_semi")
    mode = engine.meta["tokenizer"]
    if mode == "simple":
        # pure-Catalyst re-analysis (JVM regex, codegen'd)
        toks = F.array_distinct(
            F.regexp_extract_all(F.lower(F.col(text_col)),
                                 F.lit(f"({SIMPLE_TOKEN_SQL_PATTERN})"), 1)
        )
    else:
        # 'code' and friends: Arrow-batched twin of the index analyzer
        import pandas as pd  # noqa: F401  (Arrow batch transport)
        from pyspark.sql import types as T
        from pyspark.sql.functions import pandas_udf

        from data_prep_opensearch_spark.functions.tokenize import TOKENIZERS

        tok_fn = TOKENIZERS[mode]

        def _tok(col):
            return col.map(lambda s: sorted(set(tok_fn(s or ""))))

        toks = pandas_udf(_tok, T.ArrayType(T.StringType()))(F.col(text_col))
    fg = (
        fg_docs.select(F.explode(toks).alias("term"))
        .groupBy("term").agg(F.count("*").alias("fg_df"))
    )
    fgn = matches.agg(F.count("*").alias("fg_n"))
    bg = (
        engine.seg.select("term", "df")
        .groupBy("term").agg(F.sum("df").alias("bg_df"))
    )
    fg_pct = F.col("fg_df") / F.col("fg_n")
    bg_pct = F.col("bg_df") / F.lit(bg_n)
    return (
        fg.join(bg, "term")
        .crossJoin(F.broadcast(fgn))
        .filter((F.col("fg_df") >= min_doc_count) & (fg_pct > bg_pct))
        .withColumn("score", (fg_pct - bg_pct) * (fg_pct / bg_pct))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(size)
        .select("term", F.col("fg_df").cast("long").alias("fg_df"),
                F.col("bg_df").cast("long").alias("bg_df"),
                F.col("score").cast("double").alias("score"))
    )


def date_histogram(
    df: DataFrame,
    ts_col: str,
    interval: str = "day",
    by: list[str] | None = None,
    metrics: dict[str, Column] | None = None,
) -> DataFrame:
    """OpenSearch ``date_histogram`` aggregation (calendar_interval):
    one bucket per ``date_trunc(interval, ts)`` — optionally crossed
    with ``by`` dimensions (the terms sub-aggregation shape) — carrying
    ``n_docs`` plus any metric sub-aggregations (ES avg/sum/min/max
    sub-aggs: pass e.g. ``{"avg_value": F.avg("value")}``). Pure
    hash aggregate: counts and metrics combine map-side; bucket
    cardinality is time-range x dims, never row count."""
    from pyspark.sql import functions as F

    if interval not in ("hour", "day", "week", "month", "quarter", "year"):
        raise ValueError(f"unsupported calendar interval {interval!r}")
    keys = [F.date_trunc(interval, F.col(ts_col)).alias("bucket")] + [
        F.col(c) for c in (by or [])
    ]
    aggs = [F.count("*").alias("n_docs")] + [
        expr.alias(name) for name, expr in sorted((metrics or {}).items())
    ]
    return df.groupBy(*keys).agg(*aggs).orderBy(
        "bucket", *[c for c in (by or [])]
    )
