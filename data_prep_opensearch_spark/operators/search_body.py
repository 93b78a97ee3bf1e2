"""OpenSearch search-body features over the match set: bool.filter
context, sort-by-field, and function_score rescoring.

The reference's serving side is an OpenSearch search body: a `query`
(scored), an optional `filter` (non-scoring, never affects idf), an
optional `sort` (field order replaces relevance order), and optionally
a `function_score` wrapper (combine the query score with a
document-value function — field_value_factor, recency decay). This
module is those semantics over the Spark engine:

- the scored match set comes from ``BM25Engine.match_scores`` — ONE
  dense kernel pass emitting (doc_id, score) per matching doc,
  distributed, scores from index-wide statistics (OpenSearch filter
  context never changes idf, and neither does ours because scoring
  happens before the attribute join);
- attributes join on doc_id (broadcast when the attr table is small,
  shuffle-on-key otherwise — Catalyst's call);
- the final cut is an ``orderBy(...).limit(k)`` = TakeOrdered: every
  partition forwards at most k rows, no global sort materializes.

Determinism: every ordering ends with a doc_id ascending tiebreak.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: OpenSearch function_score boost_mode -> how the query score and the
#: function value combine into the final score.
BOOST_MODES = ("multiply", "sum", "replace", "max", "min", "avg")


def filtered_topk(
    engine,
    query: str,
    attrs: DataFrame,
    filter_expr: Column,
    k: int = 10,
    min_should_match: int | str | None = None,
    max_expansions: int | None = None,
) -> DataFrame:
    """bool.filter context: top-k of the scored match set restricted to
    docs whose attributes satisfy ``filter_expr``. ``attrs`` is keyed
    by ENGINE doc_id; the filter is applied to the attr side BEFORE the
    join so Catalyst pushes it into the attr scan (semi-join shape),
    and scores keep index-wide stats — ES filter-context semantics."""
    m = engine.match_scores(query, min_should_match, max_expansions)
    keep = attrs.filter(filter_expr).select("doc_id")
    return (
        m.join(keep, "doc_id", "left_semi")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def sorted_topk(
    engine,
    query: str,
    attrs: DataFrame,
    sort: list[tuple[str, bool]],
    k: int = 10,
    filter_expr: Column | None = None,
    min_should_match: int | str | None = None,
    max_expansions: int | None = None,
) -> DataFrame:
    """OpenSearch `sort` param: order the match set by document fields
    instead of relevance. ``sort`` is [(column, ascending), ...] over
    the joined (score, attrs) row — pass ``("score", False)`` anywhere
    in the list to mix relevance in (ES `_score`). Returns the top-k
    rows with doc_id, score, and the sort columns."""
    m = engine.match_scores(query, min_should_match, max_expansions)
    joined = m.join(attrs, "doc_id")
    if filter_expr is not None:
        joined = joined.filter(filter_expr)
    order = [F.asc(c) if asc else F.desc(c) for c, asc in sort]
    order.append(F.asc("doc_id"))
    keep_cols = ["doc_id", "score"] + [
        c for c, _ in sort if c not in ("doc_id", "score")
    ]
    return joined.orderBy(*order).limit(k).select(*keep_cols)


def function_score_topk(
    engine,
    query: str,
    attrs: DataFrame,
    func_expr: Column,
    k: int = 10,
    boost_mode: str = "multiply",
    min_should_match: int | str | None = None,
    max_expansions: int | None = None,
) -> DataFrame:
    """OpenSearch function_score: combine the BM25 query score with a
    per-document function value (``func_expr`` over the attr row — e.g.
    field_value_factor ``F.log1p(F.col("stars"))``) under
    ``boost_mode`` (multiply/sum/replace/max/min/avg), then re-cut the
    top-k on the COMBINED score. A doc missing from ``attrs`` drops out
    (ES: the function's field must exist unless `missing` is mapped —
    provide defaults in the attr frame to emulate `missing`). Returns
    (doc_id, score, func_value, new_score)."""
    if boost_mode not in BOOST_MODES:
        raise ValueError(f"unknown boost_mode {boost_mode!r}")
    m = engine.match_scores(query, min_should_match, max_expansions)
    joined = m.join(attrs, "doc_id").withColumn(
        "func_value", func_expr.cast("double")
    )
    s, v = F.col("score"), F.col("func_value")
    new = {
        "multiply": s * v,
        "sum": s + v,
        "replace": v,
        "max": F.greatest(s, v),
        "min": F.least(s, v),
        "avg": (s + v) / 2.0,
    }[boost_mode]
    return (
        joined.withColumn("new_score", new.cast("double"))
        .orderBy(F.desc("new_score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "func_value", "new_score")
    )


RESCORE_MODES = ("total", "multiply", "avg", "max", "min")


def rescore_topk(
    engine,
    query: str,
    rescore_query: str,
    window_size: int = 50,
    k: int = 10,
    query_weight: float = 1.0,
    rescore_weight: float = 1.0,
    score_mode: str = "total",
    min_should_match: int | str | None = None,
) -> DataFrame:
    """OpenSearch `rescore` (Lucene QueryRescorer): re-rank the cheap
    first-pass query's top ``window_size`` hits with a more expensive
    ``rescore_query`` (classically a phrase/proximity query — the full
    query language is accepted), combining

        new_score = query_weight * primary  <op>  rescore_weight * secondary

    under ``score_mode`` (total/multiply/avg/max/min — ES semantics: a
    window doc NOT matched by the rescore query keeps
    ``query_weight * primary`` untouched), then the top-k cut on the
    combined score (ties doc_id asc).

    Scale shape: the first pass is the ordinary WAND top-k; the second
    pass's kernel touches only the RESCORE query's postings and joins
    against the tiny window frame (broadcast) — the corpus is never
    rescored, exactly the point of a rescore window. Returns (doc_id,
    score, rescore_score, new_score); ``rescore_score`` is NULL for
    window docs the rescore query does not match."""
    if score_mode not in RESCORE_MODES:
        raise ValueError(f"unknown score_mode {score_mode!r}")
    win = engine.topk(query, window_size, min_should_match=min_should_match)
    sec = engine.match_scores(rescore_query).withColumnRenamed(
        "score", "rescore_score")
    j = win.join(sec, "doc_id", "left")
    p = F.col("score") * float(query_weight)
    r = F.col("rescore_score") * float(rescore_weight)
    combined = {
        "total": p + r,
        "multiply": p * r,
        "avg": (p + r) / 2.0,
        "max": F.greatest(p, r),
        "min": F.least(p, r),
    }[score_mode]
    new = F.when(F.col("rescore_score").isNotNull(), combined).otherwise(p)
    return (
        j.withColumn("new_score", new.cast("double"))
        .orderBy(F.desc("new_score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score", "rescore_score", "new_score")
    )
