"""Corpus-prep operators: the reference's incremental-computation
semantics re-expressed as declarative Spark plans (SURVEY.md §2.10).

  - change_classification: the CDC full-outer join (new / updated /
    unchanged / removed) — stages/downloader/prepare.py:409-437 +
    stages/downloader/service.py:279-296
  - carry_forward: coalesce(cur, prev) after the left join —
    stages/enricher/core.py:44-84
  - skip_unchanged: fingerprint-gated anti-join work pruning —
    stages/enricher/utils.py:1152-1172 (the resume primitive)
  - eligibility / deferral when-chains — api/mysql_store.py:801-865
    (the skew-router analogue)
  - counters: exhaustive per-run stats — stages/downloader/service.py:285-296
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def change_classification(
    prev: DataFrame, cur: DataFrame, key: str, fp_col: str
) -> DataFrame:
    """Full-outer join prev⋈cur on key with fingerprint comparison ->
    change_kind ∈ {new, updated, unchanged, removed}."""
    p = prev.select(F.col(key), F.col(fp_col).alias("_prev_fp"))
    c = cur.select(F.col(key), F.col(fp_col).alias("_cur_fp"))
    joined = p.join(c, key, "full_outer")
    return joined.select(
        F.col(key),
        F.when(F.col("_prev_fp").isNull(), F.lit("new"))
        .when(F.col("_cur_fp").isNull(), F.lit("removed"))
        .when(F.col("_prev_fp") == F.col("_cur_fp"), F.lit("unchanged"))
        .otherwise(F.lit("updated"))
        .alias("change_kind"),
    )


def carry_forward(
    cur: DataFrame, prev: DataFrame, key: str, value_cols: list[str]
) -> DataFrame:
    """Left-join prev and coalesce(cur.value, prev.value) per column —
    prior enrichment survives unless the current run recomputed it."""
    p = prev.select(
        F.col(key), *[F.col(c).alias(f"_prev_{c}") for c in value_cols]
    )
    out = cur.join(p, key, "left")
    for c in value_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"_prev_{c}"))).drop(f"_prev_{c}")
    return out


def skip_unchanged(
    work: DataFrame, done: DataFrame, key: str, fp_col: str
) -> DataFrame:
    """Anti-join work pruning: drop rows whose (key, fp) already completed.
    THE incremental-build primitive — only changed inputs re-process."""
    d = done.select(key, fp_col)
    return work.join(d, [key, fp_col], "left_anti")


def eligibility_flags(
    df: DataFrame,
    size_col: str = "n_chars",
    text_cap: int = 500,
    defer_cap: int = 400,
) -> DataFrame:
    """(eligible, reason, deferred) when-chains — the reference's
    processing_eligible / is_deferred classification shrunk to the
    documents-table scale. Deferred = too big for the fast path but still
    eligible (the weekly-deferred-run semantics)."""
    return df.select(
        "doc_id",
        F.when(F.col(size_col) > text_cap, F.lit(0)).otherwise(F.lit(1)).alias("eligible"),
        F.when(F.col(size_col) > text_cap, F.lit("text_too_large"))
        .otherwise(F.lit("")).alias("reason"),
        F.when(
            (F.col(size_col) > defer_cap) & (F.col(size_col) <= text_cap), F.lit(1)
        ).otherwise(F.lit(0)).alias("deferred"),
    )


def run_counters(classified: DataFrame) -> DataFrame:
    """Exhaustive run counters from a change-classified frame: one row,
    conditional sums (emitted + dropped == seen reconciliation is a test)."""
    return classified.agg(
        F.count("*").alias("seen"),
        F.sum(F.when(F.col("change_kind") == "new", 1).otherwise(0)).alias("new"),
        F.sum(F.when(F.col("change_kind") == "updated", 1).otherwise(0)).alias("updated"),
        F.sum(F.when(F.col("change_kind") == "unchanged", 1).otherwise(0)).alias("unchanged"),
        F.sum(F.when(F.col("change_kind") == "removed", 1).otherwise(0)).alias("removed"),
    )
