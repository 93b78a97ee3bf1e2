"""multi_match: multi-field search (OpenSearch `multi_match` /
Lucene DisjunctionMaxQuery) over per-field segment indexes.

The reference's OpenSearch mappings index several text fields per
document (title, description, content, ...) and its search side queries
them together with per-field boosts (`fields: ["title^2", "content"]`).
The Spark-first equivalent: ONE segment index per field — built from
the same (repo, path, commit) keys, so the deterministic docID
assignment (index_build.assign_doc_ids is a pure function of the keys
and n_shards, never the content) puts every field of a document at the
SAME doc_id across indexes — then a query fans out to each field's
engine and the per-field score frames combine on doc_id:

- ``best_fields`` (ES default): Lucene dis_max — the best field's
  (boosted) score wins, plus ``tie_breaker`` x the other fields'
  scores. ``tie_breaker=1.0`` degrades to most_fields, ``0.0`` is pure
  dis_max.
- ``most_fields``: the sum of the (boosted) per-field scores.

Per-field idf stays PER-FIELD (each index has its own dictionary and
avgdl) — exactly OpenSearch best_fields/most_fields semantics; the
term-centric blending of `cross_fields` is a different statistical
model and is not implemented (documented divergence).

Scale: each field engine's ``match_scores`` is one dense kernel pass;
the combine is a unionByName -> hash aggregate on doc_id (map-side
combinable) -> TakeOrdered. Adding a field adds one pass, never a
corpus-width shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MATCH_TYPES = ("best_fields", "most_fields")


def combine_field_scores(
    field_scores: dict[str, tuple[DataFrame, float]],
    k: int = 10,
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
) -> DataFrame:
    """Combine per-field (doc_id, score) frames — all in ONE shared
    docID space — into a multi_match top-k. ``field_scores`` maps field
    name -> (scores frame, boost)."""
    if match_type not in MATCH_TYPES:
        raise ValueError(f"unknown match_type {match_type!r}")
    parts = [
        df.select("doc_id", (F.col("score") * float(boost)).alias("s"))
        for df, boost in field_scores.values()
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = u.groupBy("doc_id").agg(
        F.max("s").alias("best"), F.sum("s").alias("total")
    )
    if match_type == "best_fields":
        score = F.col("best") + tie_breaker * (F.col("total") - F.col("best"))
    else:
        score = F.col("total")
    return (
        agg.withColumn("score", score.cast("double"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score")
    )


def multi_match_topk(
    engines: dict[str, tuple[object, float]],
    query: str,
    k: int = 10,
    match_type: str = "best_fields",
    tie_breaker: float = 0.0,
    min_should_match=None,
    max_expansions: int | None = None,
) -> DataFrame:
    """multi_match over per-field engines: ``engines`` maps field name
    -> (BM25Engine, boost). All engines must be built from the same
    document keys with the same n_shards (shared docID space — see
    module docstring); mismatched corpora raise."""
    metas = {f: (int(e.meta["n_shards"]), int(e.meta["n_docs"]))
             for f, (e, _) in engines.items()}
    if len(set(metas.values())) != 1:
        raise ValueError(
            f"field indexes disagree on (n_shards, n_docs): {metas} — "
            "docID spaces are not aligned")
    field_scores = {
        f: (eng.match_scores(query, min_should_match, max_expansions), boost)
        for f, (eng, boost) in engines.items()
    }
    return combine_field_scores(field_scores, k, match_type, tie_breaker)
