"""Nested-map translations merge (SURVEY.md §2 J6/O5 — the reference's
per-language translations block, stages/downloader/translations.py:77-123).

Data model: ``translations: MapType(lang -> struct(title, subtitle,
description, keywords, _status, _source_version, _updated_ts))`` — the
reference's full per-language block: its TRANSLATION_FIELDS tuple
(translations.py:14) plus the per-language provenance meta. ``keywords``
is an array<string>; the canonical fingerprint casefold-sorts it with
empties dropped, so a pure reorder of the same keywords does not churn
the fingerprint.

DELIBERATE DIVERGENCE from the reference (recorded per round-4 review):
the reference fingerprints the raw keywords array (sha256 of
json.dumps(sort_keys=True) preserves ELEMENT order and blank strings,
translations.py:126-137), so a reorder-only or blank-padding update
churns its fingerprint and re-propagates downstream. Here keywords are
treated as the SET they semantically are — ``_canon_sort_strings``
casefold-sorts and drops empties before hashing — so such no-op updates
hit the skip gate instead of causing write amplification. Keyword order
carries no meaning in the reference's consumers (they render the list);
if a downstream ever becomes order-sensitive, hash the raw array. The
behavior is pinned by the keywords-reorder churn case in the
rel_translations_merge oracle (plans/queries.py) and COVERAGE.md.

Semantics implemented here, matching the reference exactly:
  - merge (translations.py:118-121): per language, the entry with the
    HIGHER ``_source_version`` wins; the INCOMING entry wins ties
    (the reference skips the new doc only when the existing version is
    strictly greater). Missing versions rank lowest.
  - fingerprint (translations.py:126-137 compute_translations_fp): a
    stable content hash over the block with ``_updated_ts`` excluded at
    every level, so a pure regeneration-timestamp bump does not churn
    unchanged content.

Everything is JVM map expressions (map_zip_with / transform_values) —
codegen'd, no UDF, no shuffle beyond the caller's join.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

from data_prep_opensearch_spark.functions.canonical import sha256_obj_col

TRANS_ENTRY = T.StructType([
    T.StructField("title", T.StringType(), True),
    T.StructField("subtitle", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("keywords", T.ArrayType(T.StringType()), True),
    T.StructField("_status", T.StringType(), True),
    T.StructField("_source_version", T.LongType(), True),
    T.StructField("_updated_ts", T.StringType(), True),
])
TRANS_MAP = T.MapType(T.StringType(), TRANS_ENTRY)


def merge_translation_maps(cur: Column, inc: Column) -> Column:
    """Per-language highest-``_source_version``-wins merge of two
    lang->entry maps; the incoming side wins ties. ``map_zip_with``
    unions the key sets (missing side = null), so one expression covers
    keep / overwrite / add."""
    empty = F.map_from_arrays(
        F.array().cast(T.ArrayType(T.StringType())),
        F.array().cast(T.ArrayType(TRANS_ENTRY)),
    )
    cur = F.coalesce(cur, empty)
    inc = F.coalesce(inc, empty)
    ver = lambda e: F.coalesce(e["_source_version"], F.lit(-1).cast("long"))  # noqa: E731
    return F.map_zip_with(
        cur,
        inc,
        lambda k, a, b: F.when(b.isNull(), a)
        .when(a.isNull(), b)
        .when(ver(a) > ver(b), a)
        .otherwise(b),
    )


def translations_fp(trans: Column) -> Column:
    """Churn-immune fingerprint: canonical-JSON sha256 of the map with
    ``_updated_ts`` dropped from every entry (compute_translations_fp,
    translations.py:126-137). Identical content re-sent with a new
    timestamp produces an identical fingerprint — the skip gate the
    reference builds on this."""
    return sha256_obj_col(trans, TRANS_MAP, drop_fields=("_updated_ts",))
