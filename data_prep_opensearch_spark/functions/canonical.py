"""Canonical recursive fingerprints for nested values (SURVEY.md §2 F7/F8).

Reference semantics (reimplemented, not copied):
  - ``sha256_obj`` (stages/downloader/utils.py:106-110): hash the value's
    canonical JSON — sorted keys, compact separators, unicode kept.
  - ``stable_value`` (stages/downloader/fingerprints.py:33-46): recursive
    canonicalization BEFORE hashing — strings trimmed, list elements
    canonicalized then empties (null/"") dropped and the rest sorted
    case-insensitively, dict keys stringified.

Spark mapping: ``to_json`` already gives compact separators and keeps
unicode; key ORDER is struct-field / map-entry order, so canonical form
is achieved STRUCTURALLY — rebuild every struct with fields sorted by
name, every map with keys sorted, every string array casefold-sorted
with empties dropped — then one ``to_json`` + ``sha2`` finishes the job.
Everything is JVM expressions (codegen'd); no UDF.

Documented deltas vs the reference (asserted equivalent by the Python
twin in tests/test_canonical.py, which mirrors THESE semantics):
  - array sorting uses ``lower()`` (ASCII case-insensitive), not full
    unicode casefold;
  - arrays of non-strings are sorted by their natural order rather than
    ``str(x).casefold()`` (numeric order is stable where Python's
    string order could interleave, e.g. [2, 10]);
  - floats keep Spark's JSON rendering (parity holds for ints/strings,
    the reference's fingerprint field types).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T


def _canon_sort_strings(arr: Column) -> Column:
    """Drop null/blank elements, then sort case-insensitively (ties broken
    by the raw value so the order is total and deterministic)."""
    kept = F.filter(arr, lambda x: x.isNotNull() & (F.trim(x) != ""))
    return F.array_sort(
        kept,
        lambda l, r: F.when(F.lower(l) < F.lower(r), F.lit(-1))
        .when(F.lower(l) > F.lower(r), F.lit(1))
        .when(l < r, F.lit(-1))
        .when(l > r, F.lit(1))
        .otherwise(F.lit(0)),
    )


def canonicalize(col: Column, dtype: T.DataType, drop_fields: tuple[str, ...] = ()) -> Column:
    """Rebuild ``col`` (of Spark type ``dtype``) in canonical shape:
    struct fields sorted by name (minus ``drop_fields``, applied at every
    struct level), map keys sorted, string arrays casefold-sorted with
    empties dropped, strings trimmed. Nulls stay null."""
    if isinstance(dtype, T.StructType):
        names = sorted(
            f.name for f in dtype.fields if f.name not in drop_fields
        )
        by_name = {f.name: f for f in dtype.fields}
        rebuilt = F.struct(*[
            canonicalize(col[n], by_name[n].dataType, drop_fields).alias(n)
            for n in names
        ])
        return F.when(col.isNull(), F.lit(None)).otherwise(rebuilt)
    if isinstance(dtype, T.MapType):
        ks = F.array_sort(F.map_keys(col))
        rebuilt = F.map_from_arrays(
            ks,
            F.transform(
                ks,
                lambda k: canonicalize(
                    F.element_at(col, k), dtype.valueType, drop_fields
                ),
            ),
        )
        return F.when(col.isNull(), F.lit(None)).otherwise(rebuilt)
    if isinstance(dtype, T.ArrayType):
        inner = F.transform(
            col, lambda x: canonicalize(x, dtype.elementType, drop_fields)
        )
        if isinstance(dtype.elementType, T.StringType):
            return _canon_sort_strings(inner)
        return F.array_sort(inner)
    if isinstance(dtype, T.StringType):
        return F.trim(col)
    return col


def sha256_obj_col(
    col: Column, dtype: T.DataType, drop_fields: tuple[str, ...] = ()
) -> Column:
    """sha256 hex of the value's canonical JSON — the Spark twin of the
    reference's ``sha256_obj(stable_value(...))`` composition. A null
    value hashes JSON ``null`` (to_json of null returns null; pinned)."""
    js = F.to_json(canonicalize(col, dtype, drop_fields))
    return F.sha2(F.coalesce(js, F.lit("null")), 256)
