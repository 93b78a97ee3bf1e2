"""Canonical recursive fingerprint (F7/F8): Spark expression vs a Python
twin implementing the same canonicalization (reference sha256_obj /
stable_value semantics — utils.py:106-110, fingerprints.py:33-46 — with
the deltas documented in functions/canonical.py)."""

from __future__ import annotations

import hashlib
import json

import pytest
from pyspark.sql import functions as F, types as T

from data_prep_opensearch_spark.functions.canonical import sha256_obj_col


def _py_canon(v, drop=()):
    """Python twin of canonical.canonicalize (same subset semantics)."""
    if v is None:
        return None
    if isinstance(v, str):
        return v.strip()
    if isinstance(v, dict):
        # Spark's to_json OMITS null struct fields (json.dumps would emit
        # them as null) — the twin mirrors to_json, the pinned behavior
        out = {}
        for k, val in sorted(v.items()):
            if k in drop:
                continue
            cv = _py_canon(val, drop)
            if cv is not None:
                out[k] = cv
        return out
    if isinstance(v, list):
        out = [_py_canon(x, drop) for x in v]
        if all(isinstance(x, str) or x is None for x in out):
            out = [x for x in out if x not in (None, "")]
            return sorted(out, key=lambda s: (s.lower(), s))
        return sorted(out)
    return v


def _py_fp(v, drop=()):
    s = json.dumps(
        _py_canon(v, drop), ensure_ascii=False, sort_keys=True,
        separators=(",", ":"),
    )
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("obj", T.StructType([
        T.StructField("name", T.StringType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("version", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]), True),
])


CASES = [
    (0, {"name": "alpha", "tags": ["b", "A", "c"], "version": 3,
         "meta": {"z": "1", "a": "2"}}),
    (1, {"name": "  padded  ", "tags": ["", "x", None, "X"], "version": 0,
         "meta": {}}),
    (2, {"name": "unicode-éß", "tags": ["äh", "Zz"], "version": 9,
         "meta": {"k": "v"}}),
    (3, {"name": None, "tags": None, "version": None, "meta": None}),
    (4, None),
]


def _spark_fps(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = df.select(
        "id", sha256_obj_col(F.col("obj"), SCHEMA["obj"].dataType).alias("fp")
    ).collect()
    return {r["id"]: r["fp"] for r in out}


def test_fp_matches_python_twin(spark):
    got = _spark_fps(spark, CASES)
    for i, obj in CASES:
        assert got[i] == _py_fp(obj), f"case {i}"


def test_fp_order_invariance(spark):
    """Map key order and string-array order must not move the hash."""
    a = (0, {"name": "n", "tags": ["b", "a", "C"], "version": 1,
             "meta": {"x": "1", "y": "2"}})
    b = (0, {"name": "n", "tags": ["C", "b", "a"], "version": 1,
             "meta": {"y": "2", "x": "1"}})
    assert _spark_fps(spark, [a]) == _spark_fps(spark, [b])


def test_fp_sensitive_to_content(spark):
    a = (0, {"name": "n", "tags": ["a"], "version": 1, "meta": {}})
    b = (0, {"name": "n", "tags": ["a"], "version": 2, "meta": {}})
    assert _spark_fps(spark, [a])[0] != _spark_fps(spark, [b])[0]


def test_fp_drop_fields(spark):
    """drop_fields removes a field at every struct level (the
    translations _updated_ts exclusion)."""
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("obj", T.StructType([
            T.StructField("title", T.StringType(), True),
            T.StructField("_updated_ts", T.StringType(), True),
        ]), True),
    ])
    rows_a = [(0, {"title": "t", "_updated_ts": "2024-01-01"})]
    rows_b = [(0, {"title": "t", "_updated_ts": "2099-12-31"})]

    def fp(rows):
        df = spark.createDataFrame(rows, schema)
        return df.select(sha256_obj_col(
            F.col("obj"), schema["obj"].dataType, drop_fields=("_updated_ts",)
        ).alias("fp")).collect()[0]["fp"]

    assert fp(rows_a) == fp(rows_b)
    assert fp(rows_a) == _py_fp(
        {"title": "t", "_updated_ts": "x"}, drop=("_updated_ts",)
    )


@pytest.mark.parametrize("seed", range(5))
def test_fp_property_random_objects(spark, seed):
    """Deterministic pseudo-random nested objects agree with the twin."""
    import random

    rng = random.Random(seed)
    words = ["alpha", "Beta", "GAMMA", "delta x", " pad ", "ümlaut", ""]

    def rand_obj():
        return {
            "name": rng.choice(words),
            "tags": [rng.choice(words) for _ in range(rng.randint(0, 5))]
            or None,
            "version": rng.randint(0, 99),
            "meta": {
                rng.choice("abcxyz"): rng.choice(words)
                for _ in range(rng.randint(0, 3))
            },
        }

    rows = [(i, rand_obj()) for i in range(8)]
    got = _spark_fps(spark, rows)
    for i, obj in rows:
        assert got[i] == _py_fp(obj), f"seed {seed} case {i}: {obj}"
