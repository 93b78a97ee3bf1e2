"""Corpus generator: stateless determinism (same rows no matter how the
id range is chunked), schema, and planted-needle placement."""

from __future__ import annotations

import numpy as np
import pandas as pd

from data_prep_opensearch_spark.sources.corpus import (
    NEEDLE_EVERY,
    corpus_pandas,
    doc_lengths,
    generate_chunk,
    needle_token,
)


def test_chunking_invariance():
    whole = generate_chunk(np.arange(250))
    parts = pd.concat(
        [generate_chunk(np.arange(0, 90)), generate_chunk(np.arange(90, 200)),
         generate_chunk(np.arange(200, 250))],
        ignore_index=True,
    )
    assert whole.equals(parts)


def test_schema_and_determinism():
    a = corpus_pandas(50)
    b = corpus_pandas(50)
    assert list(a.columns) == ["repo", "path", "commit", "lang", "content"]
    assert a.equals(b)
    assert a["commit"].str.len().eq(40).all()


def test_doc_lengths_bounds():
    lens = doc_lengths(np.arange(5000))
    assert lens.min() >= 20 and lens.max() <= 4000


def test_needles_planted():
    pdf = corpus_pandas(NEEDLE_EVERY * 3 + 1)
    for i in range(0, NEEDLE_EVERY * 3 + 1, NEEDLE_EVERY):
        tok = needle_token(i)
        assert tok is not None
        assert tok in pdf.iloc[i].content
    assert needle_token(1) is None
