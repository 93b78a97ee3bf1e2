"""Search-result highlighting: best-fragment snippets from query terms.

Lucene's *unified highlighter* in re-analyze mode (the default when the
index stores no character offsets, as ours doesn't): the top-k hits'
TEXT is re-tokenized at highlight time, the best window of ``window``
tokens is chosen, and matched terms are wrapped in a tag. Re-analysis
costs one regex pass over k documents — nothing at any corpus size,
because highlighting only ever touches the page of hits being shown
(the reference's serving tier renders OpenSearch highlight fragments
the same way; SURVEY.md §2 O7 family).

Window selection (deterministic, SQL-oracle-expressible):
- candidate starts = the matched token ordinals,
- score of a start s = number of matched-term OCCURRENCES in
  ``[s, s + window)``,
- best = max occurrences, ties to the smallest start.

Two fragment forms come back:
- ``fragment``: the window's LOWERCASE tokens joined with single
  spaces — the canonical form shared bit-for-bit with the DuckDB
  oracle (``array_to_string(toks[s+1:s+w], ' ')``),
- ``snippet``: the RAW text slice spanning the window, each matched
  identifier wrapped in ``<em>...</em>`` — the human-facing form.

Token ordinals follow identifier runs (``[A-Za-z0-9_]+`` on the raw
text). For ASCII text this is exactly the index's 'simple'
tokenization of ``lower(text)``; exotic case-folding (e.g. dotted
capital I) can shift ordinals — a cosmetic, highlight-only divergence.
Under the 'code' tokenizer an identifier matches when its whole lowered
form OR any split sub-token is a query term (parseJson highlights for
the query ``parse``), and ordinals are identifier ordinals — the same
position semantics as the positional index stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F, types as T

from data_prep_opensearch_spark.functions.tokenize import (
    IDENT_RE,
    _split_ident,
)

HIGHLIGHT_SCHEMA = T.StructType([
    T.StructField("fragment", T.StringType(), True),
    T.StructField("snippet", T.StringType(), True),
    T.StructField("frag_start", T.IntegerType(), True),
    T.StructField("n_matches", T.IntegerType(), True),
])

DEFAULT_WINDOW = 30


def _ident_matches(ident_raw: str, terms: frozenset[str],
                   mode: str) -> bool:
    # split the RAW identifier — camelCase boundaries vanish once lowered
    if ident_raw.lower() in terms:
        return True
    if mode == "code":
        return any(s.lower() in terms for s in _split_ident(ident_raw))
    return False


def best_window(match_pos: np.ndarray, window: int) -> tuple[int, int]:
    """(start ordinal, occurrences) of the best ``window``-token window:
    max matched occurrences, ties to the smallest start. Candidate
    starts are the match ordinals themselves (a better window always
    left-aligns on some match). O(m log m) searchsorted, no python loop.
    """
    if match_pos.size == 0:
        return -1, 0
    counts = (
        np.searchsorted(match_pos, match_pos + window, side="left")
        - np.arange(match_pos.size)
    )
    i = int(np.argmax(counts))  # argmax takes the FIRST max: smallest start
    return int(match_pos[i]), int(counts[i])


def highlight_one(
    text: str, terms: frozenset[str], mode: str = "simple",
    window: int = DEFAULT_WINDOW, tag: str = "em",
) -> tuple[str | None, str | None, int, int]:
    """(fragment, snippet, frag_start, n_matches) for one document."""
    spans = [(m.group(0), m.start(), m.end())
             for m in IDENT_RE.finditer(text or "")]
    lowered = [s[0].lower() for s in spans]
    hits = np.flatnonzero(np.fromiter(
        (_ident_matches(s[0], terms, mode) for s in spans),
        dtype=bool, count=len(spans),
    ))
    start, nm = best_window(hits.astype(np.int64), window)
    if nm == 0:
        return None, None, -1, 0
    end = min(start + window, len(spans))
    fragment = " ".join(lowered[start:end])
    hit_set = set(hits[(hits >= start) & (hits < end)].tolist())
    c0, c1 = spans[start][1], spans[end - 1][2]
    pieces: list[str] = []
    cur = c0
    for i in range(start, end):
        if i in hit_set:
            _, s, e = spans[i]
            pieces.append(text[cur:s])
            pieces.append(f"<{tag}>{text[s:e]}</{tag}>")
            cur = e
    pieces.append(text[cur:c1])
    return fragment, "".join(pieces), start, nm


def highlight_expr(
    text_col: str | Column, terms: list[str], tokenizer: str = "simple",
    window: int = DEFAULT_WINDOW, tag: str = "em",
) -> Column:
    """Column expression producing the highlight struct for each row —
    an Arrow-batched pandas UDF (runs only over the k rows being
    rendered, never the corpus)."""
    tset = frozenset(t.lower() for t in terms)

    @F.pandas_udf(HIGHLIGHT_SCHEMA)
    def _hl(texts: pd.Series) -> pd.DataFrame:
        rows = [highlight_one(t, tset, tokenizer, window, tag)
                for t in texts]
        return pd.DataFrame(
            rows, columns=["fragment", "snippet", "frag_start", "n_matches"]
        ).astype({"frag_start": "int32", "n_matches": "int32"})

    return _hl(F.col(text_col) if isinstance(text_col, str) else text_col)


def with_highlights(
    df: DataFrame, text_col: str, terms: list[str],
    tokenizer: str = "simple", window: int = DEFAULT_WINDOW,
    tag: str = "em", prefix: str = "hl_",
) -> DataFrame:
    """Add ``{prefix}fragment/snippet/start/matches`` columns to a
    (top-k joined) DataFrame. Compose after the ranking:

        topk.join(corpus, "doc_id") |> with_highlights(..., ["merge"])
    """
    h = highlight_expr(text_col, terms, tokenizer, window, tag)
    return (
        df.withColumn("_hl", h)
        .withColumn(f"{prefix}fragment", F.col("_hl.fragment"))
        .withColumn(f"{prefix}snippet", F.col("_hl.snippet"))
        .withColumn(f"{prefix}start", F.col("_hl.frag_start"))
        .withColumn(f"{prefix}matches", F.col("_hl.n_matches"))
        .drop("_hl")
    )


def positive_terms(query: str, engine) -> list[str]:
    """The query's positive scoring terms (literals + prefix/fuzzy
    expansions + phrase members) — what a highlighter should mark."""
    clauses, _, _, phrases, _, _ = engine._plan_clauses(query)
    terms = {t for cl in clauses for t in cl}
    terms.update(t for ph in phrases for t in ph)
    return sorted(terms)
