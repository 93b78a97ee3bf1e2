"""Term + completion suggesters vs a brute-force dictionary oracle."""
from __future__ import annotations

import pytest


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def brute_suggest(df_counter, text, size=5, max_edits=2, prefix_length=1,
                  min_word_length=4, mode="missing", sort="score"):
    from data_prep_opensearch_spark.functions.tokenize import tokenize_simple

    tokens = sorted({t for t in tokenize_simple(text)
                     if len(t) >= min_word_length})
    out = []
    for tok in tokens:
        own = df_counter.get(tok, 0)
        if mode == "missing" and own > 0:
            continue
        cands = []
        for term, df in df_counter.items():
            if abs(len(term) - len(tok)) > max_edits:
                continue
            if prefix_length and term[:prefix_length] != tok[:prefix_length]:
                continue
            d = _lev(term, tok)
            if not (1 <= d <= max_edits):
                continue
            score = 1.0 - d / min(len(term), len(tok))
            if score <= 0:
                continue
            if mode == "popular" and df <= own:
                continue
            cands.append((tok, term, d, score, df))
        key = ((lambda c: (-c[3], -c[4], c[1])) if sort == "score"
               else (lambda c: (-c[4], -c[3], c[1])))
        cands.sort(key=key)
        out.extend(cands[:size])
    return sorted(out)


def _engine(spark, built_index):
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine

    d, _ = built_index
    return BM25Engine(spark, d, cache=True)


def _mutants(df_counter, n=3):
    """Misspellings of real corpus terms that are NOT themselves terms."""
    out = []
    for term in sorted(df_counter):
        if len(term) < 5:
            continue
        mut = term[0] + term[2:]  # drop 2nd char
        if mut not in df_counter and len(mut) >= 4 and mut not in out:
            out.append(mut)
        if len(out) == n:
            break
    assert len(out) == n
    return out


def _rows(df):
    return sorted(
        (r["token"], r["suggestion"], r["dist"],
         pytest.approx(r["score"], abs=1e-9), r["df"])
        for r in df.collect()
    )


def test_term_suggest_parity(spark, built_index, oracle_index):
    from data_prep_opensearch_spark.operators.suggest import term_suggest

    eng = _engine(spark, built_index)
    text = " ".join(_mutants(oracle_index.df))
    got = term_suggest(eng, text).collect()
    exp = brute_suggest(oracle_index.df, text)
    assert len(got) > 0
    assert sorted((r["token"], r["suggestion"], r["dist"], r["df"])
                  for r in got) == [(t, s, d, df) for t, s, d, _, df in exp]
    for r in got:
        assert r["score"] == pytest.approx(
            1.0 - r["dist"] / min(len(r["suggestion"]), len(r["token"])))


def test_term_suggest_modes(spark, built_index, oracle_index):
    from data_prep_opensearch_spark.operators.suggest import term_suggest

    eng = _engine(spark, built_index)
    invocab = max((t for t in oracle_index.df if len(t) >= 5),
                  key=lambda t: oracle_index.df[t])
    # missing mode: an in-vocabulary token gets no suggestions
    assert term_suggest(eng, invocab, suggest_mode="missing").count() == 0
    # always mode: suggestions appear iff brute force finds candidates
    exp = brute_suggest(oracle_index.df, invocab, mode="always")
    got = term_suggest(eng, invocab, suggest_mode="always")
    assert sorted((r["token"], r["suggestion"]) for r in got.collect()) == \
        sorted((t, s) for t, s, *_ in exp)
    # popular mode: every suggestion's df strictly exceeds the token's
    own = oracle_index.df[invocab]
    pop = term_suggest(eng, invocab, suggest_mode="popular").collect()
    assert all(r["df"] > own for r in pop)
    assert sorted((r["token"], r["suggestion"]) for r in pop) == sorted(
        (t, s) for t, s, *_ in
        brute_suggest(oracle_index.df, invocab, mode="popular"))


def test_term_suggest_frequency_sort_and_caps(spark, built_index, oracle_index):
    from data_prep_opensearch_spark.operators.suggest import term_suggest

    eng = _engine(spark, built_index)
    text = " ".join(_mutants(oracle_index.df))
    for size in (1, 3):
        got = term_suggest(eng, text, size=size, sort="frequency").collect()
        exp = brute_suggest(oracle_index.df, text, size=size,
                            sort="frequency")
        assert sorted((r["token"], r["suggestion"], r["df"]) for r in got) \
            == [(t, s, df) for t, s, _, _, df in exp]
        from collections import Counter
        per_tok = Counter(r["token"] for r in got)
        assert all(v <= size for v in per_tok.values())


def test_term_suggest_prefix_and_length_gates(spark, built_index, oracle_index):
    from data_prep_opensearch_spark.operators.suggest import term_suggest

    eng = _engine(spark, built_index)
    mut = _mutants(oracle_index.df, 1)[0]
    # prefix_length=0 candidates are a superset of pinned-prefix ones
    p1 = {(r["token"], r["suggestion"])
          for r in term_suggest(eng, mut, size=50).collect()}
    p0 = {(r["token"], r["suggestion"])
          for r in term_suggest(eng, mut, size=50,
                                prefix_length=0).collect()}
    assert p1 <= p0
    assert p0 == {(t, s) for t, s, *_ in brute_suggest(
        oracle_index.df, mut, size=50, prefix_length=0)}
    # a token shorter than min_word_length is never suggested for
    assert term_suggest(eng, "ab", min_word_length=4).count() == 0
    # bad args raise
    with pytest.raises(ValueError):
        term_suggest(eng, mut, suggest_mode="nope")
    with pytest.raises(ValueError):
        term_suggest(eng, mut, sort="nope")


def test_completion_suggest(spark, built_index, oracle_index):
    from data_prep_opensearch_spark.operators.suggest import completion_suggest

    eng = _engine(spark, built_index)
    # pick the most common first letter in the vocabulary as the prefix
    from collections import Counter
    first = Counter(t[0] for t in oracle_index.df).most_common(1)[0][0]
    exp = sorted(((t, df) for t, df in oracle_index.df.items()
                  if t.startswith(first)),
                 key=lambda x: (-x[1], x[0]))[:5]
    got = [(r["suggestion"], r["df"])
           for r in completion_suggest(eng, first, size=5).collect()]
    assert got == exp
    assert completion_suggest(eng, "zzzzzzq", size=5).count() == 0
