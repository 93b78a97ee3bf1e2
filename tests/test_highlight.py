"""Best-fragment highlighting (unified-highlighter re-analyze mode):
window selection, tag wrapping, code-tokenizer sub-token matches, and
the Spark column transform."""

from __future__ import annotations

import re

import numpy as np


def test_best_window_rules():
    from data_prep_opensearch_spark.operators.highlight import best_window

    # densest window wins
    assert best_window(np.array([0, 5, 6, 7, 50]), 5) == (5, 3)
    # tie -> smallest start
    assert best_window(np.array([0, 1, 10, 11]), 4) == (0, 2)
    # single match
    assert best_window(np.array([42]), 10) == (42, 1)
    # empty
    assert best_window(np.array([], dtype=np.int64), 10) == (-1, 0)
    # window of 1: each match counts itself; first wins
    assert best_window(np.array([3, 9]), 1) == (3, 1)


def test_highlight_one_simple():
    from data_prep_opensearch_spark.operators.highlight import highlight_one

    text = "alpha beta gamma beta delta beta epsilon"
    frag, snip, start, nm = highlight_one(
        text, frozenset(["beta"]), "simple", window=3)
    # windows anchored at matches: [1,3]->2 matches? tokens 1..3 =
    # beta gamma beta -> 2; [3..5] = beta delta beta -> 2; tie -> start 1
    assert (start, nm) == (1, 2)
    assert frag == "beta gamma beta"
    assert snip == "<em>beta</em> gamma <em>beta</em>"

    # no match
    assert highlight_one(text, frozenset(["zz"]), "simple") == (
        None, None, -1, 0)

    # window crossing the doc end clamps
    frag, snip, start, nm = highlight_one(
        "x y needle", frozenset(["needle"]), "simple", window=10)
    assert (start, nm) == (2, 1)
    assert frag == "needle" and snip == "<em>needle</em>"

    # original case and punctuation survive in the snippet
    frag, snip, *_ = highlight_one(
        "The MERGE, then; sort!", frozenset(["merge", "sort"]),
        "simple", window=10)
    assert snip == "<em>MERGE</em>, then; <em>sort</em>"
    assert frag == "merge then sort"


def test_highlight_one_code_subtokens():
    from data_prep_opensearch_spark.operators.highlight import highlight_one

    text = "def parseJson(data): return parse_json(data)"
    frag, snip, start, nm = highlight_one(
        text, frozenset(["parse"]), "code", window=20)
    # both compound identifiers match via their sub-token
    assert "<em>parseJson</em>" in snip and "<em>parse_json</em>" in snip
    assert nm == 2
    # 'simple' mode would split parse_json at nothing ([a-z0-9_]+ keeps
    # underscores) and match neither
    assert highlight_one(text, frozenset(["parse"]), "simple",
                         window=20)[3] == 0


def test_snippet_fragment_consistency():
    """Stripping tags from the snippet and tokenizing gives exactly the
    fragment (the canonical lowercase token-join)."""
    from data_prep_opensearch_spark.operators.highlight import highlight_one

    text = ("Merge sort: a stable merge of sorted runs. "
            "The merge step is the hot path; batch the merges.")
    frag, snip, start, nm = highlight_one(
        text, frozenset(["merge", "batch"]), "simple", window=8)
    naked = re.sub(r"</?em>", "", snip)
    toks = re.findall(r"[a-z0-9_]+", naked.lower())
    assert " ".join(toks) == frag
    assert nm == snip.count("<em>")


def test_with_highlights_spark(spark):
    from data_prep_opensearch_spark.operators.highlight import (
        highlight_one,
        with_highlights,
    )

    rows = [
        (1, "alpha beta gamma beta"),
        (2, "no hits at all"),
        (3, "beta " * 50),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in with_highlights(df, "text", ["beta"], window=4).collect()
    }
    for did, text in rows:
        frag, snip, start, nm = highlight_one(
            text, frozenset(["beta"]), "simple", window=4)
        assert got[did]["hl_fragment"] == frag, did
        assert got[did]["hl_snippet"] == snip, did
        assert got[did]["hl_start"] == start and got[did]["hl_matches"] == nm


def test_positive_terms_expansions(spark, built_index):
    """The highlight term set follows the full query language: prefix
    and fuzzy expansions and phrase members are all marked; must_not
    terms are not."""
    from data_prep_opensearch_spark.operators.bm25 import BM25Engine
    from data_prep_opensearch_spark.operators.highlight import (
        positive_terms,
    )

    d, _ = built_index
    eng = BM25Engine(spark, d, cache=True)
    terms = positive_terms('needle0~1 sym1* "import def" -fn3', eng)
    assert "needle0" in terms and "needle1" in terms   # fuzzy expansion
    assert any(t.startswith("sym1") and t != "sym1" for t in terms) \
        or "sym1" in terms                              # prefix expansion
    assert "import" in terms and "def" in terms         # phrase members
    assert "fn3" not in terms                           # must_not excluded
