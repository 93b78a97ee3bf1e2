"""F4 content cleaner, D4/D5 intra-doc dedup, F16 chunking, P9 URL
classification — reference-semantics unit + Spark-plan tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_prep_opensearch_spark.functions.cleaning import (
    clean_content_py,
    dedup_chunks_by_prefix_py,
    dedup_lines_py,
)
from data_prep_opensearch_spark.functions.text import classify_url_py


def test_clean_content_planted_artifacts():
    # page header + duplicate line (D4) + soft hyphen + NFKC ellipsis
    out = clean_content_py("3 / 12 Head­er\nAlpha beta\nAlpha beta\nx … y")
    assert "3 / 12" not in out
    assert out.count("Alpha beta") == 1
    assert "Header" in out            # soft hyphen removed
    assert "…" not in out        # ellipsis transliterated then collapsed

    # cross-line artifacts: wrap joining + camelCase repair + colon spacing
    out = clean_content_py("Increase\nproductivityOptimize to:go")
    assert out == "Increase productivity Optimize to: go"

    # de-hyphenation path (reference rule order: spaced-dash + compound
    # repair run first, so the rejoined form keeps the compound hyphen)
    assert clean_content_py("nutricio-\nnal") == "nutricio-nal"

    # quotes/number normalization
    assert clean_content_py("“q” No.5 6,9M2018") == '"q" n° 5 6,9M 2018'

    assert clean_content_py(None) is None


def test_dedup_lines_keep_first_drop_blank():
    assert dedup_lines_py("a\nb\na\n\n  \nc\nb") == "a\nb\nc"


def test_dedup_chunks_by_prefix():
    # keep-first on the 500-char prefix; blanks dropped; joined by \n\n
    assert dedup_chunks_by_prefix_py(["  x  ", "x", "", None, "y"]) == "x\n\ny"
    # narrow prefix: suffix differences beyond it are invisible
    assert dedup_chunks_by_prefix_py(["abcdXX", "abcdYY", "efgh"], prefix_len=4) == (
        "abcdXX\n\nefgh"
    )


def _ref_chunks(text: str, chunk_tok: int, overlap_tok: int) -> list[str]:
    """Reference split_into_tokenish_chunks, text_utils.py:12-21 verbatim
    semantics (re-derived, kept here as the test oracle)."""
    step = max(1, (chunk_tok - overlap_tok) * 4)
    width = max(step, chunk_tok * 4)
    chunks, i, n = [], 0, len(text)
    while i < n:
        chunks.append(text[i : i + width])
        i += step
    return chunks


def test_split_tokenish_chunks_matches_reference(spark):
    from data_prep_opensearch_spark.operators.chunking import split_tokenish_chunks

    texts = ["", "short", "x" * 1000, "y" * 257, "z" * 192]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): r["chunk"]
        for r in split_tokenish_chunks(df, chunk_tok=64, overlap_tok=16).collect()
    }
    expected = {}
    for i, t in enumerate(texts):
        for j, c in enumerate(_ref_chunks(t, 64, 16)):
            expected[(i, j)] = c
    assert got == expected


def test_classify_url_branches():
    cases = [
        ("https://example.com/docs/page?x=1", "ok"),
        ("http://example.com/a", "https_required"),
        ("https://user:pw@example.com/a", "embedded_credentials"),
        ("https:///nopath", "missing_host"),
        ("https://localhost/a", "internal_host"),
        ("https://10.0.0.8/a", "internal_host"),
        ("https://box.local/a", "internal_host"),
        ("https://github.com/org/repo/projects/2", "github_project_board"),
        ("https://github.com/orgs/acme/projects/1", "github_project_board"),
        ("https://github.com/notifications", "github_dashboard_page"),
        ("https://intranet/a", "host_missing_tld"),
        ("https://example.x/a", "host_bad_tld"),
        ("https://example.com/setup.exe", "dangerous_payload_extension"),
        ("https://example.com/archive.tar.gz", "dangerous_payload_extension"),
        ("https://example.com/index.php", "ok"),  # legacy webpage ext exempt
        ("https://example.com/", "homepage_or_bare_domain"),
        ("https://www.example.com", "homepage_or_bare_domain"),
        ("", "empty"),
        (None, "not_a_string"),
        (b"https://example.com/a", "ok"),
    ]
    for url, want in cases:
        ok, reason = classify_url_py(url)
        assert reason == want, (url, reason, want)
        assert ok == (want == "ok")


def test_clean_content_udf_batches(spark):
    from data_prep_opensearch_spark.functions.cleaning import clean_content_udf

    df = spark.createDataFrame(
        [(1, "A\nA\nb-\nc"), (2, None)], ["doc_id", "t"]
    )
    rows = {r["doc_id"]: r["c"] for r in
            df.select("doc_id", clean_content_udf(F.col("t")).alias("c")).collect()}
    assert rows[1] == clean_content_py("A\nA\nb-\nc")
    assert rows[2] is None
