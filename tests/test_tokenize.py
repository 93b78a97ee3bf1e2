from __future__ import annotations

from data_prep_opensearch_spark.functions.tokenize import (
    doc_length,
    term_frequencies,
    tokenize_code,
    tokenize_simple,
)


def test_simple_lowercase_and_split():
    assert tokenize_simple("Foo bar-baz 42 foo_bar") == ["foo", "bar", "baz", "42", "foo_bar"]


def test_simple_empty_and_punct():
    assert tokenize_simple("") == []
    assert tokenize_simple("!!! ... ???") == []


def test_code_splits_snake_and_camel():
    toks = tokenize_code("parseJson parse_json HTTPServer x")
    assert "parsejson" in toks and "parse" in toks and "json" in toks
    assert "parse_json" in toks
    assert "httpserver" in toks and "http" in toks and "server" in toks
    assert toks.count("x") == 1  # single-part identifiers not duplicated


def test_term_frequencies_and_doclen():
    tf = term_frequencies("a b a c a", "simple")
    assert tf == {"a": 3, "b": 1, "c": 1}
    assert doc_length("a b a c a", "simple") == 5
