"""Document chunking for context-length-bounded LLM pipelines
(SURVEY.md §2.8 F16; reference stages/improver/text_utils.py:12-21).

Reference semantics: fixed-width overlapping character windows sized in
"tokenish" units (1 token ≈ 4 chars):

    step  = max(1, (chunk_tok - overlap_tok) * 4)
    width = max(step, chunk_tok * 4)
    chunks = [ text[i : i+width]  for i in range(0, len(text), step) ]

Spark-first: a pure Catalyst plan — sequence + explode + substr — fully
codegen'd, no UDF. The explode is the UDTF shape of SURVEY.md §2.11; at
100 TB it is a linear map with no shuffle at all (chunk rows stay in
their parent's partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def split_tokenish_chunks(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    chunk_tok: int = 64,
    overlap_tok: int = 16,
) -> DataFrame:
    """(key, text) -> (key, chunk_idx, chunk) rows, overlapping windows.

    Matches split_into_tokenish_chunks exactly: empty text yields no
    rows; the last window may be short; windows overlap by
    (overlap_tok * 4) chars.
    """
    step = max(1, (chunk_tok - overlap_tok) * 4)
    width = max(step, chunk_tok * 4)
    n_chunks = F.ceil(F.length(F.col(text)) / F.lit(step)).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx")
    out = (
        df.filter(F.length(F.col(text)) > 0)
        .select(F.col(key), F.col(text).alias("_t"), idx)
        .select(
            F.col(key),
            F.col("chunk_idx"),
            F.col("_t").substr(
                F.col("chunk_idx") * F.lit(step) + F.lit(1), F.lit(width)
            ).alias("chunk"),
        )
    )
    return out
