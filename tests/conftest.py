from __future__ import annotations

import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from data_prep_opensearch_spark.session import get_spark

    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tmp_root():
    d = tempfile.mkdtemp(prefix="dposs_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


N_DOCS = 300


@pytest.fixture(scope="session")
def built_index(spark, tmp_root):
    """One shared 300-doc index (simple tokenizer, 4 shards, 2 groups)."""
    import os

    from data_prep_opensearch_spark.operators.index_build import build_index
    from data_prep_opensearch_spark.sources.corpus import corpus_df

    d = os.path.join(tmp_root, "idx_main")
    meta = build_index(spark, corpus_df(spark, N_DOCS), d, n_shards=4, n_groups=2)
    return d, meta


@pytest.fixture(scope="session")
def oracle_index(spark, built_index):
    """Oracle over the same docs, keyed by the ENGINE's docIDs."""
    import os

    from data_prep_opensearch_spark.operators.manifest import read_doc_stats
    from data_prep_opensearch_spark.oracle import OracleIndex
    from data_prep_opensearch_spark.sources.corpus import corpus_pandas

    d, _ = built_index
    stats = read_doc_stats(spark, d).select(
        "doc_id", "repo", "path", "commit"
    ).collect()
    key2id = {(r["repo"], r["path"], r["commit"]): r["doc_id"] for r in stats}
    pdf = corpus_pandas(N_DOCS)
    docs = {
        key2id[(row.repo, row.path, row.commit)]: row.content
        for row in pdf.itertuples(index=False)
    }
    return OracleIndex(docs)
