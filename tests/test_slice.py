"""End-to-end slice (SURVEY.md §7.1): Spark engine vs pure-Python oracle.

Rank-identical (query_id, rank, doc_id) AND bit-identical float64 scores
over the full reference query set — the graft of the reference's golden
end-to-end payload test (/root/reference/test/test_api.py:462-671).
"""

from __future__ import annotations

import pytest

from fornax_spark.fulltext import oracle
from fornax_spark.fulltext.build import build_index
from fornax_spark.fulltext.corpus import (
    generate_pages,
    pages_to_spark,
    reference_queries,
)
from fornax_spark.fulltext.query import query_terms_df, score_batch


@pytest.fixture(scope="module")
def corpus_and_index(spark):
    pages = generate_pages(1000, seed=42)
    df = pages_to_spark(spark, pages, partitions=8)
    idx = build_index(spark, df, from_html=True)
    oidx = oracle.build_index(pages, use_html=True)
    yield pages, idx, oidx
    idx.postings.unpersist()


def test_corpus_stats_match(corpus_and_index):
    _, idx, oidx = corpus_and_index
    assert idx.stats.n_docs == oidx.n_docs
    assert idx.stats.avgdl == pytest.approx(oidx.avgdl, abs=1e-9)


def test_postings_match_oracle(corpus_and_index):
    _, idx, oidx = corpus_and_index
    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in idx.postings.collect()
    }
    want = {}
    for term, plist in oidx.postings.items():
        for did, tf in plist.items():
            want[(term, did)] = (tf, oidx.doc_len[did])
    assert got == want


def test_topk_rank_identical_to_oracle(spark, corpus_and_index):
    pages, idx, oidx = corpus_and_index
    queries = reference_queries()
    golden = oracle.golden_results(oidx, queries)
    got = (
        score_batch(idx, query_terms_df(spark, queries))
        .orderBy("query_id", "rank")
        .toPandas()
    )
    assert len(got) == len(golden)
    assert got["query_id"].tolist() == golden["query_id"].tolist()
    assert got["rank"].tolist() == golden["rank"].tolist()
    assert got["doc_id"].tolist() == golden["doc_id"].tolist()
    # bit-identical float64 scores (shared numpy kernel + fixed sum order)
    assert got["score"].tolist() == golden["score"].tolist()


def test_oov_query_empty(spark, corpus_and_index):
    _, idx, _ = corpus_and_index
    from fornax_spark.fulltext.query import search

    assert search(spark, idx, "zzzznotaterm", k=10).count() == 0
