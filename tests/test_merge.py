"""LSM merge invariants:
  1. merge(two disjoint half-stores) == clean build over the union
     (search results bit-identical)
  2. merge with tombstones == clean build over corpus minus deleted docs
"""

from __future__ import annotations

import pandas as pd
import pytest

from fornax_spark.fulltext.build import build_index
from fornax_spark.fulltext.corpus import generate_pages, pages_to_spark
from fornax_spark.fulltext.merge import merge_stores
from fornax_spark.fulltext.segments import build_segments
from fornax_spark.fulltext.textproc import doc_id_of_url
from fornax_spark.fulltext.wand import search_segments_batch

QUERIES = pd.DataFrame(
    {
        "query_id": [0, 1, 2],
        "query_text": ["term00000", "term00001 term00050", "term00002 term03000"],
        "k": [10, 10, 10],
    }
)


def _results(spark, store):
    return [tuple(r) for r in search_segments_batch(spark, store, QUERIES).collect()]


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_pages(500, seed=44)


def test_merge_equals_clean_build(spark, corpus, tmp_path_factory):
    tp = tmp_path_factory.mktemp("merge")
    full_df = pages_to_spark(spark, corpus, partitions=4)
    idx_full = build_index(spark, full_df)
    s_full = build_segments(spark, idx_full, str(tp / "full"), n_buckets=8)

    h1 = pages_to_spark(spark, corpus.iloc[:250], partitions=4)
    h2 = pages_to_spark(spark, corpus.iloc[250:], partitions=4)
    i1 = build_index(spark, h1)
    i2 = build_index(spark, h2)
    s1 = build_segments(spark, i1, str(tp / "h1"), n_buckets=8)
    s2 = build_segments(spark, i2, str(tp / "h2"), n_buckets=8)
    merged = merge_stores(spark, [s1, s2], str(tp / "merged"))

    assert merged.n_docs == s_full.n_docs
    assert merged.avgdl == pytest.approx(s_full.avgdl, abs=1e-12)
    assert _results(spark, merged) == _results(spark, s_full)
    for i in (idx_full, i1, i2):
        i.postings.unpersist()


def test_merge_with_tombstones(spark, corpus, tmp_path_factory):
    tp = tmp_path_factory.mktemp("tomb")
    deleted = corpus["url"].iloc[:50].map(doc_id_of_url).tolist()

    idx_full = build_index(spark, pages_to_spark(spark, corpus, partitions=4))
    s_full = build_segments(spark, idx_full, str(tp / "full"), n_buckets=8)
    merged = merge_stores(
        spark, [s_full], str(tp / "compacted"), deleted_doc_ids=deleted
    )

    idx_clean = build_index(
        spark, pages_to_spark(spark, corpus.iloc[50:], partitions=4)
    )
    s_clean = build_segments(spark, idx_clean, str(tp / "clean"), n_buckets=8)

    assert merged.n_docs == s_clean.n_docs == 450
    assert merged.avgdl == pytest.approx(s_clean.avgdl, abs=1e-12)
    assert _results(spark, merged) == _results(spark, s_clean)
    idx_full.postings.unpersist()
    idx_clean.postings.unpersist()
