"""Standalone delete (S6): query-after-delete must equal a fresh build
over the corpus WITHOUT the deleted docs — scores, ranks and pruning all
included — and a merge must physically drop the tombstoned postings."""

from __future__ import annotations

import pytest

from fornax_spark.fulltext.build import build_index
from fornax_spark.fulltext.corpus import generate_pages, pages_to_spark
from fornax_spark.fulltext.deletes import delete_docs, load_tombstones
from fornax_spark.fulltext.segments import build_segments
from fornax_spark.fulltext.wand import search_segments

QUERIES = ["term00000 term00001", "term00002 term01000 term04000", "term00003"]


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    pages = generate_pages(500, seed=47)
    idx = build_index(spark, pages_to_spark(spark, pages, partitions=8))
    live = build_segments(
        spark, idx, str(tmp_path_factory.mktemp("live")), n_buckets=8
    )
    # delete every 7th doc (by url-hash doc id, like a user would)
    all_ids = sorted(
        r["doc_id"]
        for r in idx.postings.select("doc_id").distinct().collect()
    )
    deleted = all_ids[::7]
    delete_docs(spark, live, deleted)
    idx.postings.unpersist()

    # ground truth: rebuild over the corpus without those docs
    from fornax_spark.fulltext.textproc import doc_id_of_url

    dead = set(deleted)
    kept_pages = pages[
        ~pages["url"].map(doc_id_of_url).isin(dead)
    ].reset_index(drop=True)
    idx2 = build_index(spark, pages_to_spark(spark, kept_pages, partitions=8))
    rebuilt = build_segments(
        spark, idx2, str(tmp_path_factory.mktemp("rebuilt")), n_buckets=8
    )
    yield spark, live, rebuilt, deleted
    idx2.postings.unpersist()


def _collect(df):
    return [(r["rank"], r["doc_id"], r["score"]) for r in df.collect()]


def test_delete_equals_rebuild(stores):
    spark, live, rebuilt, _deleted = stores
    for qt in QUERIES:
        got = _collect(search_segments(spark, live, qt, k=10))
        want = _collect(search_segments(spark, rebuilt, qt, k=10))
        assert got == want, qt
        assert got, qt  # non-trivial


def test_delete_pruned_equals_exhaustive(stores):
    """Stale block-max metadata is rescaled, so MaxScore admission stays
    sound after deletes."""
    spark, live, _rebuilt, _deleted = stores
    for qt in QUERIES:
        a = _collect(search_segments(spark, live, qt, k=10, prune=True))
        b = _collect(search_segments(spark, live, qt, k=10, prune=False))
        assert a == b, qt


def test_deleted_docs_never_returned(stores):
    spark, live, _rebuilt, deleted = stores
    dead = set(deleted)
    for qt in QUERIES:
        for _rank, doc_id, _score in _collect(
            search_segments(spark, live, qt, k=50)
        ):
            assert doc_id not in dead


def test_delete_is_cumulative_and_idempotent(stores):
    spark, live, _rebuilt, deleted = stores
    t1 = load_tombstones(live)
    delete_docs(spark, live, deleted[:3])  # already deleted: no-op
    t2 = load_tombstones(live)
    assert t2.n_deleted == t1.n_deleted
    assert t2.dl_deleted == t1.dl_deleted


def test_merge_consumes_tombstones(stores, tmp_path):
    spark, live, rebuilt, _deleted = stores
    from fornax_spark.fulltext.merge import merge_stores

    merged = merge_stores(spark, [live], str(tmp_path / "merged"))
    assert load_tombstones(merged) is None
    assert merged.n_docs == rebuilt.n_docs
    for qt in QUERIES[:2]:
        got = _collect(search_segments(spark, merged, qt, k=10))
        want = _collect(search_segments(spark, rebuilt, qt, k=10))
        assert got == want, qt
