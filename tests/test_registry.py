"""Multi-corpus registry (S2): auto ids, open-by-name, cascading delete
(reference api.py:289-345)."""

from __future__ import annotations

import os

import pytest

from fornax_spark.fulltext.build import build_index
from fornax_spark.fulltext.corpus import generate_pages, pages_to_spark
from fornax_spark.fulltext.registry import Registry
from fornax_spark.fulltext.segments import build_segments
from fornax_spark.fulltext.wand import search_segments


def test_registry_lifecycle(spark, tmp_path):
    reg = Registry(str(tmp_path / "reg"))
    id1, p1 = reg.create("news")
    id2, p2 = reg.create()  # auto name
    assert (id1, id2) == (1, 2)
    with pytest.raises(ValueError, match="already registered"):
        reg.create("news")

    pages = generate_pages(120, seed=51)
    idx = build_index(spark, pages_to_spark(spark, pages, partitions=4))
    build_segments(spark, idx, p1, n_buckets=4)
    build_segments(spark, idx, p2, n_buckets=8)
    idx.postings.unpersist()

    rows = reg.list()
    assert [r["corpus_id"] for r in rows] == [1, 2]
    assert rows[0]["n_docs"] == 120

    # open by id and by name, both queryable
    s_by_name = reg.open("news")
    s_by_id = reg.open(2)
    a = search_segments(spark, s_by_name, "term00000", k=5).collect()
    b = search_segments(spark, s_by_id, "term00000", k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    # cascading delete removes catalog row AND the store directory
    reg.delete("news")
    assert not os.path.exists(p1)
    assert [r["corpus_id"] for r in reg.list()] == [2]
    with pytest.raises(KeyError):
        reg.open("news")
    # ids never reused
    id3, _p3 = reg.create("news")
    assert id3 == 3
