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


def test_registry_catalogs_ann_stores(spark, tmp_path):
    """ANN (LSH and IVF) indexes live in the SAME registry namespace as
    segment stores, typed by `kind`, and reopen through Registry.open."""
    import numpy as np

    from fornax_spark.operators.similarity import (
        ann_search,
        build_ann_index,
        build_ivf_index,
        ivf_search,
        write_ann_index,
        write_ivf_index,
    )

    reg = Registry(str(tmp_path / "reg"))
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((100, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[0]]

    _lsh_id, lsh_path = reg.create("emb-lsh", kind="ann_lsh")
    lsh = build_ann_index(df, dim=8, n_planes=6, n_tables=2, persist=False)
    write_ann_index(lsh, lsh_path)

    _ivf_id, ivf_path = reg.create("emb-ivf", kind="ann_ivf")
    ivf = build_ivf_index(df, dim=8, n_clusters=4, persist=False)
    write_ivf_index(ivf, ivf_path)

    kinds = {r["name"]: r["kind"] for r in reg.list()}
    assert kinds == {"emb-lsh": "ann_lsh", "emb-ivf": "ann_ivf"}

    lsh2 = reg.open("emb-lsh", spark=spark)
    assert [tuple(r) for r in ann_search(lsh2, q, k=5).collect()] == [
        tuple(r) for r in ann_search(lsh, q, k=5).collect()
    ]
    ivf2 = reg.open("emb-ivf", spark=spark)
    assert [tuple(r) for r in ivf_search(ivf2, q, k=5, nprobe=4).collect()] == [
        tuple(r) for r in ivf_search(ivf, q, k=5, nprobe=4).collect()
    ]
    with pytest.raises(ValueError, match="requires spark"):
        reg.open("emb-ivf")
    with pytest.raises(ValueError, match="unknown store kind"):
        reg.create("x", kind="bogus")

    # cascading delete works for ANN rows too
    reg.delete("emb-lsh")
    assert not os.path.exists(lsh_path)
    assert [r["name"] for r in reg.list()] == ["emb-ivf"]
