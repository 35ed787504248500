"""Segment store + block-max scorer invariants (SURVEY.md §5 plan):

  1. segment path top-k == oracle top-k (rank- and score-identical)
  2. pruned (MaxScore/block-max) == exhaustive — the WAND==exhaustive
     invariant
  3. resume-from-checkpoint build == clean build (posting-for-posting)
  4. N-bucket build == M-bucket build (partitioning invariance), the
     analogue of the reference's batched==unbatched equivalence test
     (/root/reference/test/test_select.py:211-258)
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
from fornax_spark.fulltext.segments import build_segments, open_segments
from fornax_spark.fulltext.wand import search_segments


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pages = generate_pages(600, seed=43)
    idx = build_index(spark, pages_to_spark(spark, pages, partitions=8))
    path = str(tmp_path_factory.mktemp("seg"))
    store = build_segments(spark, idx, path, n_buckets=16, group_size=8)
    oidx = oracle.build_index(pages)
    yield spark, idx, store, oidx, pages
    idx.postings.unpersist()


def _collect(df):
    return [(r["rank"], r["doc_id"], r["score"]) for r in df.collect()]


def test_segment_batch_search_matches_oracle(built):
    """Full reference query set, one distributed pass, rank- and
    score-identical to the oracle."""
    spark, _idx, store, oidx, _pages = built
    from fornax_spark.fulltext.wand import search_segments_batch

    queries = reference_queries()
    golden = oracle.golden_results(oidx, queries)
    got = search_segments_batch(spark, store, queries).toPandas()
    assert got["query_id"].tolist() == golden["query_id"].tolist()
    assert got["rank"].tolist() == golden["rank"].tolist()
    assert got["doc_id"].tolist() == golden["doc_id"].tolist()
    assert got["score"].tolist() == golden["score"].tolist()


def test_segment_single_search_matches_oracle(built):
    spark, _idx, store, oidx, _pages = built
    for qt, k in [("term00000", 10), ("term00001 term00500 term03000", 10),
                  ("zzzznotaterm", 5)]:
        got = _collect(search_segments(spark, store, qt, k=k))
        want = [
            (i + 1, d, s)
            for i, (d, s) in enumerate(oracle.query_topk(oidx, qt, k))
        ]
        assert got == want, qt


def test_batch_pruned_equals_exhaustive_equals_single(built):
    """Metamorphic: batch-pruned == batch-exhaustive == per-query single
    path, all three bit-identical (same kernel by construction, but this
    guards the decode-cache sharing and per-query pruning state)."""
    spark, _idx, store, _oidx, _pages = built
    import pandas as pd

    from fornax_spark.fulltext.wand import search_segments_batch

    qtexts = [
        "term00000 term00001",
        "term00002 term01000 term04000",
        "term00000",
        "zzzznotaterm",
    ]
    qpdf = pd.DataFrame(
        {"query_id": range(len(qtexts)), "query_text": qtexts, "k": 7}
    )
    pruned = search_segments_batch(spark, store, qpdf, prune=True).collect()
    exhaust = search_segments_batch(spark, store, qpdf, prune=False).collect()
    assert [tuple(r) for r in pruned] == [tuple(r) for r in exhaust]
    singles = []
    for qid, qt in enumerate(qtexts):
        for r in search_segments(spark, store, qt, k=7).collect():
            singles.append((qid, r["rank"], r["doc_id"], r["score"]))
    assert [tuple(r) for r in pruned] == singles


def test_pruned_equals_exhaustive(built):
    spark, _idx, store, _oidx, _pages = built
    for qt in ["term00000 term00001", "term00002 term01000 term04000"]:
        a = _collect(search_segments(spark, store, qt, k=10, prune=True))
        b = _collect(search_segments(spark, store, qt, k=10, prune=False))
        assert a == b, qt


def test_resume_equals_clean(built, tmp_path):
    spark, idx, _store, _oidx, _pages = built
    clean = str(tmp_path / "clean")
    resumed = str(tmp_path / "resumed")
    build_segments(spark, idx, clean, n_buckets=8, group_size=2)
    with pytest.raises(RuntimeError, match="injected failure"):
        build_segments(
            spark, idx, resumed, n_buckets=8, group_size=2, fail_after_groups=2
        )
    build_segments(spark, idx, resumed, n_buckets=8, group_size=2)

    a = open_segments(clean).blocks(spark)
    b = open_segments(resumed).blocks(spark)
    cols = ["bucket", "term_id", "block_id", "n", "df", "first_doc", "last_doc"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )
    # blob-level identity too (posting-for-posting)
    ab = {tuple(r[:3]): (bytes(r[3]), bytes(r[4]), bytes(r[5]))
          for r in a.select("bucket", "term_id", "block_id", "doc_blob", "tf_blob", "dl_blob").collect()}
    bb = {tuple(r[:3]): (bytes(r[3]), bytes(r[4]), bytes(r[5]))
          for r in b.select("bucket", "term_id", "block_id", "doc_blob", "tf_blob", "dl_blob").collect()}
    assert ab == bb


def test_carry_df_build_bit_identical(built, tmp_path):
    """Past the vocabulary-broadcast gate the build switches to carry
    mode: shuffle dictionary join, df carried through the layout
    exchange, nothing vocabulary-sized on the driver or broadcast.
    Forcing the gate to 0 must produce a bit-identical store (blobs
    included) and record the mode in the ledger."""
    import json
    import os

    spark, idx, _store, oidx, _pages = built
    bpath = str(tmp_path / "bcast")
    cpath = str(tmp_path / "carry")
    build_segments(spark, idx, bpath, n_buckets=8)
    cstore = build_segments(
        spark, idx, cpath, n_buckets=8, vocab_broadcast_max_terms=0
    )
    with open(os.path.join(bpath, "ledger.json")) as f:
        assert json.load(f)["df_attach"] == "broadcast"
    with open(os.path.join(cpath, "ledger.json")) as f:
        assert json.load(f)["df_attach"] == "carry"

    a = open_segments(bpath).blocks(spark)
    b = open_segments(cpath).blocks(spark)
    key = ["bucket", "term_id", "block_id"]
    full = key + ["n", "df", "first_doc", "last_doc", "block_max",
                  "doc_blob", "tf_blob", "dl_blob"]
    ab = {tuple(r[:3]): tuple(r[3:8]) + tuple(bytes(x) for x in r[8:])
          for r in a.select(full).collect()}
    bb = {tuple(r[:3]): tuple(r[3:8]) + tuple(bytes(x) for x in r[8:])
          for r in b.select(full).collect()}
    assert ab == bb
    # and the carry-built store answers queries identically to the oracle
    for qt in ["term00000 term00050", "term00003"]:
        want = [
            (i + 1, d, s)
            for i, (d, s) in enumerate(oracle.query_topk(oidx, qt, 10))
        ]
        assert _collect(search_segments(spark, cstore, qt, k=10)) == want, qt


def test_bucket_count_invariance(built, tmp_path):
    spark, idx, _store, oidx, _pages = built
    s4 = build_segments(spark, idx, str(tmp_path / "b4"), n_buckets=4)
    for qt in ["term00000 term00050", "term00003"]:
        want = [
            (i + 1, d, s)
            for i, (d, s) in enumerate(oracle.query_topk(oidx, qt, 10))
        ]
        assert _collect(search_segments(spark, s4, qt, k=10)) == want


def test_resume_layout_mismatch_wipes_store(built, tmp_path):
    """Re-running into an existing store with a DIFFERENT layout must not
    mix old bucket dirs with new ones — the store is wiped and rebuilt
    (ADVICE round 1: stale bucket=N dirs read back as valid blocks)."""
    import os

    spark, idx, _store, oidx, _pages = built
    path = str(tmp_path / "relayout")
    build_segments(spark, idx, path, n_buckets=16)
    assert os.path.exists(os.path.join(path, "segments", "bucket=15"))
    # shrink the layout: buckets 4..15 would be stale leftovers
    s4 = build_segments(spark, idx, path, n_buckets=4)
    assert not os.path.exists(os.path.join(path, "segments", "bucket=15"))
    assert s4.n_buckets == 4
    want = [
        (i + 1, d, s)
        for i, (d, s) in enumerate(oracle.query_topk(oidx, "term00000", 10))
    ]
    assert _collect(search_segments(spark, s4, "term00000", k=10)) == want


def test_single_bucket_store(built, tmp_path):
    """n_buckets=1 (shift==64 edge case) must agree with the oracle."""
    spark, idx, _store, oidx, _pages = built
    from fornax_spark.fulltext.segments import bucket_of_doc

    s1 = build_segments(spark, idx, str(tmp_path / "b1"), n_buckets=1)
    assert bucket_of_doc(-12345, 1) == 0
    want = [
        (i + 1, d, s)
        for i, (d, s) in enumerate(oracle.query_topk(oidx, "term00001", 10))
    ]
    assert _collect(search_segments(spark, s1, "term00001", k=10)) == want


def test_ledger_metrics(built):
    _spark, _idx, store, _oidx, _pages = built
    import json
    import os

    with open(os.path.join(store.path, "ledger.json")) as f:
        ledger = json.load(f)
    assert ledger["stats"]["n_docs"] == 600
    assert ledger["bytes_compressed_total"] > 0
    total_postings = sum(g["postings"] for g in ledger["groups"].values())
    assert total_postings > 0
    for g in ledger["groups"].values():
        assert g["status"] == "done"
        assert g["build_secs"] > 0
        assert g["lineage"]["code_version"]


def test_bucketed_table_staleness_guard(spark, tmp_path):
    """VERDICT r5 item 3: the bucketed table is a frozen snapshot — if
    the directory store's segments change after publish (rebuild/merge
    in place rewrites the ledger), the stale snapshot must NOT be
    silently served: open_bucketed_table refuses with
    StaleBucketedTableError. Live deletes (tombstones) do NOT trip the
    guard — they're applied at query time, not baked into the table."""
    from fornax_spark.fulltext.build import build_index_from_table
    from fornax_spark.fulltext.deletes import delete_docs
    from fornax_spark.fulltext.segments import (
        StaleBucketedTableError,
        as_bucketed_table,
        open_bucketed_table,
    )

    path = str(tmp_path / "stale")
    docs_a = spark.createDataFrame(
        [(i, f"alpha beta tok{i % 13}") for i in range(120)],
        "doc_id long, text string",
    )
    idx_a = build_index_from_table(docs_a)
    store = build_segments(spark, idx_a, path, n_buckets=4)
    as_bucketed_table(spark, store, "stale_guard_tbl")

    # deletes keep the snapshot valid (tombstones live in the directory)
    delete_docs(spark, open_segments(path), [0, 1])
    reopened = open_bucketed_table(spark, path)
    got = {r["doc_id"] for r in search_segments(spark, reopened, "alpha", k=5).collect()}
    assert got and 0 not in got and 1 not in got

    # rebuild IN PLACE with a different corpus: the table still holds
    # corpus A's blocks but the directory now holds corpus B — serving
    # the old snapshot under the new stats would be silent corruption
    docs_b = spark.createDataFrame(
        [(1000 + i, f"gamma delta tok{i % 7}") for i in range(80)],
        "doc_id long, text string",
    )
    idx_b = build_index_from_table(docs_b)
    build_segments(spark, idx_b, path, n_buckets=4)
    with pytest.raises(StaleBucketedTableError, match="fingerprint"):
        open_bucketed_table(spark, path)

    idx_a.postings.unpersist()
    idx_b.postings.unpersist()
    spark.sql("DROP TABLE IF EXISTS stale_guard_tbl")


def test_bucket_of_docs_np_parity():
    """The kernel's vectorized bucket derivation must equal the scalar
    bucket_of_doc and hence the JVM bucket_col expression for every
    sign/extreme — the encode shuffle drops the bucket column on the
    strength of this identity."""
    import numpy as np

    from fornax_spark.fulltext.segments import bucket_of_doc, bucket_of_docs_np

    rng = np.random.default_rng(7)
    docs = np.concatenate([
        rng.integers(-(2**63), 2**63 - 1, size=5000, dtype=np.int64),
        np.array([0, 1, -1, 2**63 - 1, -(2**63), 42, -42], dtype=np.int64),
    ])
    for n_buckets in (1, 2, 16, 64, 1024):
        want = np.array(
            [bucket_of_doc(int(d), n_buckets) for d in docs], dtype=np.int64
        )
        got = bucket_of_docs_np(docs, n_buckets)
        assert (got == want).all(), n_buckets


def test_term_cache_matches_scan(built):
    """load_term_cache turns query-term lookup into a driver dict probe:
    lookups (incl. OOV) and full search results must be bit-identical to
    the pushed-filter scan path, and the size gate must refuse oversized
    vocabularies without installing a cache."""
    spark, _idx, store, _oidx, _pages = built

    fresh = open_segments(store.path)
    probe = ["term00000", "term00001", "zzzznotaterm"]
    want_ids = fresh.term_ids(spark, probe)
    q = "term00000 term00001 term03000"
    want = _collect(search_segments(spark, fresh, q, k=10))

    gated = open_segments(store.path)
    assert gated.load_term_cache(spark, max_terms=1) is False
    assert gated._term_cache is None  # scan path untouched

    cached = open_segments(store.path)
    assert cached.load_term_cache(spark) is True
    assert cached.term_ids(spark, probe) == want_ids
    assert cached.term_ids(spark, []) == {}
    assert _collect(search_segments(spark, cached, q, k=10)) == want


def test_huge_batch_broadcast_k_filter_matches_small_batches(built):
    """Batches past 2000 queries switch from the literal-map k-filter to
    a broadcast join (expression-size limit); the switch must be
    invisible: one 2050-query call == the same queries split across two
    sub-2000 calls, row for row."""
    import pandas as pd

    from fornax_spark.fulltext.wand import search_segments_batch

    spark, _idx, store, _oidx, _pages = built
    q1 = reference_queries()
    reps = -(-2050 // len(q1))  # ceil to pass the 2000 threshold
    big = pd.concat(
        [q1.assign(query_id=q1["query_id"] + i * len(q1)) for i in range(reps)],
        ignore_index=True,
    ).head(2050)
    assert len(big) > 2000
    got = search_segments_batch(spark, store, big).toPandas()
    lo = search_segments_batch(spark, store, big.head(1025)).toPandas()
    hi = search_segments_batch(spark, store, big.tail(len(big) - 1025)).toPandas()
    want = pd.concat([lo, hi], ignore_index=True)
    assert got["query_id"].tolist() == want["query_id"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score"].tolist() == want["score"].tolist()


def test_parquet_codec_knob(built, tmp_path):
    """build_segments(parquet_codec=...) threads through to the file
    writer (ledger records it, files stay readable, results identical);
    a FILE property only — never part of the wipe-triggering stats."""
    import json as _json
    import os as _os

    spark, idx, store, _oidx, _pages = built
    path = str(tmp_path / "zstd_store")
    zs = build_segments(spark, idx, path, n_buckets=16, group_size=8,
                        parquet_codec="zstd")
    with open(_os.path.join(path, "ledger.json")) as f:
        led = _json.load(f)
    assert led["parquet_codec"] == "zstd"
    assert "parquet_codec" not in led["stats"]
    q = "term00000 term00001 term03000"
    assert _collect(search_segments(spark, zs, q, k=10)) == _collect(
        search_segments(spark, store, q, k=10)
    )
