"""Prefix suggestion (index + durable store + facade) vs a pure-Python
reference, including tombstone-shifted df after live deletes, and
store-served hybrid RRF parity."""

from __future__ import annotations

import random

import numpy as np
import pytest

from fornax_spark.fulltext.build import build_index_from_table
from fornax_spark.fulltext.query import suggest_terms
from fornax_spark.fulltext.segments import build_segments
from fornax_spark.fulltext.textproc import tokenize
from fornax_spark.fulltext.wand import (
    hybrid_topk_segments,
    suggest_terms_segments,
)

VOCAB = [
    "spark", "sparse", "span", "split", "sort", "scan",
    "join", "jump", "window", "wind", "table", "tab",
]


def _mk_docs(n: int, seed: int):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 20))))
        for i in range(n)
    ]


def _ref_suggest(docs, prefix, k):
    df: dict[str, int] = {}
    for _, t in docs:
        for term in set(tokenize(t)):
            if term.startswith(prefix):
                df[term] = df.get(term, 0) + 1
    return sorted(df.items(), key=lambda x: (-x[1], x[0]))[:k]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = _mk_docs(300, seed=13)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = build_index_from_table(df, "doc_id", "text").persist()
    yield docs, idx
    idx.postings.unpersist()


def test_suggest_terms_matches_reference(spark, corpus):
    docs, idx = corpus
    for prefix in ["sp", "s", "w", "tab", "zzz"]:
        got = [(r["term"], r["df"]) for r in
               suggest_terms(idx, prefix, k=5).collect()]
        assert got == _ref_suggest(docs, prefix, 5), prefix
    # normalization: uppercase prefix tokenizes to lowercase; empty /
    # punctuation-only / multi-token prefixes return nothing
    up = [(r["term"], r["df"]) for r in
          suggest_terms(idx, "SP", k=5).collect()]
    assert up == _ref_suggest(docs, "sp", 5)
    for bad in ["", "  ", "!!", "sp an"]:
        assert suggest_terms(idx, bad, k=5).count() == 0


def test_suggest_from_store_with_deletes(spark, corpus, tmp_path):
    """Store suggestions == index suggestions; after delete_docs the
    store's df is tombstone-shifted to equal a clean rebuild, and a
    term whose every doc died stops being suggested."""
    from fornax_spark.fulltext.deletes import delete_docs

    docs, idx = corpus
    # plant a term that lives ONLY in docs we will delete
    planted = [(1000 + j, "sporadic spark") for j in range(3)]
    all_docs = docs + planted
    full_idx = build_index_from_table(
        spark.createDataFrame(all_docs, "doc_id long, text string"),
        "doc_id", "text",
    )
    store = build_segments(spark, full_idx, str(tmp_path / "sg"), n_buckets=8)
    a = [(r["term"], r["df"]) for r in
         suggest_terms_segments(spark, store, "sp", k=10).collect()]
    b = [(r["term"], r["df"]) for r in
         suggest_terms(full_idx, "sp", k=10).collect()]
    assert a == b
    assert ("sporadic", 3) in a

    delete_docs(spark, store, [d for d, _ in planted])
    got = [(r["term"], r["df"]) for r in
           suggest_terms_segments(spark, store, "sp", k=10).collect()]
    assert got == _ref_suggest(docs, "sp", 10)
    assert all(t != "sporadic" for t, _ in got)


def test_hybrid_store_matches_index(spark, corpus, tmp_path):
    """hybrid_topk_segments == raw-index hybrid_topk bit for bit."""
    from fornax_spark.fulltext.hybrid import hybrid_topk

    docs, idx = corpus
    store = build_segments(spark, idx, str(tmp_path / "hg"), n_buckets=8)
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((len(docs), 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(1, len(docs))],
        "vec_id long, embedding array<float>",
    )
    qv = [float(x) for x in vecs[0]]
    a = hybrid_topk_segments(
        spark, store, emb, "spark join window", qv, k=8, depth=30
    ).collect()
    b = hybrid_topk(
        spark, idx, emb, "spark join window", qv, k=8, depth=30
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in a] == [
        (r["rank"], r["doc_id"]) for r in b
    ]
    for ra, rb in zip(a, b):
        assert abs(ra["rrf_score"] - rb["rrf_score"]) < 1e-12


def test_facade_suggest_and_hybrid(spark, tmp_path):
    """CorpusHandle.suggest / search_hybrid == the direct store calls."""
    from fornax_spark import Connection

    conn = Connection(str(tmp_path / "fx"), spark)
    docs = _mk_docs(120, seed=3)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    c = conn.create_corpus("sg").build(df, n_buckets=4)
    got = [(r["term"], r["df"]) for r in c.suggest("sp", k=4).collect()]
    assert got == _ref_suggest(docs, "sp", 4)

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((len(docs), 8))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(1, len(docs))],
        "vec_id long, embedding array<float>",
    )
    qv = [float(x) for x in vecs[0]]
    out = c.search_hybrid("spark join", qv, emb, k=5, depth=20).collect()
    direct = hybrid_topk_segments(
        spark, c._store(), emb, "spark join", qv, k=5, depth=20
    ).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in direct]
    assert len(out) > 0


def _ref_related(docs, seed, k, min_df):
    import math

    toks = {d: set(tokenize(t)) for d, t in docs}
    n = len(docs)
    seed_docs = {d for d, ts in toks.items() if seed in ts}
    df_s = len(seed_docs)
    df: dict[str, int] = {}
    co: dict[str, int] = {}
    for d, ts in toks.items():
        for t in ts:
            df[t] = df.get(t, 0) + 1
            if d in seed_docs and t != seed:
                co[t] = co.get(t, 0) + 1
    out = []
    for t, c in co.items():
        if c < min_df:
            continue
        ratio = (n * c) / (df_s * df[t])
        out.append((t, c, ratio, round(math.log(ratio), 6)))
    out.sort(key=lambda x: (-x[2], x[0]))
    return [(t, c, p) for t, c, _, p in out[:k]]


def test_related_terms_matches_reference(spark, corpus):
    from fornax_spark.fulltext.query import related_terms

    docs, idx = corpus
    got = [
        (r["term"], r["df_co"], r["pmi"])
        for r in related_terms(idx, "spark", k=8, min_df=2).collect()
    ]
    assert got == _ref_related(docs, "spark", 8, 2)
    # seed normalization + OOV + multi-token
    up = [
        (r["term"], r["df_co"], r["pmi"])
        for r in related_terms(idx, "SPARK", k=8, min_df=2).collect()
    ]
    assert up == got
    assert related_terms(idx, "zzznotaterm", k=5).count() == 0
    with pytest.raises(ValueError):
        related_terms(idx, "two terms")
    # min_df floor: raising it can only shrink the candidate set
    loose = {
        r["term"]
        for r in related_terms(idx, "spark", k=50, min_df=1).collect()
    }
    tight = {
        r["term"]
        for r in related_terms(idx, "spark", k=50, min_df=150).collect()
    }
    assert tight <= loose
    assert got and all(t != "spark" for t, _, _ in got)


def _ref_mlt(docs, doc_id, k, max_terms):
    import math

    from fornax_spark.fulltext import bm25

    toks = {d: tokenize(t) for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    src = toks.get(doc_id, [])
    weights = []
    for t in set(src):
        w = src.count(t) * math.log(
            1 + (n - df[t] + 0.5) / (df[t] + 0.5)
        )
        weights.append((t, w))
    weights.sort(key=lambda x: (-x[1], x[0]))
    qterms = [t for t, _ in weights[:max_terms]]
    scored = []
    for d, v in toks.items():
        if d == doc_id:
            continue
        s, hit = 0.0, False
        for t in sorted(set(qterms)):
            tf = v.count(t)
            if not tf:
                continue
            hit = True
            s += float(
                bm25.term_score(
                    np.array([tf]), np.array([len(v)]),
                    np.array([df[t]]), n, avgdl,
                )[0]
            )
        if hit:
            scored.append((d, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return [(i + 1, d, s) for i, (d, s) in enumerate(scored[:k])]


def test_more_like_this_matches_reference(spark, corpus):
    from fornax_spark.fulltext.query import mlt_query_terms, more_like_this

    docs, idx = corpus
    for doc_id, max_terms in [(5, 3), (17, 100)]:
        got = [
            (r["rank"], r["doc_id"], r["score"])
            for r in more_like_this(
                spark, idx, doc_id, k=8, max_terms=max_terms
            ).collect()
        ]
        want = _ref_mlt(docs, doc_id, 8, max_terms)
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want]
        for (_, _, a), (_, _, b) in zip(got, want):
            assert abs(a - b) < 1e-9
        assert all(d != doc_id for _, d, _ in got)
    # unknown doc -> no rows; term selection is deterministic
    assert more_like_this(spark, idx, 10**9, k=5).count() == 0
    a = mlt_query_terms(idx, 5, max_terms=4)
    assert a == mlt_query_terms(idx, 5, max_terms=4)
    assert len(a) <= 4


def test_hybrid_batch_equals_per_query(spark, corpus, tmp_path):
    """hybrid_topk_batch_segments == per-query hybrid_topk_segments for
    every query_id, including an OOV-text (dense-only) query."""
    from fornax_spark.fulltext.wand import hybrid_topk_batch_segments

    docs, idx = corpus
    store = build_segments(spark, idx, str(tmp_path / "hb"), n_buckets=8)
    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((len(docs), 12))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(1, len(docs))],
        "vec_id long, embedding array<float>",
    )
    queries = [
        {"text": "spark join window", "vec": [float(x) for x in vecs[0]]},
        {"text": "table hash", "vec": [float(x) for x in vecs[1]]},
        {"text": "zzznotaterm", "vec": [float(x) for x in vecs[2]]},
        {"text": "sort", "vec": [float(x) for x in vecs[3]]},
    ]
    out = hybrid_topk_batch_segments(
        spark, store, emb, queries, k=7, depth=25
    ).collect()
    by_qid: dict[int, list] = {}
    for r in out:
        by_qid.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["rrf_score"])
        )
    for qid, q in enumerate(queries):
        single = [
            (r["rank"], r["doc_id"], r["rrf_score"])
            for r in hybrid_topk_segments(
                spark, store, emb, q["text"], q["vec"], k=7, depth=25
            ).collect()
        ]
        got = by_qid.get(qid, [])
        assert [(r, d) for r, d, _ in got] == [
            (r, d) for r, d, _ in single
        ], f"query {qid}"
        for (_, _, a), (_, _, b) in zip(got, single):
            assert abs(a - b) < 1e-12
    assert hybrid_topk_batch_segments(spark, store, emb, [], k=5).count() == 0


def test_mlt_batch_equals_per_doc(spark, corpus):
    from fornax_spark.fulltext.query import more_like_this, more_like_this_batch

    docs, idx = corpus
    doc_ids = [5, 17, 10**9, 5]  # incl. unknown + duplicate source
    out = more_like_this_batch(
        spark, idx, doc_ids, k=6, max_terms=4
    ).collect()
    by_qid: dict[int, list] = {}
    for r in out:
        by_qid.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    assert 2 not in by_qid  # unknown source -> no rows
    for qid, d in enumerate(doc_ids):
        single = [
            (r["rank"], r["doc_id"], r["score"])
            for r in more_like_this(
                spark, idx, d, k=6, max_terms=4
            ).collect()
        ]
        got = by_qid.get(qid, [])
        assert [(r, x) for r, x, _ in got] == [
            (r, x) for r, x, _ in single
        ], f"query {qid}"
        for (_, _, a), (_, _, b) in zip(got, single):
            assert abs(a - b) < 1e-9
    assert by_qid[0] == by_qid[3]  # duplicate sources agree
    assert more_like_this_batch(spark, idx, [], k=3).count() == 0


def test_cosine_topk_batch_equals_per_query(spark):
    from fornax_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_batch,
    )

    rng = np.random.default_rng(33)
    vecs = rng.standard_normal((250, 12))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(250)],
        "vec_id long, embedding array<float>",
    ).repartition(7)  # several Arrow batches -> local-topk merge path
    qs = [[float(x) for x in rng.standard_normal(12)] for _ in range(3)]
    out = cosine_topk_batch(emb, qs, depth=9).collect()
    by_qid: dict[int, list] = {}
    for r in out:
        by_qid.setdefault(r["query_id"], []).append(
            (r["rank"], r["id"], r["cosine"])
        )
    for qid, q in enumerate(qs):
        single = [
            (i + 1, r["id"], r["cosine"])
            for i, r in enumerate(cosine_topk(emb, q, k=9).collect())
        ]
        assert by_qid[qid] == single, f"query {qid}"
    with pytest.raises(ValueError):
        cosine_topk_batch(emb, [], depth=5)
