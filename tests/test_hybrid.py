"""Hybrid RRF retrieval vs a pure-Python reference (numpy cosine +
the shared bm25 kernel; fusion math re-derived here from the RRF
definition, SIGIR'09)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from fornax_spark.fulltext import bm25
from fornax_spark.fulltext.build import build_index_from_table
from fornax_spark.fulltext.hybrid import hybrid_topk, rrf_fuse
from fornax_spark.fulltext.textproc import tokenize

VOCAB = ["spark", "join", "window", "table", "hash", "scan", "agg", "row"]
DIM = 16


def _mk_corpus(n: int, seed: int):
    rng = random.Random(seed)
    nrng = np.random.default_rng(seed)
    docs = [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 30))))
        for i in range(n)
    ]
    vecs = nrng.standard_normal((n, DIM)).astype(np.float32)
    return docs, vecs


def _ref_lex_ranks(docs, qterms, depth):
    toks = {d: tokenize(t) for d, t in docs}
    n_docs = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df = {
        t: sum(1 for v in toks.values() if t in v) for t in set(qterms)
    }
    scored = []
    for d, v in toks.items():
        s, hit = 0.0, False
        for t in sorted(set(qterms)):
            tf = v.count(t)
            if not tf or not df[t]:
                continue
            hit = True
            s += float(
                bm25.term_score(
                    np.array([tf]), np.array([len(v)]),
                    np.array([df[t]]), n_docs, avgdl,
                )[0]
            )
        if hit:
            scored.append((d, s))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return {d: i + 1 for i, (d, _) in enumerate(scored[:depth])}


def _ref_dense_ranks(vecs, qv, depth, skip_id):
    qn = qv / np.linalg.norm(qv)
    cos = []
    for i, v in enumerate(vecs):
        if i == skip_id:
            continue
        cos.append((i, float(np.dot(v / np.linalg.norm(v), qn))))
    cos.sort(key=lambda x: (-x[1], x[0]))
    return {d: i + 1 for i, (d, _) in enumerate(cos[:depth])}


def _ref_rrf(rank_maps, k, k_rrf=60):
    score: dict[int, float] = {}
    for m in rank_maps:
        for d, r in m.items():
            score[d] = score.get(d, 0.0) + 1.0 / (k_rrf + r)
    out = sorted(score.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [(i + 1, d, s) for i, (d, s) in enumerate(out)]


def test_rrf_fuse_hand_lists(spark):
    """Docs in one list only, overlapping docs, and a doc_id tiebreak
    (same fused score) — against hand-computed RRF."""
    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(20, 1), (40, 2), (50, 3)], "doc_id long, rank int"
    )
    got = [tuple(r) for r in rrf_fuse([a, b], k=10).collect()]
    want = _ref_rrf(
        [{10: 1, 20: 2, 30: 3}, {20: 1, 40: 2, 50: 3}], k=10
    )
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want]
    for (_, _, x), (_, _, y) in zip(got, want):
        assert abs(x - y) < 1e-12
    # 10 and 50 share rank profiles {1} vs {3}: distinct scores; force a
    # true tie — two docs each appearing once at the same rank
    c = spark.createDataFrame([(7, 1)], "doc_id long, rank int")
    d = spark.createDataFrame([(3, 1)], "doc_id long, rank int")
    tied = [(r["rank"], r["doc_id"]) for r in rrf_fuse([c, d], k=2).collect()]
    assert tied == [(1, 3), (2, 7)]
    with pytest.raises(ValueError):
        rrf_fuse([], k=3)


def test_hybrid_topk_matches_reference(spark):
    docs, vecs = _mk_corpus(300, seed=11)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = build_index_from_table(df, "doc_id", "text")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    ).filter("vec_id <> 0")
    qv = [float(x) for x in vecs[0]]
    query = "spark join window"

    got = [
        (r["rank"], r["doc_id"], r["rrf_score"])
        for r in hybrid_topk(
            spark, idx, emb, query, qv, k=10, depth=40
        ).collect()
    ]
    lexr = _ref_lex_ranks(docs, tokenize(query), depth=40)
    denr = _ref_dense_ranks(
        np.array([np.array(v, dtype=np.float64) for v in vecs]),
        np.array(qv, dtype=np.float64),
        depth=40,
        skip_id=0,
    )
    want = _ref_rrf([lexr, denr], k=10)
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want]
    for (_, _, x), (_, _, y) in zip(got, want):
        assert abs(x - y) < 1e-12
    # determinism
    again = [
        (r["rank"], r["doc_id"])
        for r in hybrid_topk(
            spark, idx, emb, query, qv, k=10, depth=40
        ).collect()
    ]
    assert again == [(r, d) for r, d, _ in got]


def test_hybrid_oov_query_is_dense_only(spark):
    """OOV text query -> the lexical leg is empty and the hybrid result
    IS the dense ranking (rank order preserved)."""
    docs, vecs = _mk_corpus(80, seed=5)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = build_index_from_table(df, "doc_id", "text")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    ).filter("vec_id <> 0")
    qv = [float(x) for x in vecs[0]]
    got = [
        r["doc_id"]
        for r in hybrid_topk(
            spark, idx, emb, "zzznotaterm", qv, k=5, depth=20
        ).collect()
    ]
    denr = _ref_dense_ranks(
        np.array([np.array(v, dtype=np.float64) for v in vecs]),
        np.array(qv, dtype=np.float64),
        depth=20,
        skip_id=0,
    )
    want = [d for d, _ in sorted(denr.items(), key=lambda x: x[1])[:5]]
    assert got == want
