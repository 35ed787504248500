"""Boolean (MUST/SHOULD/MUST_NOT) and term-weighted BM25 retrieval vs
an independent pure-Python reference (shared tokenizer + bm25 kernel
only — candidate logic is re-derived here from the definition)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from fornax_spark.fulltext import bm25
from fornax_spark.fulltext.build import build_index_from_table
from fornax_spark.fulltext.query import search, search_boolean, search_weighted
from fornax_spark.fulltext.textproc import tokenize

VOCAB = ["spark", "join", "window", "table", "hash", "scan", "agg", "row"]


def _mk_docs(n: int, seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 30))))
        for i in range(n)
    ]


def _corpus_stats(docs):
    toks = {d: tokenize(t) for d, t in docs}
    n_docs = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n_docs if n_docs else 0.0
    return toks, n_docs, avgdl


def _ref_topk(docs, weights, must, ban, k):
    """weights: term -> w (scoring terms, ascending-term accumulation);
    must/ban: sets of filter terms."""
    toks, n_docs, avgdl = _corpus_stats(docs)
    df = {}
    for t in set(weights) | set(must) | set(ban):
        df[t] = sum(1 for v in toks.values() if t in v)
    out = []
    for d, v in toks.items():
        present = set(v)
        if must - present or (ban & present):
            continue
        score = 0.0
        hit = False
        for t in sorted(weights):
            tf = v.count(t)
            if not tf:
                continue
            hit = True
            score += weights[t] * float(
                bm25.term_score(
                    np.array([tf]),
                    np.array([len(v)]),
                    np.array([df[t]]),
                    n_docs,
                    avgdl,
                )[0]
            )
        if hit:
            out.append((d, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.fixture(scope="module")
def corpus(spark):
    docs = _mk_docs(350, seed=41)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    idx = build_index_from_table(df, "doc_id", "text").persist()
    yield docs, idx
    idx.postings.unpersist()


@pytest.mark.parametrize(
    "should,must,must_not",
    [
        ("spark join", "table", "row"),
        ("spark join window", "", "agg"),
        ("", "spark join", ""),  # must-only: must terms score
        ("hash", "scan table", "spark join"),
        ("window", "zzz", ""),  # absent must term -> no hits
    ],
)
def test_boolean_equals_reference(spark, corpus, should, must, must_not):
    docs, idx = corpus
    m, s, b = (
        set(tokenize(must)),
        set(tokenize(should)),
        set(tokenize(must_not)),
    )
    weights = {t: 1.0 for t in m | s}
    want = _ref_topk(docs, weights, m, b, k=12)
    got = [
        (r["doc_id"], r["score"])
        for r in search_boolean(
            spark, idx, should=should, must=must, must_not=must_not, k=12
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, w) in zip(got, want):
        assert abs(a - w) < 1e-9


def test_boolean_validation(spark, corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match="scored and banned"):
        search_boolean(spark, idx, should="spark", must_not="spark")
    assert search_boolean(spark, idx).count() == 0  # empty query
    # no-must + no-should but with must_not alone is still empty
    assert search_boolean(spark, idx, must_not="spark").count() == 0


def test_weighted_equals_reference(spark, corpus):
    docs, idx = corpus
    weights = {"spark": 1.0, "join": 0.5, "window": 0.125}
    want = _ref_topk(docs, weights, set(), set(), k=12)
    got = [
        (r["doc_id"], r["score"])
        for r in search_weighted(spark, idx, weights, k=12).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, w) in zip(got, want):
        assert abs(a - w) < 1e-9


def test_weighted_all_ones_equals_plain_search(spark, corpus):
    _, idx = corpus
    a = search_weighted(
        spark, idx, {"spark": 1.0, "join": 1.0, "window": 1.0}, k=10
    ).collect()
    b = search(spark, idx, "spark join window", k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_weighted_validation(spark, corpus):
    _, idx = corpus
    with pytest.raises(ValueError, match=r"in \(0, 1\]"):
        search_weighted(spark, idx, {"spark": 0.0})
    with pytest.raises(ValueError, match=r"in \(0, 1\]"):
        search_weighted(spark, idx, {"spark": 1.5})
    with pytest.raises(ValueError, match="single term"):
        search_weighted(spark, idx, {"spark join": 1.0})
    assert search_weighted(spark, idx, {}).count() == 0


def test_decode_postings_roundtrip(spark, corpus, tmp_path):
    """Store -> decode_postings == the postings the store was built
    from (full export and pruned-term forms)."""
    from fornax_spark.fulltext.segments import build_segments
    from fornax_spark.fulltext.wand import decode_postings

    docs, idx = corpus
    store = build_segments(spark, idx, str(tmp_path / "st"), n_buckets=8)
    want = sorted(
        tuple(r)
        for r in idx.postings.select("term", "doc_id", "tf", "dl").collect()
    )
    got = sorted(tuple(r) for r in decode_postings(spark, store).collect())
    assert got == want
    some = sorted(
        tuple(r)
        for r in decode_postings(spark, store, ["spark", "join", "zzz"]).collect()
    )
    assert some == [r for r in want if r[0] in ("spark", "join")]
    assert decode_postings(spark, store, ["zzz"]).count() == 0


def test_boolean_weighted_from_store_match_index(spark, corpus, tmp_path):
    """Store-served boolean/weighted == raw-index path, before AND
    after live deletes (vs a clean rebuild without the docs)."""
    from fornax_spark.fulltext.deletes import delete_docs
    from fornax_spark.fulltext.segments import build_segments
    from fornax_spark.fulltext.wand import (
        search_boolean_segments,
        search_weighted_segments,
    )

    docs, idx = corpus
    store = build_segments(spark, idx, str(tmp_path / "st"), n_buckets=8)
    kw = dict(should="spark join", must="table", must_not="row", k=12)
    a = search_boolean_segments(spark, store, **kw).collect()
    b = search_boolean(spark, idx, **kw).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    wts = {"spark": 1.0, "join": 0.5}
    aw = search_weighted_segments(spark, store, wts, k=12).collect()
    bw = search_weighted(spark, idx, wts, k=12).collect()
    assert [tuple(r) for r in aw] == [tuple(r) for r in bw]

    # live deletes: kill the current top-2 boolean hits, compare against
    # a clean rebuild over the survivors
    dead = [r["doc_id"] for r in a[:2]]
    delete_docs(spark, store, dead)
    surv = [(d, t) for d, t in docs if d not in set(dead)]
    idx2 = build_index_from_table(
        spark.createDataFrame(surv, "doc_id long, text string"),
        "doc_id",
        "text",
    )
    a2 = search_boolean_segments(spark, store, **kw).collect()
    b2 = search_boolean(spark, idx2, **kw).collect()
    assert [(r["rank"], r["doc_id"]) for r in a2] == [
        (r["rank"], r["doc_id"]) for r in b2
    ]
    for ra, rb in zip(a2, b2):
        assert abs(ra["score"] - rb["score"]) < 1e-9
    aw2 = search_weighted_segments(spark, store, wts, k=12).collect()
    bw2 = search_weighted(spark, idx2, wts, k=12).collect()
    assert [(r["rank"], r["doc_id"]) for r in aw2] == [
        (r["rank"], r["doc_id"]) for r in bw2
    ]
    for ra, rb in zip(aw2, bw2):
        assert abs(ra["score"] - rb["score"]) < 1e-9


def test_facet_counts_equals_reference(spark):
    """Facets over the full any-term match set vs a literal Python
    reference, including the empty-query and OOV cases."""
    from fornax_spark.fulltext.query import facet_counts

    rng = random.Random(61)
    docs = [
        (
            i,
            " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, 20))),
            rng.choice(["en", "de", "fr"]),
        )
        for i in range(300)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    idx = build_index_from_table(df, "doc_id", "text")
    for q in ["spark join", "window", "zzz", ""]:
        terms = set(tokenize(q))
        want = {}
        for _, text, lang in [d for d in docs if terms & set(tokenize(d[1]))]:
            want[lang] = want.get(lang, 0) + 1
        got = {
            r["lang"]: r["n_docs"]
            for r in facet_counts(spark, idx, df, q, "lang").collect()
        }
        assert got == want


def test_boolean_batch_from_store_matches_index(spark, corpus, tmp_path):
    """search_boolean_batch_segments == raw-index batch path bit for
    bit, before and after live deletes."""
    from fornax_spark.fulltext.deletes import delete_docs
    from fornax_spark.fulltext.query import search_boolean_batch
    from fornax_spark.fulltext.segments import build_segments
    from fornax_spark.fulltext.wand import search_boolean_batch_segments

    docs, idx = corpus
    store = build_segments(spark, idx, str(tmp_path / "stb"), n_buckets=8)
    queries = [
        {"should": "spark join", "must": "table", "must_not": "row"},
        {"must": "hash scan"},
        {},
        {"should": "window agg", "must_not": "table"},
    ]
    a = search_boolean_batch_segments(spark, store, queries, k=9).collect()
    b = search_boolean_batch(spark, idx, queries, k=9).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0

    dead = [r["doc_id"] for r in a[:2]]
    delete_docs(spark, store, dead)
    surv = [(d, t) for d, t in docs if d not in set(dead)]
    idx2 = build_index_from_table(
        spark.createDataFrame(surv, "doc_id long, text string"),
        "doc_id",
        "text",
    )
    a2 = search_boolean_batch_segments(spark, store, queries, k=9).collect()
    b2 = search_boolean_batch(spark, idx2, queries, k=9).collect()
    assert [(r["query_id"], r["rank"], r["doc_id"]) for r in a2] == [
        (r["query_id"], r["rank"], r["doc_id"]) for r in b2
    ]
    for ra, rb in zip(a2, b2):
        assert abs(ra["score"] - rb["score"]) < 1e-9


def test_boolean_batch_equals_per_query(spark, corpus):
    """search_boolean_batch == per-query search_boolean for every
    query_id, with empty queries skipped and shared terms across
    queries handled independently."""
    from fornax_spark.fulltext.query import search_boolean_batch

    _, idx = corpus
    queries = [
        {"should": "spark join", "must": "table", "must_not": "row"},
        {"should": "spark join window", "must_not": "agg"},
        {"must": "spark join"},
        {"should": "hash", "must": "scan table", "must_not": "spark join"},
        {},  # empty -> no rows for this query_id
        {"should": "window", "must": "zzz"},  # absent must -> no hits
    ]
    out = search_boolean_batch(spark, idx, queries, k=7).collect()
    by_qid: dict[int, list] = {}
    for r in out:
        by_qid.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for qid, q in enumerate(queries):
        single = [
            (r["rank"], r["doc_id"], r["score"])
            for r in search_boolean(
                spark, idx,
                should=q.get("should", ""), must=q.get("must", ""),
                must_not=q.get("must_not", ""), k=7,
            ).collect()
        ]
        got = by_qid.get(qid, [])
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in single]
        for (_, _, a), (_, _, b) in zip(got, single):
            assert abs(a - b) < 1e-12
    with pytest.raises(ValueError, match="scored and banned"):
        search_boolean_batch(
            spark, idx, [{"should": "spark", "must_not": "spark"}]
        )
    assert search_boolean_batch(spark, idx, [{}, {}]).count() == 0


def test_weighted_batch_equals_per_query(spark, corpus, tmp_path):
    """search_weighted_batch == per-query search_weighted; store form
    == index form; weight/term contract violations raise."""
    from fornax_spark.fulltext.query import search_weighted_batch
    from fornax_spark.fulltext.segments import build_segments
    from fornax_spark.fulltext.wand import search_weighted_batch_segments

    docs, idx = corpus
    queries = [
        {"spark": 1.0, "join": 0.5},
        {"table": 0.25, "hash": 1.0, "scan": 0.75},
        {},
        {"WINDOW": 0.9},  # normalization
    ]
    out = search_weighted_batch(spark, idx, queries, k=8).collect()
    by_qid: dict[int, list] = {}
    for r in out:
        by_qid.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    assert 2 not in by_qid
    for qid, q in enumerate(queries):
        if not q:
            continue
        single = [
            (r["rank"], r["doc_id"], r["score"])
            for r in search_weighted(spark, idx, q, k=8).collect()
        ]
        got = by_qid.get(qid, [])
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in single]
        for (_, _, a), (_, _, b) in zip(got, single):
            assert abs(a - b) < 1e-12

    store = build_segments(spark, idx, str(tmp_path / "wb"), n_buckets=8)
    a = search_weighted_batch_segments(spark, store, queries, k=8).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in out]

    with pytest.raises(ValueError, match="0, 1"):
        search_weighted_batch(spark, idx, [{"spark": 1.5}])
    with pytest.raises(ValueError, match="single term"):
        search_weighted_batch(spark, idx, [{"two terms": 0.5}])
    assert search_weighted_batch(spark, idx, [{}, {}]).count() == 0


def test_search_collapsed_matches_reference(spark, corpus):
    """Duplicate-collapsed search == python reference: one result per
    cluster (best score, doc ASC tiebreak), singletons pass through,
    collapse applies BEFORE the top-k cut."""
    from fornax_spark.fulltext.query import search_collapsed

    docs, idx = corpus
    # hand-made clusters: every doc_id < 100 collapses into buckets of 5
    cl = [(d, (d // 5) * 5) for d, _ in docs if d < 100]
    clusters = spark.createDataFrame(cl, "doc_id long, cluster_id long")
    weights = {"spark": 1.0, "join": 1.0, "window": 1.0}
    full = _ref_topk(docs, weights, set(), set(), k=10**6)
    cmap = dict(cl)
    best: dict[int, tuple[int, float]] = {}
    for d, s in full:  # full is (score DESC, doc ASC) ordered
        c = cmap.get(d, d)
        if c not in best:
            best[c] = (d, s)
    want = sorted(
        ((c, d, s) for c, (d, s) in best.items()),
        key=lambda x: (-x[2], x[1]),
    )[:7]
    got = [
        (r["cluster_id"], r["doc_id"], r["score"])
        for r in search_collapsed(
            spark, idx, "spark join window", clusters, k=7
        ).collect()
    ]
    assert [(c, d) for c, d, _ in got] == [(c, d) for c, d, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) < 1e-9
    # ranks are 1..k and each cluster appears at most once
    ranks = [r["rank"] for r in search_collapsed(
        spark, idx, "spark join window", clusters, k=7).collect()]
    assert ranks == list(range(1, len(got) + 1))
    cs = [c for c, _, _ in got]
    assert len(cs) == len(set(cs))
    assert search_collapsed(spark, idx, "", clusters, k=5).count() == 0


def test_search_collapsed_store_and_facade(spark, corpus, tmp_path):
    """Store-served and facade collapsed search == the raw-index path."""
    from fornax_spark import Connection
    from fornax_spark.fulltext.query import search_collapsed
    from fornax_spark.fulltext.segments import build_segments
    from fornax_spark.fulltext.wand import search_collapsed_segments

    docs, idx = corpus
    clusters = spark.createDataFrame(
        [(d, (d // 5) * 5) for d, _ in docs if d < 100],
        "doc_id long, cluster_id long",
    )
    q = "spark join window"
    want = search_collapsed(spark, idx, q, clusters, k=7).collect()
    store = build_segments(spark, idx, str(tmp_path / "cs"), n_buckets=8)
    a = search_collapsed_segments(spark, store, q, clusters, k=7).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in want]

    conn = Connection(str(tmp_path / "fx"), spark)
    c = conn.create_corpus("cs").build(
        spark.createDataFrame(docs, "doc_id long, text string"), n_buckets=4
    )
    b = c.search_collapsed(q, clusters, k=7).collect()
    assert [(r["rank"], r["cluster_id"], r["doc_id"]) for r in b] == [
        (r["rank"], r["cluster_id"], r["doc_id"]) for r in want
    ]
    assert len(b) > 0


def test_batch_verbs_random_parity(spark):
    """Randomized sweep: over random corpora and random query batches,
    batch boolean/weighted == their per-query forms (a seed-sweep
    complement to the fixed-corpus parity tests)."""
    from fornax_spark.fulltext.query import (
        search_boolean_batch,
        search_weighted_batch,
    )

    for seed in (101, 202):
        rng = random.Random(seed)
        docs = _mk_docs(rng.randint(40, 160), seed=seed)
        idx = build_index_from_table(
            spark.createDataFrame(docs, "doc_id long, text string"),
            "doc_id", "text",
        )
        bqueries = []
        for _ in range(5):
            pool = rng.sample(VOCAB, rng.randint(1, 5))
            n_m = rng.randint(0, min(2, len(pool)))
            n_b = rng.randint(0, 1)
            rest = pool[n_m:]
            ban = rest[:n_b]
            bqueries.append(
                {
                    "must": " ".join(pool[:n_m]),
                    "should": " ".join(rest[n_b:]),
                    "must_not": " ".join(ban),
                }
            )
        out = search_boolean_batch(spark, idx, bqueries, k=6).collect()
        by_qid: dict[int, list] = {}
        for r in out:
            by_qid.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], round(r["score"], 9))
            )
        for qid, q in enumerate(bqueries):
            single = [
                (r["rank"], r["doc_id"], round(r["score"], 9))
                for r in search_boolean(spark, idx, **q, k=6).collect()
            ]
            assert by_qid.get(qid, []) == single, (seed, qid, q)

        wqueries = [
            {
                t: round(rng.uniform(0.05, 1.0), 3)
                for t in rng.sample(VOCAB, rng.randint(1, 4))
            }
            for _ in range(4)
        ]
        wout = search_weighted_batch(spark, idx, wqueries, k=6).collect()
        wby: dict[int, list] = {}
        for r in wout:
            wby.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], round(r["score"], 9))
            )
        for qid, q in enumerate(wqueries):
            single = [
                (r["rank"], r["doc_id"], round(r["score"], 9))
                for r in search_weighted(spark, idx, q, k=6).collect()
            ]
            assert wby.get(qid, []) == single, (seed, qid, q)


def test_facade_batch_verbs(spark, corpus, tmp_path):
    """CorpusHandle.search_boolean_batch / search_weighted_batch /
    search_hybrid_batch == the direct store calls."""
    from fornax_spark import Connection
    from fornax_spark.fulltext.wand import (
        hybrid_topk_batch_segments,
        search_boolean_batch_segments,
        search_weighted_batch_segments,
    )

    docs, _ = corpus
    conn = Connection(str(tmp_path / "fx"), spark)
    c = conn.create_corpus("bv").build(
        spark.createDataFrame(docs, "doc_id long, text string"), n_buckets=4
    )
    store = c._store()

    bq = [{"should": "spark join", "must": "table"}, {"must": "hash"}]
    a = c.search_boolean_batch(bq, k=6).collect()
    b = search_boolean_batch_segments(spark, store, bq, k=6).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] and a

    wq = [{"spark": 1.0, "join": 0.5}, {"scan": 0.75}]
    aw = c.search_weighted_batch(wq, k=6).collect()
    bw = search_weighted_batch_segments(spark, store, wq, k=6).collect()
    assert [tuple(r) for r in aw] == [tuple(r) for r in bw] and aw

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((len(docs), 8))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(1, len(docs))],
        "vec_id long, embedding array<float>",
    )
    hq = [
        {"text": "spark join", "vec": [float(x) for x in vecs[0]]},
        {"text": "table", "vec": [float(x) for x in vecs[1]]},
    ]
    ah = c.search_hybrid_batch(hq, emb, k=5, depth=15).collect()
    bh = hybrid_topk_batch_segments(
        spark, store, emb, hq, k=5, depth=15
    ).collect()
    assert [tuple(r) for r in ah] == [tuple(r) for r in bh] and ah
