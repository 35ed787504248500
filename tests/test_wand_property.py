"""Property-based WAND kernel checks — pure numpy, no SparkSession.

Hypothesis generates small random corpora; for each, posting blocks are
encoded EXACTLY the way the segment store lays them out (per-term
doc-sorted runs cut into fixed-size blocks, blob-coded, with exact
block-max metadata) and `_score_one_query` runs three ways:

  * pruned (MaxScore + block skipping) — the production path
  * exhaustive (prune=False) — the in-engine oracle
  * an independent reference that sums bm25.term_score per doc in the
    kernel's fixed ascending-term order (so float association matches)

All three must agree BIT-FOR-BIT on (docs, scores) for every k, under
both posting codecs. This is the distilled form of the store-level
"WAND == exhaustive == oracle" suite (tests/test_segments.py) that can
afford hundreds of random corpora because no JVM is involved.
"""

from __future__ import annotations

from collections import namedtuple

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fornax_spark.fulltext import bm25, codec, pfor
from fornax_spark.fulltext.wand import _make_scored_cache, _score_one_query

Block = namedtuple(
    "Block",
    "term_id block_id n df first_doc last_doc block_max "
    "doc_blob tf_blob dl_blob",
)

BLOCK = 8  # small blocks exercise fences/skips far harder than 128


def _build_by_term(postings, n_docs, avgdl, cmod):
    """postings: dict term_id -> {doc_id: (tf, dl)} (dl consistent per
    doc). Returns by_term block rows exactly like one bucket's store
    slice."""
    by_term = {}
    for t, docs in postings.items():
        if not docs:
            continue
        ids = np.array(sorted(docs), dtype=np.int64)
        tf = np.array([docs[d][0] for d in ids], dtype=np.int64)
        dl = np.array([docs[d][1] for d in ids], dtype=np.int64)
        df = len(ids)
        rows = []
        for bi, s in enumerate(range(0, len(ids), BLOCK)):
            e = min(s + BLOCK, len(ids))
            contrib = bm25.term_score(
                tf[s:e], dl[s:e], np.full(e - s, df), n_docs, avgdl
            )
            rows.append(
                Block(
                    term_id=t,
                    block_id=bi,
                    n=e - s,
                    df=df,
                    first_doc=int(ids[s]),
                    last_doc=int(ids[e - 1]),
                    block_max=float(contrib.max()),
                    doc_blob=cmod.delta_encode_docids(ids[s:e]),
                    tf_blob=cmod.encode_counts(tf[s:e]),
                    dl_blob=cmod.encode_counts(dl[s:e]),
                )
            )
        by_term[t] = rows
    return by_term


def _reference_topk(postings, terms, k, n_docs, avgdl):
    """Independent accumulation in the kernel's fixed order: ascending
    term over present terms, one contribution per (term, doc)."""
    present = [t for t in sorted(set(terms)) if postings.get(t)]
    scores: dict[int, float] = {}
    for t in present:
        docs = postings[t]
        df = len(docs)
        ids = np.array(sorted(docs), dtype=np.int64)
        tf = np.array([docs[d][0] for d in ids], dtype=np.int64)
        dl = np.array([docs[d][1] for d in ids], dtype=np.int64)
        contrib = bm25.term_score(tf, dl, np.full(len(ids), df), n_docs, avgdl)
        for d, c in zip(ids, contrib):
            scores[int(d)] = scores.get(int(d), 0.0) + float(c)
    if not scores:
        return None
    items = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return (
        np.array([d for d, _ in items], dtype=np.int64),
        np.array([s for _, s in items], dtype=np.float64),
    )


corpus_strategy = st.builds(
    dict,
    n_docs=st.integers(4, 40),
    vocab=st.integers(1, 6),
    seed=st.integers(0, 10_000),
    k=st.integers(1, 12),
)


@settings(max_examples=120, deadline=None)
@given(corpus_strategy)
def test_pruned_equals_exhaustive_equals_reference(cfg):
    rng = np.random.default_rng(cfg["seed"])
    n_docs, vocab, k = cfg["n_docs"], cfg["vocab"], cfg["k"]
    # hashed-style ids (signed, sparse) and per-doc lengths
    doc_ids = rng.choice(
        np.arange(-(10**6), 10**6, dtype=np.int64), size=n_docs, replace=False
    )
    dl_of = {int(d): int(rng.integers(5, 300)) for d in doc_ids}
    postings = {}
    for t in range(vocab):
        hit = doc_ids[rng.random(n_docs) < rng.uniform(0.1, 0.9)]
        postings[t] = {
            int(d): (int(rng.integers(1, 9)), dl_of[int(d)]) for d in hit
        }
    avgdl = float(np.mean([dl_of[int(d)] for d in doc_ids]))
    terms = list(range(vocab))

    want = _reference_topk(postings, terms, k, n_docs, avgdl)
    for cmod in (codec, pfor):
        by_term = _build_by_term(postings, n_docs, avgdl, cmod)
        if not by_term:
            assert want is None
            continue
        outs = []
        for prune in (True, False):
            res = _score_one_query(
                by_term, terms, k, prune, n_docs, avgdl,
                _make_scored_cache(n_docs, avgdl, None, cmod), None,
            )
            outs.append(res)
        for res in outs:
            assert (res is None) == (want is None)
            if want is not None:
                np.testing.assert_array_equal(res[0], want[0])
                np.testing.assert_array_equal(res[1], want[1])  # bit-exact
