"""Block-max top-k scorer over the segment store.

Distributed shape: the segment store is document-sharded (segments.py),
so every bucket can score its documents for ALL query terms without any
query-time shuffle of the index:

    blocks = store.blocks(spark).filter(term IN qterms)   # pushdown+prune
    per_bucket = blocks.groupBy(bucket).applyInPandas(score_kernel)
    topk = per_bucket.orderBy(score desc, doc_id).limit(k)  # heap-reduce

The kernel implements MaxScore-style pruning with block-level skipping
(Turtle & Flood's MaxScore; block-max metadata per Ding & Suel SIGIR'11):

  * terms processed in DESCENDING max-contribution order; suffix upper
    bounds su[i] = sum of U_t for the unprocessed tail.
  * while "open", every posting seen becomes a candidate with an exact
    running score (a LOWER bound of its final score).
  * once su[i] < theta (theta = k-th best running score), NO new doc can
    reach the top-k -> stop admitting docs; remaining (frequent, cheap)
    terms only update existing candidates, and whole blocks are skipped
    unless their [first_doc, last_doc] fence intersects a candidate.
  * every candidate's contribution set is COMPLETE by construction, so
    final scores are summed in ascending-term order (reduceat) and are
    bit-identical to the exhaustive path — "WAND == exhaustive" is a
    test invariant, the analogue of the reference's batched==unbatched
    equivalence (/root/reference/test/test_select.py:211-258).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import bm25, codec
from .segments import SegmentStore
from .textproc import tokenize

_OUT_SCHEMA = "doc_id long, score double"


def _decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = int(row.n)
    docs = codec.delta_decode_docids(bytes(row.doc_blob), n)
    tf = codec.decode_counts(bytes(row.tf_blob), n)
    dl = codec.decode_counts(bytes(row.dl_blob), n)
    return docs, tf, dl


def _topk_from_triples(doc_arr, rank_arr, contrib_arr, k):
    """Sum contributions per doc in ascending term-rank order and return
    (docs, scores) of the top-k by (score desc, doc asc).

    NB: summation is rank-by-rank (term-by-term ascending), NOT
    np.add.reduceat — reduceat uses pairwise reduction internally, which
    changes the float association and breaks bit-identity with the
    oracle's sequential left-to-right accumulation."""
    docs_u = np.unique(doc_arr)
    scores = np.zeros(len(docs_u), dtype=np.float64)
    for r in np.unique(rank_arr):  # ascending term order
        sel = rank_arr == r
        idx = np.searchsorted(docs_u, doc_arr[sel])
        scores[idx] += contrib_arr[sel]  # one posting per (term, doc)
    if len(docs_u) > k:
        # exact tie-safe selection: keep everything >= k-th score, then
        # order deterministically and cut to k
        thresh = np.partition(scores, len(scores) - k)[len(scores) - k]
        keep = scores >= thresh
        docs_u, scores = docs_u[keep], scores[keep]
    o = np.lexsort((docs_u, -scores))
    return docs_u[o][:k], scores[o][:k]


def _score_bucket_kernel(k: int, prune: bool, n_docs: int, avgdl: float):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame({"doc_id": [], "score": []})
        # term-rank in ASCENDING term-string order = the float-sum order
        terms = sorted(pdf["term"].unique())
        rank_of = {t: i for i, t in enumerate(terms)}
        # per-term max contribution (U_t) from block-max metadata
        g = pdf.groupby("term")["block_max"].max()
        # process order: descending U_t (deterministic tiebreak by term)
        order = sorted(terms, key=lambda t: (-g[t], t))
        u = np.array([g[t] for t in order])
        suffix_ub = np.concatenate([np.cumsum(u[::-1])[::-1], [0.0]])

        acc_docs = np.empty(0, dtype=np.int64)  # sorted candidate ids
        acc_scores = np.empty(0, dtype=np.float64)  # running exact sums
        trip_d: list[np.ndarray] = []
        trip_r: list[np.ndarray] = []
        trip_c: list[np.ndarray] = []
        open_admission = True

        for i, t in enumerate(order):
            rows = pdf[pdf["term"] == t]
            if not open_admission and len(acc_docs) == 0:
                break
            blocks = list(rows.itertuples(index=False))
            d_parts, tf_parts, dl_parts = [], [], []
            for row in blocks:
                if not open_admission:
                    # block skip: fence must intersect candidate set
                    lo = np.searchsorted(acc_docs, row.first_doc, "left")
                    hi = np.searchsorted(acc_docs, row.last_doc, "right")
                    if lo == hi:
                        continue
                docs, tf, dl = _decode_block(row)
                if not open_admission:
                    m = np.isin(docs, acc_docs, assume_unique=True)
                    if not m.any():
                        continue
                    docs, tf, dl = docs[m], tf[m], dl[m]
                d_parts.append(docs)
                tf_parts.append(tf)
                dl_parts.append(dl)
            if d_parts:
                docs = np.concatenate(d_parts)
                tf = np.concatenate(tf_parts)
                dl = np.concatenate(dl_parts)
                df_t = int(rows["df"].iloc[0])
                contrib = bm25.term_score(
                    tf, dl, np.full(len(tf), df_t), n_docs, avgdl
                )
                trip_d.append(docs)
                trip_r.append(np.full(len(docs), rank_of[t], dtype=np.int64))
                trip_c.append(contrib)
                # update running exact sums (order-free here: these running
                # sums only gate pruning; final sums are recomputed in
                # fixed order below)
                all_docs = np.concatenate([acc_docs, docs])
                all_sc = np.concatenate([acc_scores, contrib])
                acc_docs, inv = np.unique(all_docs, return_inverse=True)
                acc_scores = np.zeros(len(acc_docs))
                np.add.at(acc_scores, inv, all_sc)
            if prune and open_admission and len(acc_scores) >= k:
                theta = np.partition(acc_scores, len(acc_scores) - k)[
                    len(acc_scores) - k
                ]
                if suffix_ub[i + 1] < theta:
                    open_admission = False

        if not trip_d:
            return pd.DataFrame({"doc_id": [], "score": []})
        docs_k, scores_k = _topk_from_triples(
            np.concatenate(trip_d),
            np.concatenate(trip_r),
            np.concatenate(trip_c),
            k,
        )
        return pd.DataFrame({"doc_id": docs_k, "score": scores_k})

    return kernel


def _score_bucket_kernel_batch(
    queries: list[tuple[int, list[str], int]], prune: bool, n_docs: int, avgdl: float
):
    """Batched variant: score every query in one pass per bucket, sharing
    block decodes across queries via a per-term cache. Output rows
    (query_id, doc_id, score)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
        by_term: dict[str, pd.DataFrame] = {
            t: g for t, g in pdf.groupby("term")
        }
        decode_cache: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray, int]] = {}

        def decoded(t: str):
            if t not in decode_cache:
                rows = by_term[t]
                parts = [_decode_block(r) for r in rows.itertuples(index=False)]
                docs = np.concatenate([p[0] for p in parts])
                tf = np.concatenate([p[1] for p in parts])
                dl = np.concatenate([p[2] for p in parts])
                decode_cache[t] = (docs, tf, dl, int(rows["df"].iloc[0]))
            return decode_cache[t]

        out_q, out_d, out_s = [], [], []
        for qid, terms, k in queries:
            present = [t for t in sorted(set(terms)) if t in by_term]
            if not present:
                continue
            rank_of = {t: i for i, t in enumerate(present)}
            trip_d, trip_r, trip_c = [], [], []
            for t in present:
                docs, tf, dl, df_t = decoded(t)
                contrib = bm25.term_score(
                    tf, dl, np.full(len(tf), df_t), n_docs, avgdl
                )
                trip_d.append(docs)
                trip_r.append(np.full(len(docs), rank_of[t], dtype=np.int64))
                trip_c.append(contrib)
            docs_k, scores_k = _topk_from_triples(
                np.concatenate(trip_d),
                np.concatenate(trip_r),
                np.concatenate(trip_c),
                k,
            )
            out_q.append(np.full(len(docs_k), qid, dtype=np.int64))
            out_d.append(docs_k)
            out_s.append(scores_k)
        if not out_q:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "doc_id": np.concatenate(out_d),
                "score": np.concatenate(out_s),
            }
        )

    return kernel


def search_segments_batch(
    spark: SparkSession,
    store: SegmentStore,
    queries_pdf,
    prune: bool = True,
) -> DataFrame:
    """All queries in ONE distributed pass: (query_id, rank, doc_id, score).

    queries_pdf: pandas DataFrame (query_id, query_text, k).
    Batch mode shares block decodes across queries; MaxScore admission
    pruning currently applies only to the single-query path (the batch
    kernel is exhaustive over term-matched candidates).
    """
    from pyspark.sql import Window

    qs = []
    all_terms: set[str] = set()
    for q in queries_pdf.itertuples(index=False):
        terms = sorted(set(tokenize(q.query_text)))
        qs.append((int(q.query_id), terms, int(q.k)))
        all_terms.update(terms)
    if not all_terms:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    blocks = store.blocks(spark).filter(F.col("term").isin(sorted(all_terms)))
    kern = _score_bucket_kernel_batch(qs, prune, store.n_docs, store.avgdl)
    per_bucket = blocks.groupBy("bucket").applyInPandas(
        kern, "query_id long, doc_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    ks = spark.createDataFrame(
        [(qid, k) for qid, _t, k in qs], "query_id long, k int"
    )
    return (
        per_bucket.join(F.broadcast(ks), "query_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def search_segments(
    spark: SparkSession,
    store: SegmentStore,
    query_text: str,
    k: int = 10,
    prune: bool = True,
) -> DataFrame:
    """Top-k BM25 over the segment store: (rank, doc_id, score).

    prune=False runs the same kernel exhaustively (the in-engine oracle
    for the WAND==exhaustive invariant).
    """
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    blocks = store.blocks(spark).filter(F.col("term").isin(terms))
    kern = _score_bucket_kernel(k, prune, store.n_docs, store.avgdl)
    per_bucket = blocks.groupBy("bucket").applyInPandas(kern, _OUT_SCHEMA)
    topk = per_bucket.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )
