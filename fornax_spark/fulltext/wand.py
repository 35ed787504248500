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


def _decode_block(
    row, codec_mod=codec
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = int(row.n)
    docs = codec_mod.delta_decode_docids(bytes(row.doc_blob), n)
    tf = codec_mod.decode_counts(bytes(row.tf_blob), n)
    dl = codec_mod.decode_counts(bytes(row.dl_blob), n)
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


def _score_one_query(
    by_term: dict[str, list],
    terms: list[str],
    k: int,
    prune: bool,
    n_docs: int,
    avgdl: float,
    scored,
    tomb=None,
):
    """MaxScore-pruned scoring of ONE query against one bucket's blocks.

    by_term: term_id -> block rows (namedtuples) for this bucket; term
    ids are rank-of-sorted-term (segments.build_dictionary), so every
    ascending-term ordering contract holds on the ints unchanged.
    scored: (term_id, row, df_t) -> (alive docs, BM25 contributions) —
    injectable (_make_scored_cache) so the batch path shares per-block
    decode + tombstone-mask + float work across queries.
    Returns (docs, scores) arrays or None if no term matches.

    Both the single-query and the batch kernel run THIS routine, so
    batch-pruned == batch-exhaustive == single-query is an identity by
    construction (and a test invariant in tests/test_segments.py).
    """
    present = [t for t in sorted(set(terms)) if t in by_term]
    if not present:
        return None
    # term-rank in ASCENDING term-string order = the float-sum order
    rank_of = {t: i for i, t in enumerate(present)}
    # per-term max contribution (U_t) from block-max metadata;
    # process order: descending U_t (deterministic tiebreak by term).
    # With tombstones the stored block_max is stale (idf rises when df
    # drops; the tf component rises if avgdl grows) — scale by the idf
    # ratio and max(1, avgdl'/avgdl) to keep U_t a valid upper bound
    # (deletes.py module docstring).
    if tomb is None:
        u = {t: max(r.block_max for r in by_term[t]) for t in present}
        df_of = {t: int(by_term[t][0].df) for t in present}
    else:
        u, df_of = {}, {}
        avgdl_slack = (
            max(1.0, tomb.avgdl_new / tomb.avgdl_old) if tomb.avgdl_old else 1.0
        )
        for t in present:
            df_old = int(by_term[t][0].df)
            df_new = max(df_old - int(tomb.df_deltas.get(str(t), 0)), 0)
            if df_new == 0:
                continue  # every posting of t is tombstoned
            df_of[t] = df_new
            ratio = float(
                bm25.idf(np.array([df_new]), n_docs)[0]
                / bm25.idf(np.array([df_old]), tomb.n_docs_old)[0]
            )
            u[t] = max(r.block_max for r in by_term[t]) * ratio * avgdl_slack
        present = [t for t in present if t in u]
        if not present:
            return None
    order = sorted(present, key=lambda t: (-u[t], t))
    uarr = np.array([u[t] for t in order])
    suffix_ub = np.concatenate([np.cumsum(uarr[::-1])[::-1], [0.0]])

    acc_docs = np.empty(0, dtype=np.int64)  # sorted candidate ids
    acc_scores = np.empty(0, dtype=np.float64)  # running exact sums
    trip_d: list[np.ndarray] = []
    trip_r: list[np.ndarray] = []
    trip_c: list[np.ndarray] = []
    open_admission = True

    for i, t in enumerate(order):
        if not open_admission and len(acc_docs) == 0:
            break
        rows = by_term[t]
        df_t = df_of[t]
        d_parts, c_parts = [], []
        for row in rows:
            if not open_admission:
                # block skip: fence must intersect candidate set
                lo = np.searchsorted(acc_docs, row.first_doc, "left")
                hi = np.searchsorted(acc_docs, row.last_doc, "right")
                if lo == hi:
                    continue
            docs, contrib = scored(t, row, df_t)
            if not len(docs):
                continue
            if not open_admission:
                m = np.isin(docs, acc_docs, assume_unique=True)
                if not m.any():
                    continue
                docs, contrib = docs[m], contrib[m]
            d_parts.append(docs)
            c_parts.append(contrib)
        if d_parts:
            docs = np.concatenate(d_parts)
            contrib = np.concatenate(c_parts)
            trip_d.append(docs)
            trip_r.append(np.full(len(docs), rank_of[t], dtype=np.int64))
            trip_c.append(contrib)
            # update running exact sums (order-free here: these running
            # sums only gate pruning; final sums are recomputed in
            # fixed order inside _topk_from_triples)
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
        return None
    return _topk_from_triples(
        np.concatenate(trip_d),
        np.concatenate(trip_r),
        np.concatenate(trip_c),
        k,
    )


def _group_blocks_by_term(pdf: pd.DataFrame) -> dict[int, list]:
    """term_id -> block rows sorted by block_id (files of a bucket arrive
    in arbitrary order; scores are order-free, but sorted blocks keep the
    fence skips sequential)."""
    by_term: dict[int, list] = {}
    for row in pdf.itertuples(index=False):
        by_term.setdefault(int(row.term_id), []).append(row)
    for rows in by_term.values():
        rows.sort(key=lambda r: r.block_id)
    return by_term


def _make_scored_cache(n_docs: int, avgdl: float, tomb=None, codec_mod=codec):
    """Per-block memo keyed by (term_id, block_id) of the fully SCORED
    block: (alive docs, their BM25 contributions). The contribution of
    term t to doc d — idf(df_t) x tf-saturation(tf, dl) — depends only
    on the term and corpus stats, never on the query, so in batch mode
    each block is decompressed, tombstone-masked AND scored at most once
    per bucket regardless of how many queries touch its term (the
    decode-only cache this replaces still recomputed the float math per
    query)."""
    cache: dict[tuple[int, int], tuple] = {}

    def scored(t: int, row, df_t: int):
        key = (t, int(row.block_id))
        hit = cache.get(key)
        if hit is None:
            docs, tf, dl = _decode_block(row, codec_mod)
            if tomb is not None and len(tomb.doc_ids):
                alive = ~np.isin(docs, tomb.doc_ids, assume_unique=True)
                docs, tf, dl = docs[alive], tf[alive], dl[alive]
            contrib = (
                bm25.term_score(
                    tf, dl, np.full(len(tf), df_t), n_docs, avgdl
                )
                if len(tf)
                else np.empty(0, dtype=np.float64)
            )
            hit = (docs, contrib)
            cache[key] = hit
        return hit

    return scored


def _score_bucket_kernel(k: int, prune: bool, n_docs: int, avgdl: float,
                         tomb=None, codec_mod=codec):
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame({"doc_id": [], "score": []})
        by_term = _group_blocks_by_term(pdf)
        res = _score_one_query(
            by_term, list(by_term), k, prune, n_docs, avgdl,
            _make_scored_cache(n_docs, avgdl, tomb, codec_mod), tomb,
        )
        if res is None:
            return pd.DataFrame({"doc_id": [], "score": []})
        docs_k, scores_k = res
        return pd.DataFrame({"doc_id": docs_k, "score": scores_k})

    return kernel


def _score_bucket_kernel_batch(
    queries: list[tuple[int, list[str], int]], prune: bool, n_docs: int,
    avgdl: float, tomb=None, codec_mod=codec,
):
    """Batched variant: score every query in one pass per bucket through
    the SAME MaxScore-pruned routine as the single-query path, sharing
    block decodes across queries via a per-(term, block) cache. Output
    rows (query_id, doc_id, score)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
        by_term = _group_blocks_by_term(pdf)
        scored = _make_scored_cache(n_docs, avgdl, tomb, codec_mod)

        out_q, out_d, out_s = [], [], []
        for qid, terms, k in queries:
            res = _score_one_query(
                by_term, terms, k, prune, n_docs, avgdl, scored, tomb
            )
            if res is None:
                continue
            docs_k, scores_k = res
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


def _store_tombstones(store: SegmentStore):
    """(tombstones-or-None, effective n_docs, effective avgdl): deleted
    docs (deletes.delete_docs) are masked at query time with EXACT
    shifted corpus statistics — results equal a rebuild without them."""
    from .deletes import load_tombstones

    tomb = load_tombstones(store)
    if tomb is None or not len(tomb.doc_ids):
        return None, store.n_docs, store.avgdl
    return tomb, tomb.n_docs_new, tomb.avgdl_new


def search_segments_batch(
    spark: SparkSession,
    store: SegmentStore,
    queries_pdf,
    prune: bool = True,
) -> DataFrame:
    """All queries in ONE distributed pass: (query_id, rank, doc_id, score).

    queries_pdf: pandas DataFrame (query_id, query_text, k).
    Each query runs the same MaxScore-pruned kernel as the single-query
    path; block decodes are shared across queries via a per-(term, block)
    cache, so pruning costs nothing extra in batch mode.
    """
    from pyspark.sql import Window

    parsed = []
    all_terms: set[str] = set()
    for q in queries_pdf.itertuples(index=False):
        terms = sorted(set(tokenize(q.query_text)))
        parsed.append((int(q.query_id), terms, int(q.k)))
        all_terms.update(terms)
    if not all_terms:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    # one dictionary lookup for the whole batch (term -> 4-byte id)
    id_of = store.term_ids(spark, sorted(all_terms))
    qs = [
        (qid, sorted(id_of[t] for t in terms if t in id_of), k)
        for qid, terms, k in parsed
    ]
    qids = [qid for qid, _t, _k in qs]
    if len(set(qids)) != len(qids):
        # fail loud and early on BOTH k-filter paths: the literal
        # create_map below would otherwise raise Spark's opaque
        # duplicate-map-key RuntimeException at count() time, while the
        # >2000 broadcast-join path would silently duplicate rows
        dup = next(q for q in qids if qids.count(q) > 1)
        raise ValueError(
            f"duplicate query_id {dup} in batch: query ids must be "
            "unique within a search_segments_batch call"
        )
    all_ids = sorted({i for _q, ids, _k in qs for i in ids})
    if not all_ids:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
    blocks = store.blocks(spark).filter(F.col("term_id").isin(all_ids))
    tomb, n_docs, avgdl = _store_tombstones(store)
    kern = _score_bucket_kernel_batch(
        qs, prune, n_docs, avgdl, tomb, codec.get_codec(store.codec)
    )
    per_bucket = blocks.groupBy("bucket").applyInPandas(
        kern, "query_id long, doc_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    ranked = per_bucket.withColumn("rank", F.row_number().over(w))
    if len(qs) <= 2000:
        # per-query k is a driver-side constant: a literal map beats a
        # broadcast join here — one less exchange, and (under AQE) one
        # less broadcast-materialization job on the batch's latency
        # floor, which is what the small-batch QPS scaling pays for
        kmap = F.create_map(
            *[F.lit(v) for qid, _t, k in qs for v in (qid, k)]
        )
        ranked = ranked.filter(F.col("rank") <= kmap[F.col("query_id")])
    else:
        # huge query batches: expression size would explode — fall back
        # to the broadcast join
        ks = spark.createDataFrame(
            [(qid, k) for qid, _t, k in qs], "query_id long, k int"
        )
        ranked = ranked.join(F.broadcast(ks), "query_id").filter(
            F.col("rank") <= F.col("k")
        )
    return ranked.select("query_id", "rank", "doc_id", "score").orderBy(
        "query_id", "rank"
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
    ids = sorted(store.term_ids(spark, terms).values())
    if not ids:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    blocks = store.blocks(spark).filter(F.col("term_id").isin(ids))
    tomb, n_docs, avgdl = _store_tombstones(store)
    kern = _score_bucket_kernel(
        k, prune, n_docs, avgdl, tomb, codec.get_codec(store.codec)
    )
    per_bucket = blocks.groupBy("bucket").applyInPandas(kern, _OUT_SCHEMA)
    topk = per_bucket.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    from pyspark.sql import Window

    # UNPARTITIONED window — intentional and safe ONLY because the
    # input is the k-row result of the limit(k) above (k <= a few
    # hundred): a single-partition WindowExec over k rows is free. Do
    # NOT copy this pattern onto unbounded data — an unpartitioned
    # Window moves the whole dataset to one partition. The k-bound is
    # asserted so a future edit can't silently widen the input.
    assert k <= 10_000, f"rank window is single-partition; k={k} too large"
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )


def decode_postings(
    spark: SparkSession, store: SegmentStore, terms: list[str] | None = None
) -> DataFrame:
    """Decode the store's posting blocks back into a LIVE postings view
    (term, doc_id, tf, dl): tombstoned docs are masked out, so the
    result equals build.build_postings over the surviving documents
    (test-pinned in tests/test_boolean_weighted.py).

    With `terms`, the dictionary resolves term_ids and the block scan
    carries a pushed `term_id IN` filter (row-group pruning on the
    (bucket, term_id, block_id)-sorted layout) — the serving path for
    store-served boolean/weighted search. With terms=None the whole
    store is exported; the dictionary join is then vocabulary-sized and
    left to AQE (no broadcast assumption).
    """
    cmod = codec.get_codec(store.codec)
    tomb, _, _ = _store_tombstones(store)
    tomb_ids = tomb.doc_ids if tomb is not None else None
    blocks = store.blocks(spark).select(
        "term_id", "n", "doc_blob", "tf_blob", "dl_blob"
    )
    if terms is not None:
        ids = store.term_ids(spark, sorted(set(terms)))
        if not ids:
            return spark.createDataFrame(
                [], "term string, doc_id long, tf long, dl long"
            )
        blocks = blocks.filter(
            F.col("term_id").isin(sorted(ids.values()))
        )
        dict_df = F.broadcast(
            spark.createDataFrame(
                sorted(ids.items()), "term string, term_id int"
            )
        )
    else:
        dict_df = store.dictionary(spark).select("term", "term_id")

    def gen(batches):
        for pdf in batches:
            cols = {"term_id": [], "doc_id": [], "tf": [], "dl": []}
            for row in pdf.itertuples(index=False):
                docs, tf, dl = _decode_block(row, cmod)
                if tomb_ids is not None:
                    keep = ~np.isin(docs, tomb_ids)
                    docs, tf, dl = docs[keep], tf[keep], dl[keep]
                if not len(docs):
                    continue
                cols["term_id"].append(
                    np.full(len(docs), row.term_id, dtype=np.int32)
                )
                cols["doc_id"].append(docs)
                cols["tf"].append(tf)
                cols["dl"].append(dl)
            if cols["term_id"]:
                yield pd.DataFrame(
                    {k: np.concatenate(v) for k, v in cols.items()}
                )

    decoded = blocks.mapInPandas(
        gen, "term_id int, doc_id long, tf long, dl long"
    )
    return decoded.join(dict_df, "term_id").select(
        "term", "doc_id", "tf", "dl"
    )


def _store_as_index(spark: SparkSession, store: SegmentStore, terms: list[str]):
    """Minimal InvertedIndex-shaped view of the store for the boolean /
    weighted query paths: postings decoded for `terms` only, term df
    from the dictionary shifted by the tombstone deltas (exact — the
    same stats the WAND kernels use), tombstone-shifted n_docs/avgdl."""
    from types import SimpleNamespace

    tomb, n_docs, avgdl = _store_tombstones(store)
    ids = store.term_ids(spark, terms)
    dfs = {
        r["term"]: int(r["df"])
        for r in store.dictionary(spark)
        .filter(F.col("term").isin(sorted(ids)))
        .collect()
    }
    if tomb is not None:
        for t, tid in ids.items():
            dfs[t] = dfs[t] - int(tomb.df_deltas.get(str(int(tid)), 0))
    rows = [(t, d) for t, d in sorted(dfs.items()) if d > 0]
    term_stats = spark.createDataFrame(
        rows or [("", 0)], "term string, df long"
    ).filter(F.col("df") > 0)
    return SimpleNamespace(
        postings=decode_postings(spark, store, terms),
        term_stats=term_stats,
        stats=SimpleNamespace(n_docs=n_docs, avgdl=avgdl),
    )


def search_boolean_segments(
    spark: SparkSession,
    store: SegmentStore,
    should: str = "",
    must: str = "",
    must_not: str = "",
    k: int = 10,
) -> DataFrame:
    """query.search_boolean served from the durable segment store:
    postings come from decode_postings (pushed term_id filter, live
    tombstone mask) and the stats are tombstone-shifted — results equal
    the raw-index path over the surviving documents bit for bit."""
    from .query import search_boolean

    terms = sorted(
        set(tokenize(should)) | set(tokenize(must)) | set(tokenize(must_not))
    )
    idx = _store_as_index(spark, store, terms)
    return search_boolean(
        spark, idx, should=should, must=must, must_not=must_not, k=k
    )


def search_weighted_segments(
    spark: SparkSession,
    store: SegmentStore,
    weights: dict[str, float],
    k: int = 10,
) -> DataFrame:
    """query.search_weighted served from the durable segment store
    (same stats contract as search_boolean_segments)."""
    from .query import search_weighted

    idx = _store_as_index(spark, store, sorted(weights))
    return search_weighted(spark, idx, weights, k=k)


def suggest_terms_segments(
    spark: SparkSession,
    store: SegmentStore,
    prefix: str,
    k: int = 10,
) -> DataFrame:
    """query.suggest_terms served from the durable store's dictionary:
    (term, df), order (df DESC, term ASC), df tombstone-shifted so the
    suggestions equal a clean rebuild without the deleted docs.

    Scale shape: the startswith filter is pushed into the dictionary
    parquet scan (StartsWith pushes as a string-range predicate, so a
    term-sorted dictionary prunes row groups); the df-delta correction
    is a broadcast join of the tombstone-sized delta table."""
    norm = tokenize(prefix)
    d = store.dictionary(spark)
    if len(norm) != 1:
        return d.filter(F.lit(False)).select("term", "df")
    cand = d.filter(F.col("term").startswith(norm[0]))
    tomb, _, _ = _store_tombstones(store)
    if tomb is not None and tomb.df_deltas:
        deltas = spark.createDataFrame(
            [(int(t), int(v)) for t, v in tomb.df_deltas.items()],
            "term_id int, delta long",
        )
        cand = (
            cand.join(F.broadcast(deltas), "term_id", "left")
            .withColumn(
                "df", F.col("df") - F.coalesce(F.col("delta"), F.lit(0))
            )
            .filter(F.col("df") > 0)
        )
    return (
        cand.select("term", "df")
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(k)
    )


def search_boolean_batch_segments(
    spark: SparkSession,
    store: SegmentStore,
    queries: list[dict],
    k: int = 10,
) -> DataFrame:
    """query.search_boolean_batch served from the durable segment
    store: the union of every query's terms drives ONE decode_postings
    scan (pushed term_id filter covering all queries at once, live
    tombstone mask, tombstone-shifted stats), then the single batch
    plan ranks all queries — the production serving shape for a query
    log. Results equal the raw-index batch path bit for bit."""
    from .query import search_boolean_batch

    terms = sorted(
        {
            t
            for q in queries
            for key in ("should", "must", "must_not")
            for t in tokenize(q.get(key, ""))
        }
    )
    idx = _store_as_index(spark, store, terms)
    return search_boolean_batch(spark, idx, queries, k=k)


def search_collapsed_segments(
    spark: SparkSession,
    store: SegmentStore,
    query_text: str,
    clusters,
    k: int = 10,
) -> DataFrame:
    """query.search_collapsed served from the durable segment store
    (pushed term_id decode, tombstone-shifted stats)."""
    from .query import search_collapsed

    idx = _store_as_index(spark, store, sorted(set(tokenize(query_text))))
    return search_collapsed(spark, idx, query_text, clusters, k=k)


def search_weighted_batch_segments(
    spark: SparkSession,
    store: SegmentStore,
    queries: list[dict],
    k: int = 10,
) -> DataFrame:
    """query.search_weighted_batch served from the durable segment
    store (union of all queries' terms -> one decode_postings scan,
    tombstone-shifted stats); equals the raw-index batch bit for
    bit."""
    from .query import search_weighted_batch

    terms = sorted({t for q in queries for t in tokenize(" ".join(q))})
    idx = _store_as_index(spark, store, terms)
    return search_weighted_batch(spark, idx, queries, k=k)


def hybrid_topk_segments(
    spark: SparkSession,
    store: SegmentStore,
    emb,
    query_text: str,
    query_vec: list[float],
    k: int = 10,
    depth: int = 50,
    k_rrf: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """hybrid.hybrid_topk with the lexical leg served from the durable
    segment store via the MaxScore-pruned WAND kernel (pushed term_id
    decode, tombstone-shifted stats); the dense leg and the RRF fusion
    are unchanged. Equal to the raw-index hybrid bit for bit — the
    lexical ranks are the same deterministic (score DESC, doc_id ASC)
    top-depth."""
    from .hybrid import dense_ranked, rrf_fuse

    lex = search_segments(spark, store, query_text, k=depth).select(
        "doc_id", "rank"
    )
    den = dense_ranked(emb, query_vec, depth, id_col=id_col, vec_col=vec_col)
    return rrf_fuse([lex, den], k=k, k_rrf=k_rrf)


def hybrid_topk_batch_segments(
    spark: SparkSession,
    store: SegmentStore,
    emb,
    queries: list[dict],
    k: int = 10,
    depth: int = 50,
    k_rrf: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """A whole hybrid query log in ONE plan: `queries[i]` is
    {"text": str, "vec": list[float]} -> (query_id, rank, doc_id,
    rrf_score). The lexical legs run search_segments_batch (every
    query's terms share one pushed decode, per-(term, block) cache
    across queries); the dense legs run cosine_topk_batch (one corpus
    scan computes every query's cosine block, local top-depth per
    Arrow batch); fusion is rrf_fuse_batch. Per-query results equal
    the single-query hybrid_topk_segments bit for bit."""
    import pandas as pd

    if not queries:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, rrf_score double"
        )
    from fornax_spark.operators.similarity import cosine_topk_batch

    from .hybrid import rrf_fuse_batch

    qpdf = pd.DataFrame(
        [
            {"query_id": i, "query_text": q["text"], "k": depth}
            for i, q in enumerate(queries)
        ]
    )
    lex = search_segments_batch(spark, store, qpdf).select(
        "query_id", "doc_id", "rank"
    )
    den = cosine_topk_batch(
        emb,
        [q["vec"] for q in queries],
        depth=depth,
        id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", F.col("id").alias("doc_id"), "rank")
    return rrf_fuse_batch([lex, den], k=k, k_rrf=k_rrf)
