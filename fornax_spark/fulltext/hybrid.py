"""Hybrid lexical + dense retrieval via Reciprocal Rank Fusion.

RRF (Cormack, Clarke & Büttcher, SIGIR 2009): fused_score(d) =
Σ over result lists L of 1/(k_rrf + rank_L(d)), summing only over the
lists in which d appears. Fusion is rank-only, which sidesteps the
score-scale mismatch between BM25 (unbounded, corpus-dependent) and
cosine (bounded [-1, 1]) — no per-list normalization is needed, and
the standard k_rrf = 60 damps the head so a single #1 cannot dominate
two mid-list appearances.

Reference parity: the reference's whole query model is "fuse a text
similarity signal with a second, structural signal into one ranked
top-k" (label-similarity `match` weights folded with neighborhood
costs, `/root/reference/fornax/opt.py:283-394`, ranked output
`api.py:940-952`). Here the two signals are the engine's two retrieval
modalities — term-match BM25 and embedding cosine — fused by rank.

Scale shape: each leg is an already-top-`depth` result (TakeOrdered /
WAND), so the fusion itself touches ≤ Σ depth_i rows TOTAL regardless
of corpus size; one tiny groupBy shuffle, no corpus-sized structure
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: list[DataFrame], k: int = 10, k_rrf: int = 60
) -> DataFrame:
    """Fuse ranked lists -> (rank, doc_id, rrf_score).

    Each input DataFrame must carry (doc_id, rank) with rank 1-based
    within that list. Implemented as union-all + one groupBy over
    ≤ Σ len(list_i) rows — never corpus-sized. Ties on the fused score
    break doc_id ASC; ranks are reassigned 1..k on the fused order.
    """
    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked list")
    u = ranked[0].select("doc_id", "rank")
    for r in ranked[1:]:
        u = u.unionByName(r.select("doc_id", "rank"))
    fused = u.groupBy("doc_id").agg(
        F.sum(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank"))).alias(
            "rrf_score"
        )
    )
    # the fused set is ≤ Σ depth_i rows (inputs are already top-depth
    # lists), so a k-limited global order is a TakeOrderedAndProject,
    # and the rank window below runs over k rows — both bounded by
    # construction, never by corpus size.
    topk = fused.orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    ).limit(k)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("rank", "doc_id", "rrf_score")


def rrf_fuse_batch(
    ranked: list[DataFrame], k: int = 10, k_rrf: int = 60
) -> DataFrame:
    """rrf_fuse for a QUERY BATCH: inputs carry (query_id, doc_id,
    rank) and fusion groups on (query_id, doc_id) ->
    (query_id, rank, doc_id, rrf_score), rank windowed PARTITIONED by
    query_id — no single-partition path at any batch size. Each input
    is already per-query top-depth, so the groupBy touches
    ≤ N·Σ depth_i rows total."""
    if not ranked:
        raise ValueError("rrf_fuse_batch: need at least one ranked list")
    u = ranked[0].select("query_id", "doc_id", "rank")
    for r in ranked[1:]:
        u = u.unionByName(r.select("query_id", "doc_id", "rank"))
    fused = u.groupBy("query_id", "doc_id").agg(
        F.sum(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank"))).alias(
            "rrf_score"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "rrf_score")
        .orderBy("query_id", "rank")
    )


def dense_ranked(
    emb: DataFrame,
    query_vec: list[float],
    depth: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-cosine leg -> (doc_id, rank), rank 1-based, depth rows.

    cosine_topk compiles to TakeOrderedAndProject (per-partition heaps,
    driver merge of `depth` rows); the rank window then runs over those
    ≤ depth rows only.
    """
    from fornax_spark.operators.similarity import cosine_topk

    top = cosine_topk(emb, query_vec, k=depth, id_col=id_col, vec_col=vec_col)
    w = Window.orderBy(F.col("cosine").desc(), F.col("id").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col("id").alias("doc_id"), "rank"
    )


def hybrid_topk(
    spark: SparkSession,
    idx,
    emb: DataFrame,
    query_text: str,
    query_vec: list[float],
    k: int = 10,
    depth: int = 50,
    k_rrf: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BM25 ∧ embedding-cosine hybrid top-k by RRF ->
    (rank, doc_id, rrf_score).

    `idx` is an InvertedIndex (or the store-backed index view); `emb`
    holds (id_col, vec_col). Each leg retrieves its own top-`depth`
    and the fusion runs over ≤ 2·depth rows. A document appearing in
    only one leg scores on that leg alone (standard RRF).
    """
    from .query import search

    lex = search(spark, idx, query_text, k=depth).select("doc_id", "rank")
    den = dense_ranked(emb, query_vec, depth, id_col=id_col, vec_col=vec_col)
    return rrf_fuse([lex, den], k=k, k_rrf=k_rrf)
