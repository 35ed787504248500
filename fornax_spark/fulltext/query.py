"""Query engine: BM25 top-k over the inverted index.

Exhaustive DataFrame path (this module) — the in-engine oracle that the
block-max WAND path (wand.py) must match exactly (WAND == exhaustive is
a test invariant, SURVEY.md §7.2.5).

Determinism contract (rank-identical to oracle.py):
  * per-(term,doc) scores computed by the SAME numpy kernel
    (bm25.term_score) via an Arrow-vectorized pandas UDF;
  * per-doc sum accumulated in ascending term order via
    aggregate(sort_array(collect_list(struct(term, s)))) — fixed
    left-to-right float64 addition, matching the oracle;
  * final order (score DESC, doc_id ASC) — the analogue of the
    reference's deterministic hash tie-break
    (/root/reference/fornax/api.py:973-977,999).

Scale notes:
  * query terms are TINY -> broadcast-joined against postings: the
    billion-row postings table is never shuffled at query time; Catalyst
    prunes the scan to matching terms via the broadcast hash join (and,
    in the segment path, via term-bucket partition pruning).
  * the per-query top-k uses a window by query_id — at 10^12 docs the
    candidate set after term filtering is the only thing shuffled, and
    the WAND path cuts that further with block-max pruning.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import bm25
from .build import InvertedIndex
from .textproc import tokenize


def _score_udf(n_docs: int, avgdl: float):
    @F.pandas_udf(T.DoubleType())
    def score(tf: pd.Series, dl: pd.Series, df: pd.Series) -> pd.Series:
        return pd.Series(
            bm25.term_score(
                tf.to_numpy(), dl.to_numpy(), df.to_numpy(), n_docs, avgdl
            )
        )

    return score


def query_terms_df(spark: SparkSession, queries_pdf: pd.DataFrame) -> DataFrame:
    """(query_id, query_text, k) -> exploded distinct (query_id, term, k).

    Tokenization happens driver-side through the shared tokenizer — the
    query set is small by definition (it is user input, not data).
    """
    rows = []
    for q in queries_pdf.itertuples(index=False):
        for term in sorted(set(tokenize(q.query_text))):
            rows.append((int(q.query_id), term, int(q.k)))
    schema = T.StructType(
        [
            T.StructField("query_id", T.IntegerType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("k", T.IntegerType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema=schema)


def score_batch(idx: InvertedIndex, qterms: DataFrame) -> DataFrame:
    """All queries at once -> (query_id, rank, doc_id, score).

    postings ⋈ broadcast(query terms) ⋈ broadcast(df of those terms):
    no shuffle of the index; one shuffle of candidates for the agg/topk.
    """
    qt = F.broadcast(qterms)
    # df only for the query's terms — tiny, broadcast back
    tstats = F.broadcast(
        idx.term_stats.join(qt.select("term").distinct(), "term", "inner")
    )
    cand = (
        idx.postings.join(qt, "term", "inner")
        .join(tstats, "term", "inner")
        .withColumn(
            "s",
            _score_udf(idx.stats.n_docs, idx.stats.avgdl)(
                F.col("tf"), F.col("dl"), F.col("df")
            ),
        )
    )
    per_doc = cand.groupBy("query_id", "k", "doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x["s"],
        ).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def search(
    spark: SparkSession, idx: InvertedIndex, query_text: str, k: int = 10
) -> DataFrame:
    """Single ad-hoc query -> (rank, doc_id, score)."""
    qpdf = pd.DataFrame([{"query_id": 0, "query_text": query_text, "k": k}])
    out = score_batch(idx, query_terms_df(spark, qpdf))
    return out.select("rank", "doc_id", "score")


def search_boolean(
    spark: SparkSession,
    idx: InvertedIndex,
    should: str = "",
    must: str = "",
    must_not: str = "",
    k: int = 10,
    require_docs: DataFrame | None = None,
    exclude_docs: DataFrame | None = None,
) -> DataFrame:
    """Boolean-filtered BM25 -> (rank, doc_id, score): hits must contain
    ALL `must` terms and NONE of `must_not`; ranking is BM25 over
    must ∪ should terms (Lucene's MUST/SHOULD/MUST_NOT contract).
    `require_docs` / `exclude_docs` (optional one-column doc_id
    DataFrames, e.g. phrase-match sets from the positional index) are
    applied as semi/anti joins BEFORE the top-k cut, so ranking over
    the composed candidate set stays exact.

    ONE postings scan serves all three roles: every term (including the
    exclusions) goes into the same broadcast term join, so the pushed
    `term IN` filter covers them all, and a single groupBy(doc_id)
    computes must-coverage, banned-ness, and the score together —
    must_not never becomes a second scan or a big anti-join side.
    Per-doc sums accumulate in ascending term order (the determinism
    contract shared with score_batch / the DuckDB oracle)."""
    m = sorted(set(tokenize(must)))
    s_terms = sorted(set(tokenize(should)) - set(m))
    ban = sorted(set(tokenize(must_not)))
    if (set(m) | set(s_terms)) & set(ban):
        raise ValueError("search_boolean: a term is both scored and banned")
    if not m and not s_terms:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    rows = (
        [(t, "must") for t in m]
        + [(t, "should") for t in s_terms]
        + [(t, "must_not") for t in ban]
    )
    qt = F.broadcast(spark.createDataFrame(rows, "term string, kind string"))
    tstats = F.broadcast(
        idx.term_stats.join(qt.select("term").distinct(), "term", "inner")
    )
    cand = (
        idx.postings.join(qt, "term", "inner")
        .join(tstats, "term", "left")
        .withColumn(
            "s",
            _score_udf(idx.stats.n_docs, idx.stats.avgdl)(
                F.col("tf"), F.col("dl"), F.coalesce(F.col("df"), F.lit(1.0))
            ),
        )
    )
    per_doc = cand.groupBy("doc_id").agg(
        F.sum(F.when(F.col("kind") == "must", 1).otherwise(0)).alias(
            "must_hits"
        ),
        F.max(F.when(F.col("kind") == "must_not", 1).otherwise(0)).alias(
            "banned"
        ),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "kind", "s"))),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc
            + F.when(x["kind"] != "must_not", x["s"]).otherwise(0.0),
        ).alias("score"),
    )
    hits = per_doc.filter(
        (F.col("must_hits") == len(m)) & (F.col("banned") == 0)
    )
    if require_docs is not None:
        hits = hits.join(
            require_docs.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    if exclude_docs is not None:
        hits = hits.join(
            exclude_docs.select("doc_id").distinct(), "doc_id", "left_anti"
        )
    topk = hits.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    # UNPARTITIONED window — safe ONLY on the k-row limit() output
    # (same contract as wand.py's rank window)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("rank", "doc_id", "score")


def search_weighted(
    spark: SparkSession,
    idx: InvertedIndex,
    weights: dict[str, float],
    k: int = 10,
) -> DataFrame:
    """Term-weighted BM25 -> (rank, doc_id, score): score(d) =
    Σ_t w_t · bm25(t, d). The per-term weights are the full-text
    analogue of the reference's label-similarity match weights, and
    keep its contract — weight ∈ (0, 1], CHECK-enforced at ingest
    (/root/reference/fornax/model.py:49-53); violations raise like the
    reference's IntegrityError."""
    terms = {}
    for t, wgt in weights.items():
        toks = tokenize(t)
        if len(toks) != 1:
            raise ValueError(
                f"search_weighted: {t!r} is not a single term"
            )
        if not 0.0 < float(wgt) <= 1.0:
            raise ValueError(
                f"search_weighted: weight for {t!r} must be in (0, 1], "
                f"got {wgt}"
            )
        terms[toks[0]] = float(wgt)
    if not terms:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    qt = F.broadcast(
        spark.createDataFrame(
            sorted(terms.items()), "term string, w double"
        )
    )
    tstats = F.broadcast(
        idx.term_stats.join(qt.select("term"), "term", "inner")
    )
    cand = (
        idx.postings.join(qt, "term", "inner")
        .join(tstats, "term", "inner")
        .withColumn(
            "s",
            F.col("w")
            * _score_udf(idx.stats.n_docs, idx.stats.avgdl)(
                F.col("tf"), F.col("dl"), F.col("df")
            ),
        )
    )
    per_doc = cand.groupBy("doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x["s"],
        ).alias("score")
    )
    topk = per_doc.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(k)
    # UNPARTITIONED window — safe ONLY on the k-row limit() output
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("rank", "doc_id", "score")


def search_weighted_batch(
    spark: SparkSession,
    idx: InvertedIndex,
    queries: list[dict[str, float]],
    k: int = 10,
) -> DataFrame:
    """ALL term-weighted queries in ONE plan -> (query_id, rank,
    doc_id, score); `queries[i]` is {term: weight}, query_id the list
    index. Same semantics and (0, 1] weight contract as
    search_weighted per query; one broadcast of the exploded
    (query_id, term, w) rows against a single postings scan, score
    accumulated in ascending term order per (query_id, doc_id), rank
    window PARTITIONED by query_id. An empty dict yields no rows for
    its query_id."""
    rows = []
    for qid, weights in enumerate(queries):
        terms = {}
        for t, wgt in weights.items():
            toks = tokenize(t)
            if len(toks) != 1:
                raise ValueError(
                    f"search_weighted_batch: query {qid}: {t!r} is not "
                    "a single term"
                )
            if not 0.0 < float(wgt) <= 1.0:
                raise ValueError(
                    f"search_weighted_batch: query {qid}: weight for "
                    f"{t!r} must be in (0, 1], got {wgt}"
                )
            terms[toks[0]] = float(wgt)
        rows += [(qid, t, w) for t, w in sorted(terms.items())]
    if not rows:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, score double"
        )
    qt = F.broadcast(
        spark.createDataFrame(
            rows, "query_id int, term string, w double"
        )
    )
    tstats = F.broadcast(
        idx.term_stats.join(qt.select("term").distinct(), "term", "inner")
    )
    cand = (
        idx.postings.join(qt, "term", "inner")
        .join(tstats, "term", "inner")
        .withColumn(
            "s",
            F.col("w")
            * _score_udf(idx.stats.n_docs, idx.stats.avgdl)(
                F.col("tf"), F.col("dl"), F.col("df")
            ),
        )
    )
    per_doc = cand.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x["s"],
        ).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def search_boolean_batch(
    spark: SparkSession,
    idx: InvertedIndex,
    queries: list[dict],
    k: int = 10,
) -> DataFrame:
    """ALL boolean queries in ONE plan -> (query_id, rank, doc_id,
    score). `queries[i]` is {"should": str, "must": str,
    "must_not": str} (missing keys default to ""); query_id is the
    list index. Same semantics as search_boolean per query.

    Shape mirrors phrase_match_batch: one broadcast of the exploded
    (query_id, term, kind) rows against the postings scan (every
    query's terms share the single pushed term filter), one
    groupBy(query_id, doc_id) computing must-coverage, banned-ness and
    the ascending-term score together, and a rank window PARTITIONED
    by query_id — no single-partition path at any batch size."""
    rows = []
    n_must: dict[int, int] = {}
    any_scored = False
    for qid, q in enumerate(queries):
        m = sorted(set(tokenize(q.get("must", ""))))
        s = sorted(set(tokenize(q.get("should", ""))) - set(m))
        b = sorted(set(tokenize(q.get("must_not", ""))))
        if (set(m) | set(s)) & set(b):
            raise ValueError(
                f"search_boolean_batch: query {qid} has a term both "
                "scored and banned"
            )
        if not m and not s:
            continue  # empty query: no rows for this query_id
        any_scored = True
        n_must[qid] = len(m)
        rows += (
            [(qid, t, "must") for t in m]
            + [(qid, t, "should") for t in s]
            + [(qid, t, "must_not") for t in b]
        )
    if not any_scored:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, score double"
        )
    qt = F.broadcast(
        spark.createDataFrame(
            rows, "query_id int, term string, kind string"
        )
    )
    nm = F.broadcast(
        spark.createDataFrame(
            sorted(n_must.items()), "query_id int, n_must int"
        )
    )
    tstats = F.broadcast(
        idx.term_stats.join(qt.select("term").distinct(), "term", "inner")
    )
    cand = (
        idx.postings.join(qt, "term", "inner")
        .join(tstats, "term", "inner")
        .withColumn(
            "s",
            _score_udf(idx.stats.n_docs, idx.stats.avgdl)(
                F.col("tf"), F.col("dl"), F.col("df")
            ),
        )
    )
    per_doc = cand.groupBy("query_id", "doc_id").agg(
        F.sum(F.when(F.col("kind") == "must", 1).otherwise(0)).alias(
            "must_hits"
        ),
        F.max(F.when(F.col("kind") == "must_not", 1).otherwise(0)).alias(
            "banned"
        ),
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "kind", "s"))),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc
            + F.when(x["kind"] != "must_not", x["s"]).otherwise(0.0),
        ).alias("score"),
    )
    hits = per_doc.join(nm, "query_id").filter(
        (F.col("must_hits") == F.col("n_must")) & (F.col("banned") == 0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def facet_counts(
    spark: SparkSession,
    idx: InvertedIndex,
    docs: DataFrame,
    query_text: str,
    facet_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Facet counts over a query's FULL match set (any-term match, the
    standard search-facet contract): -> (facet_col, n_docs).

    Scale shape: the postings term filter is pushed to the scan; the
    distinct match set and the join back to `docs` shuffle only
    matching doc_ids plus the one facet column, never text. The facet
    rollup itself is a map-side-combined groupBy over a low-cardinality
    key."""
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        return spark.createDataFrame([], f"{facet_col} string, n_docs long")
    matched = (
        idx.postings.filter(F.col("term").isin(terms))
        .select("doc_id")
        .distinct()
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), facet_col)
        .join(matched, "doc_id")
        .groupBy(facet_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def suggest_terms(
    idx: InvertedIndex, prefix: str, k: int = 10
) -> DataFrame:
    """Prefix completion over the vocabulary: the top-k index terms
    starting with `prefix`, ranked by document frequency ->
    (term, df), order (df DESC, term ASC).

    The prefix is normalized through the tokenizer (lowercase,
    [a-z0-9]+); a prefix that normalizes to nothing returns 0 rows.
    Scale shape: a filter + TakeOrderedAndProject over the
    vocabulary-sized term_stats relation — no postings are touched and
    no corpus-sized shuffle exists."""
    norm = tokenize(prefix)
    if len(norm) != 1:
        # empty / punctuation-only / multi-token "prefix" → no matches
        return idx.term_stats.filter(F.lit(False)).select("term", "df")
    return (
        idx.term_stats.filter(F.col("term").startswith(norm[0]))
        .select("term", "df")
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(k)
    )


def related_terms(
    idx: InvertedIndex,
    seed: str,
    k: int = 10,
    min_df: int = 2,
) -> DataFrame:
    """Terms most associated with `seed` by pointwise mutual
    information over document co-occurrence -> (term, df_co, pmi):
    pmi(t) = ln(n_docs · df_st / (df_s · df_t)) where df_st = number of
    docs containing BOTH terms. The "related searches" primitive.

    Ordering is by the PMI argument ratio (rational arithmetic — one
    IEEE division of exact integers, so any SQL engine reproduces the
    order bit for bit; ln is monotonic so the order IS the PMI order),
    ties term ASC. `min_df` floors df_st to suppress one-off
    co-occurrences.

    Scale shape: the seed's doc list comes from the pushed term filter
    (df_s rows); the co-occurrence join re-shuffles only (term, doc_id)
    pairs of those docs — postings rows are unique per (term, doc), so
    the groupBy count IS the co-document frequency. No corpus-sized
    collect; the seed-doc side stays a distributed join input."""
    norm = tokenize(seed)
    if len(norm) != 1:
        raise ValueError("related_terms: seed must be a single term")
    s = norm[0]
    seed_docs = (
        idx.postings.filter(F.col("term") == s).select("doc_id")
    )
    co = (
        idx.postings.select("term", "doc_id")
        .join(seed_docs, "doc_id")
        .filter(F.col("term") != s)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_co"))
        .filter(F.col("df_co") >= min_df)
    )
    df_s = idx.term_stats.filter(F.col("term") == s).select("df")
    n = float(idx.stats.n_docs)
    out = (
        co.join(idx.term_stats.withColumnRenamed("df", "df_t"), "term")
        .crossJoin(F.broadcast(df_s.withColumnRenamed("df", "df_s")))
        .withColumn(
            "ratio",
            F.lit(n)
            * F.col("df_co")
            / (F.col("df_s") * F.col("df_t")),
        )
        .withColumn("pmi", F.log(F.col("ratio")))
    )
    return (
        out.orderBy(F.col("ratio").desc(), F.col("term").asc())
        .limit(k)
        .select("term", "df_co", F.round("pmi", 6).alias("pmi"))
    )


def mlt_query_terms(
    idx: InvertedIndex, doc_id: int, max_terms: int = 10
) -> list[str]:
    """The top `max_terms` terms of one document by tf·idf, the
    "more like this" query-building step (Lucene MLT's term selection,
    with the BM25 idf so the weight is always positive):
    weight = tf · ln(1 + (n − df + 0.5)/(df + 0.5)), ties term ASC.

    The collect is ≤ max_terms rows by construction (a bounded
    TakeOrderedAndProject over the single doc's postings, reached by a
    pushed doc_id filter) — this is query BUILDING, not retrieval."""
    n = float(idx.stats.n_docs)
    rows = (
        idx.postings.filter(F.col("doc_id") == doc_id)
        .join(idx.term_stats, "term")
        .withColumn(
            "w",
            F.col("tf")
            * F.log(
                F.lit(1.0)
                + (F.lit(n) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .orderBy(F.col("w").desc(), F.col("term").asc())
        .limit(max_terms)
        .select("term")
        .collect()
    )
    return [r["term"] for r in rows]


def more_like_this(
    spark: SparkSession,
    idx: InvertedIndex,
    doc_id: int,
    k: int = 10,
    max_terms: int = 10,
) -> DataFrame:
    """Documents most similar to `doc_id`: BM25 over the doc's top
    tf·idf terms (mlt_query_terms), the source doc excluded ->
    (rank, doc_id, score). An unknown doc_id returns 0 rows."""
    terms = mlt_query_terms(idx, doc_id, max_terms=max_terms)
    if not terms:
        return spark.createDataFrame(
            [], "rank int, doc_id long, score double"
        )
    hits = search(spark, idx, " ".join(terms), k=k + 1).filter(
        F.col("doc_id") != doc_id
    )
    # re-rank over ≤ k+1 rows (bounded by the search k, not the corpus)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "score")
    )


def search_collapsed(
    spark: SparkSession,
    idx: InvertedIndex,
    query_text: str,
    clusters: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Duplicate-collapsed BM25 top-k — the deduplicated-SERP verb:
    ONE result per near-duplicate cluster (its best-scoring member,
    ties doc_id ASC) -> (rank, cluster_id, doc_id, score).

    `clusters` carries (doc_id, cluster_id) for CLUSTERED docs
    (dedup.dup_clusters' output shape); docs absent from it are
    singletons (cluster_id = own doc_id). The collapse happens BEFORE
    the top-k cut, so suppressed duplicates free their slots exactly.

    Scale shape: scoring is the standard pushed-term-filter candidate
    aggregation; the cluster map joins on doc_id over the candidate
    set only (never the corpus), and the per-cluster argmax is one
    more map-side-combinable agg. The scores equal search()'s
    bit for bit (same ascending-term fold)."""
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        return spark.createDataFrame(
            [], "rank int, cluster_id long, doc_id long, score double"
        )
    qt = F.broadcast(
        spark.createDataFrame([(t,) for t in terms], "term string")
    )
    tstats = F.broadcast(idx.term_stats.join(qt, "term", "inner"))
    cand = (
        idx.postings.join(qt, "term", "inner")
        .join(tstats, "term", "inner")
        .withColumn(
            "s",
            _score_udf(idx.stats.n_docs, idx.stats.avgdl)(
                F.col("tf"), F.col("dl"), F.col("df")
            ),
        )
    )
    per_doc = cand.groupBy("doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "s"))),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x["s"],
        ).alias("score")
    )
    joined = per_doc.join(
        clusters.select("doc_id", "cluster_id"), "doc_id", "left"
    ).withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    # deterministic per-cluster argmax: min(struct(-score, doc_id)) ==
    # (max score, then min doc_id); BM25 scores are strictly positive
    # so the negation cannot hit the -0.0 == 0.0 corner
    best = joined.groupBy("cluster_id").agg(
        F.min(
            F.struct(
                (-F.col("score")).alias("neg"),
                F.col("doc_id").alias("doc_id"),
            )
        ).alias("b")
    ).select(
        "cluster_id",
        F.col("b.doc_id").alias("doc_id"),
        (-F.col("b.neg")).alias("score"),
    )
    topk = best.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(k)
    # UNPARTITIONED window — safe ONLY on the k-row limit() output
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("rank", "cluster_id", "doc_id", "score")


def more_like_this_batch(
    spark: SparkSession,
    idx: InvertedIndex,
    doc_ids: list[int],
    k: int = 10,
    max_terms: int = 10,
) -> DataFrame:
    """more_like_this for a WHOLE result page in one plan ->
    (query_id, rank, doc_id, score), query_id = position in `doc_ids`.

    Term selection for every source doc happens in ONE pass (pushed
    doc_id isin filter + a query_id-partitioned rank window over the
    sources' postings only); the selected (query_id, term) rows —
    ≤ N·max_terms by construction — feed the standard batch scorer,
    and the source docs are excluded per query BEFORE the final
    re-rank (over ≤ k+1 rows per query). Per-query results equal
    more_like_this bit for bit; an unknown source doc yields no rows
    for its query_id."""
    if not doc_ids:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, score double"
        )
    n = float(idx.stats.n_docs)
    src = spark.createDataFrame(
        [(i, int(d)) for i, d in enumerate(doc_ids)],
        "query_id int, src_doc long",
    )
    w_sel = Window.partitionBy("query_id").orderBy(
        F.col("w").desc(), F.col("term").asc()
    )
    sel = (
        idx.postings.filter(
            F.col("doc_id").isin([int(d) for d in set(doc_ids)])
        )
        .join(F.broadcast(src), F.col("doc_id") == F.col("src_doc"))
        .join(idx.term_stats, "term")
        .withColumn(
            "w",
            F.col("tf")
            * F.log(
                F.lit(1.0)
                + (F.lit(n) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn("r", F.row_number().over(w_sel))
        .filter(F.col("r") <= max_terms)
        .select("query_id", "term")
        .collect()  # ≤ N·max_terms rows — query building, not retrieval
    )
    if not sel:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, score double"
        )
    qterms = spark.createDataFrame(
        [(int(r["query_id"]), r["term"], k + 1) for r in sel],
        "query_id int, term string, k int",
    )
    hits = (
        score_batch(idx, qterms)
        .join(F.broadcast(src), "query_id")
        .filter(F.col("doc_id") != F.col("src_doc"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
        .orderBy("query_id", "rank")
    )


def union_all(dfs: list[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), dfs)
