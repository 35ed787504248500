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


def union_all(dfs: list[DataFrame]) -> DataFrame:
    return reduce(lambda a, b: a.unionByName(b), dfs)
