"""Spark-native inverted-index build: pages -> postings + stats.

Pipeline (all DataFrame/Arrow, no per-row Python — BASELINE.json
input_hint):

    pages(url, warc_ts, html, text, lang)
      -> doc_id = F.xxhash64(url)            (JVM codegen; oracle parity
                                              proven in tests/test_textproc.py)
      -> text   = extract_udf(html)          (Arrow-vectorized pandas UDF,
                                              shared code path w/ oracle)
      -> tokens = tokenize_udf(text)         (Arrow-vectorized)
      -> postings(term, doc_id, tf, dl)      (explode + hash agg;
                                              map-side combine)
      -> term_stats(term, df)                (hash agg)
      -> corpus stats (n_docs, avgdl)

Scale notes (the part that matters at 10^12 docs):
  * extraction/tokenization are narrow maps — no shuffle, scales linearly.
  * the postings groupBy key is (term, doc_id): near-unique, so head-term
    Zipf skew does NOT skew this shuffle (every row lands on its own key);
    partial aggregation (map-side combine) collapses duplicates early.
  * term_stats groupBy(term) IS skewed under Zipf; Spark's partial count
    makes each map task emit one row per distinct term, so the reduce-side
    hot key receives at most #map-tasks rows — bounded, not data-sized.
  * dl is denormalized into postings (classic doc-length array is
    per-executor state; in DataFrame land the +8B/posting buys us a
    join-free scoring path). The segment/WAND path (segments.py) packs dl
    inside posting blocks instead.

The reference analogue: bulk ingest w/ stable hashed ids
(/root/reference/fornax/api.py:357-489, 31-47) and the match table that
drives candidate generation (api.py:681-751) — postings(term, doc_id, tf)
play the role of matches(v, u, weight).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textproc import extract_text, tokenize


@F.pandas_udf(T.StringType())
def extract_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized HTML->text via the shared extractor."""
    return html.map(lambda b: extract_text(bytes(b)))


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(text: pd.Series) -> pd.Series:
    """Arrow-vectorized tokenizer via the shared code path."""
    return text.map(tokenize)


_TF_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.LongType(), False),
        ]
    )
)


@F.pandas_udf(_TF_TYPE)
def term_counts_udf(text: pd.Series) -> pd.Series:
    """Tokenize AND count per-document term frequencies in one pass.

    tf is a PER-DOCUMENT property, so computing it inside the tokenizer
    makes the postings build a pure narrow map (explode) — the
    groupBy(term, doc_id) shuffle of the naive plan disappears entirely.
    At 10^12 docs that shuffle would be the single largest data movement
    of the whole build; here it never exists."""
    from collections import Counter

    def counts(s: str):
        return [
            {"term": t, "tf": c} for t, c in sorted(Counter(tokenize(s)).items())
        ]

    return text.map(counts)


@dataclass
class CorpusStats:
    n_docs: int
    avgdl: float


def docs_with_tokens(pages: DataFrame, from_html: bool = True) -> DataFrame:
    """pages -> (doc_id, dl, tcounts). doc_id is JVM-side xxhash64(url);
    tcounts = per-doc (term, tf) pairs from the one-pass tokenizer.

    Input is fanned out (functions.fan_out): a one-row-group corpus file
    scans as a single partition and would serialize the tokenizer UDF on
    one core; no-op for already-parallel scans."""
    from ..functions import fan_out

    text_col = extract_udf(F.col("html")) if from_html else F.col("text")
    return fan_out(pages).select(
        F.xxhash64(F.col("url")).alias("doc_id"),
        term_counts_udf(text_col).alias("tcounts"),
    ).withColumn(
        "dl",
        F.aggregate(
            F.col("tcounts"), F.lit(0).cast("long"), lambda acc, x: acc + x["tf"]
        ),
    )


def build_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, tcounts) -> postings(term, doc_id, tf, dl).

    Pure narrow op (explode) — NO shuffle: tf was already counted per
    document inside the tokenizer UDF.
    """
    return docs.select(
        "doc_id", "dl", F.explode("tcounts").alias("tc")
    ).select(
        F.col("tc.term").alias("term"),
        "doc_id",
        F.col("tc.tf").alias("tf"),
        "dl",
    )


def build_term_stats(postings: DataFrame) -> DataFrame:
    """postings -> term_stats(term, df). Partial agg bounds Zipf skew."""
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def corpus_stats(docs: DataFrame) -> CorpusStats:
    row = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n = int(row["n"]) or 0
    return CorpusStats(n_docs=n, avgdl=(float(row["total"]) / n) if n else 0.0)


@dataclass
class InvertedIndex:
    """In-session handle to a built index (DataFrame form)."""

    postings: DataFrame
    term_stats: DataFrame
    stats: CorpusStats

    def persist(self) -> "InvertedIndex":
        self.postings.persist()
        self.term_stats.persist()
        return self


def docs_from_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Adapter: any (id, text) table -> (doc_id, dl, tcounts) using the
    shared tokenizer (for corpora that already carry extracted text).
    Fanned out like docs_with_tokens — the tokenizer is the expensive
    per-row kernel of the whole build."""
    from ..functions import fan_out

    return fan_out(df).select(
        F.col(id_col).cast("long").alias("doc_id"),
        term_counts_udf(F.col(text_col)).alias("tcounts"),
    ).withColumn(
        "dl",
        F.aggregate(
            F.col("tcounts"), F.lit(0).cast("long"), lambda acc, x: acc + x["tf"]
        ),
    )


def build_index_from_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> InvertedIndex:
    docs = docs_from_table(df, id_col, text_col)
    docs.persist()
    stats = corpus_stats(docs)
    postings = build_postings(docs).persist()
    postings.count()
    docs.unpersist()
    return InvertedIndex(
        postings=postings, term_stats=build_term_stats(postings), stats=stats
    )


def index_from_postings(postings: DataFrame) -> InvertedIndex:
    """Reconstruct an index handle from a bare postings table
    (term, doc_id, tf, dl) — the adapter between streamed postings
    DELTAS (streaming.incremental_index_stream) and the segment-store
    builder: each micro-batch delta becomes a small LSM generation
    store, later folded by merge.merge_stores (which re-derives stats
    the same way, so streamed-then-merged == batch-built bit-for-bit on
    token-bearing corpora; test_multimodal_streaming.py). Stats are
    computed from the postings themselves (one dl per doc rides every
    posting) — a document with ZERO tokens has no postings rows and is
    invisible here, shifting n_docs/avgdl vs a build_index over the
    original pages; such a doc can't match any query, but score-parity
    demands the same stats, so corpora with empty docs should pass
    explicit stats instead.

    The returned postings are persisted (two passes: stats + term_stats
    feed the encode); callers own the unpersist."""
    p = postings.persist()
    row = (
        p.dropDuplicates(["doc_id"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total"))
        .collect()[0]
    )
    n = int(row["n"]) or 0
    return InvertedIndex(
        postings=p,
        term_stats=build_term_stats(p),
        stats=CorpusStats(
            n_docs=n, avgdl=(float(row["total"]) / n) if n else 0.0
        ),
    )


def build_index(
    spark: SparkSession, pages: DataFrame, from_html: bool = True
) -> InvertedIndex:
    docs = docs_with_tokens(pages, from_html=from_html)
    docs.persist()
    stats = corpus_stats(docs)  # action: materializes the tokenized cache
    postings = build_postings(docs).persist()
    postings.count()  # materialize postings so docs cache can be dropped
    docs.unpersist()
    return InvertedIndex(
        postings=postings,
        term_stats=build_term_stats(postings),
        stats=stats,
    )
