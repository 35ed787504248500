"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: pure JVM column math (zip_with + aggregate)
  — the correctness baseline; a full scan, but a cheap one (no shuffle
  until the final top-k reduce).
- LSH-bucketed ANN (random hyperplanes): the scale path — signatures
  via one Arrow-vectorized kernel, candidates from bucket equi-joins,
  exact re-rank only within buckets.
- embedding-cosine near-dup pairs: same machinery, pairwise form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_scores(
    df: DataFrame, query_vec: list[float], id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, cosine) vs a constant query vector — JVM-side, scan-only."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    return df.select(F.col(id_col).alias("id"), F.round(cos, 6).alias("cosine"))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k, deterministic (cosine DESC, id ASC).

    orderBy+limit compiles to TakeOrderedAndProject: per-partition
    heaps + a single driver merge of k rows — no global sort shuffle.
    """
    return (
        cosine_scores(df, query_vec, id_col, vec_col)
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# LSH ANN: random hyperplane signatures -> bucket join -> exact re-rank
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — sign pattern of <v, plane_i> packed into an int.

    One Arrow-vectorized kernel; the plane matrix is a closure constant
    (broadcast with the task, a few KB)."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.LongType())
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim) float
        signs = (m.astype(np.float64) @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(signs.astype(np.int64) @ weights)

    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        bucket_udf(F.col(vec_col)).alias("bucket"),
    )


def ann_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH (OR-construction):
    a vector is a candidate if it shares the query's bucket — or a
    Hamming-1 neighbor bucket — in ANY of `n_tables` independent tables.
    Exact cosine re-rank on the candidates only.

    Scale: one Arrow-vectorized kernel computes all table buckets;
    candidate filtering is a scan with an isin predicate per table
    (index-free ANN). A persisted-signature variant would turn this into
    a bucket-join against a signature table."""
    qv = np.asarray(query_vec, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        out = np.empty((m.shape[0], n_tables), dtype=np.int64)
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
            out[:, t] = ((m @ planes.T) > 0).astype(np.int64) @ weights
        return pd.Series(list(out))

    probes = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        qb = int(((planes @ qv) > 0).astype(np.int64) @ (1 << np.arange(n_planes)))
        probes.append({qb} | {qb ^ (1 << i) for i in range(n_planes)})

    sigs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        buckets_udf(F.col(vec_col)).alias("buckets"),
    )
    cond = None
    for t in range(n_tables):
        c = F.element_at(F.col("buckets"), t + 1).isin(sorted(probes[t]))
        cond = c if cond is None else (cond | c)
    cand = sigs.filter(cond)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = _dot(F.col("vec"), q) / (_norm(F.col("vec")) * _norm(q))
    return (
        cand.select(F.col("id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine >= threshold) via LSH bucket equi-join +
    exact JVM re-rank. Never O(n^2)."""
    sigs = hyperplane_signatures(df, dim, n_planes, seed, id_col, vec_col)
    sigs.persist()  # self-joined; avoid recomputing the UDF per side
    a = sigs.alias("a")
    b = sigs.alias("b")
    pairs = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.vec").alias("va"),
        F.col("b.vec").alias("vb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
