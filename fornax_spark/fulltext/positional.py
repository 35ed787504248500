"""Positional postings + phrase / ordered-proximity search.

Beyond-reference fulltext capability (the reference engine's index is
tf-only — /root/reference/fornax/api.py:681-751 builds matches(v, u,
weight) with no position payload): a positional inverted index and the
two classic queries it unlocks, exact phrase and ordered proximity
("a" before "b" within g tokens).

Spark-first design, mirroring build.py's no-shuffle trick:

    pages/docs -> term_positions_udf (Arrow, one pass, emits per-doc
                  [{term, positions}] with positions ASC)
               -> explode               (narrow map — NO groupBy shuffle:
                                         positions are a per-document
                                         property, computed where the
                                         document already is)
               -> postings(term, doc_id, positions, tf, dl)

Query = filter the positional postings to the phrase's terms (pushed
to the parquet scan), ONE shuffle of only the candidate docs
(groupBy doc_id — near-unique key, Zipf-proof), then a JVM-side
higher-order-function fold over the term sequence:

    acc_0 = positions(t_0)
    acc_i = [ p in positions(t_i) | exists q in acc_{i-1}:
                                      1 <= p - q <= max_gap ]
    phrase_tf = |acc_{k-1}|          (distinct phrase END positions)

max_gap=1 is exact phrase (consecutive tokens); max_gap=g is ordered
proximity. The fold runs entirely in Tungsten (F.aggregate/F.filter/
F.exists on int arrays) — no Python in the query hot path, and the
per-doc arrays are token positions of ONE document, so the work is
bounded by document length, never corpus size.

Scale: at 10^12 docs the positional index is ~2-4x the tf-only index
bytes (delta-coded positions dominate); the query plan shuffles only
docs containing ALL phrase terms — for a selective phrase that is
orders of magnitude below corpus size, and the groupBy key (doc_id)
is unique so AQE coalescing keeps reduce tasks balanced.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textproc import tokenize

_POS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField(
                "positions", T.ArrayType(T.IntegerType(), False), False
            ),
        ]
    )
)


@F.pandas_udf(_POS_TYPE)
def term_positions_udf(text: pd.Series) -> pd.Series:
    """Tokenize AND collect 1-based token positions per term, one pass.

    Positions are 1-based to mirror SQL generate_subscripts(toks, 1),
    which is what lets a DuckDB oracle verify the whole positional
    pipeline (driver entry ft_phrase_topk)."""

    def positions(s: str):
        acc: dict[str, list[int]] = {}
        for i, t in enumerate(tokenize(s), start=1):
            acc.setdefault(t, []).append(i)
        return [
            {"term": t, "positions": ps} for t, ps in sorted(acc.items())
        ]

    return text.map(positions)


def build_positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """docs(doc_id, text) -> postings(term, doc_id, positions, tf, dl).

    Narrow map + explode, no shuffle (see module docstring). dl is
    denormalized per posting exactly as in build.py so BM25-style
    scoring over the positional index needs no doc-length join.
    Input fanned out like build.docs_from_table — the positional
    tokenizer is the expensive per-row kernel of the sidecar build.
    """
    from ..functions import fan_out

    docs = fan_out(docs)
    with_pos = docs.select(
        F.col(id_col).alias("doc_id"),
        term_positions_udf(F.col(text_col)).alias("tpos"),
    ).withColumn(
        "dl",
        F.aggregate(
            F.col("tpos"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.size(x["positions"]),
        ),
    )
    return with_pos.select(
        "doc_id", "dl", F.explode("tpos").alias("tp")
    ).select(
        F.col("tp.term").alias("term"),
        "doc_id",
        F.col("tp.positions").alias("positions"),
        F.size("tp.positions").cast("long").alias("tf"),
        "dl",
    )


def _fold_phrase(pmap: Column, terms: list[str], max_gap: int) -> Column:
    """Driver-side construction of the adjacency fold expression.

    Each step is a JVM higher-order filter; for max_gap=1 the predicate
    degenerates to p - q == 1 (exact adjacency). Position arrays are
    per-term-per-doc, already distinct and ascending, so |acc| counts
    distinct phrase end positions.
    """
    acc = F.element_at(pmap, terms[0])
    for t in terms[1:]:
        prev = acc
        acc = F.filter(
            F.element_at(pmap, t),
            lambda p: F.exists(
                prev,
                lambda q: (p - q >= F.lit(1)) & (p - q <= F.lit(max_gap)),
            ),
        )
    return acc


def phrase_match(
    postings: DataFrame, terms: list[str], max_gap: int = 1
) -> DataFrame:
    """Positional postings -> (doc_id, phrase_tf, dl) for docs where the
    term sequence occurs in order with consecutive gaps in [1, max_gap].

    max_gap=1: exact phrase. max_gap=g>1: ordered proximity. phrase_tf
    counts distinct end positions of the match (deterministic and
    SQL-mirrorable: the DuckDB oracle chains pos-joins and counts
    DISTINCT final positions).
    """
    if not terms:
        raise ValueError("phrase_match: empty term list")
    if max_gap < 1:
        raise ValueError(f"phrase_match: max_gap must be >= 1, got {max_gap}")
    distinct = sorted(set(terms))
    cand = (
        postings.filter(F.col("term").isin(distinct))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
            ).alias("pmap"),
            F.first("dl").alias("dl"),
        )
        .filter(F.size(F.map_keys(F.col("pmap"))) == len(distinct))
    )
    return (
        cand.withColumn(
            "phrase_tf",
            F.size(_fold_phrase(F.col("pmap"), terms, max_gap)).cast("long"),
        )
        .filter(F.col("phrase_tf") > 0)
        .select("doc_id", "phrase_tf", "dl")
    )


def phrase_match_batch(
    spark: SparkSession,
    postings: DataFrame,
    phrases: list[str],
    max_gap: int = 1,
) -> DataFrame:
    """ALL phrases in ONE plan -> (query_id, doc_id, phrase_tf).

    The serving-scale form of phrase_match: a 1000-phrase batch is one
    job, not 1000. The adjacency fold here is DATA-DRIVEN — the term
    sequence is a column, so one F.aggregate over it replaces the
    per-phrase Python loop that builds expressions in phrase_match:

        postings ⋈ broadcast(distinct phrase terms)     index never shuffles
        groupBy(query_id, doc_id) -> pmap               one shuffle, key is
                                                        near-unique
        F.aggregate(terms[1:], pmap[terms[0]],
                    acc -> filter(pmap[t], p ->
                           exists(acc, q -> 1<=p-q<=max_gap)))

    Docs missing any phrase term yield an empty/null fold result and
    drop out via the phrase_tf > 0 filter (element_at on a missing map
    key returns NULL; F.filter propagates it, F.size(NULL) = -1).
    """
    if max_gap < 1:
        raise ValueError(f"phrase_match_batch: max_gap >= 1, got {max_gap}")
    rows = []
    for qid, ph in enumerate(phrases):
        terms = tokenize(ph)
        if terms:
            rows.append((qid, terms))
    if not rows:
        return spark.createDataFrame(
            [], "query_id int, doc_id long, phrase_tf long"
        )
    qdf = spark.createDataFrame(rows, "query_id int, terms array<string>")
    qterms = F.broadcast(
        qdf.select("query_id", "terms", F.explode("terms").alias("term")).distinct()
    )
    cand = (
        postings.join(qterms, "term", "inner")
        .groupBy("query_id", "doc_id")
        .agg(
            F.map_from_entries(
                F.collect_set(F.struct("term", "positions"))
            ).alias("pmap"),
            F.first("terms").alias("terms"),
        )
    )
    folded = cand.withColumn(
        "acc",
        F.aggregate(
            F.slice(F.col("terms"), 2, F.size("terms") - 1),
            F.element_at(F.col("pmap"), F.element_at(F.col("terms"), 1)),
            lambda acc, t: F.filter(
                F.element_at(F.col("pmap"), t),
                lambda p: F.exists(
                    acc,
                    lambda q: (p - q >= F.lit(1)) & (p - q <= F.lit(max_gap)),
                ),
            ),
        ),
    )
    return (
        folded.withColumn("phrase_tf", F.size("acc").cast("long"))
        .filter(F.col("phrase_tf") > 0)
        .select("query_id", "doc_id", "phrase_tf")
    )


def phrase_topk_batch(
    spark: SparkSession,
    postings: DataFrame,
    phrases: list[str],
    k: int = 10,
    max_gap: int = 1,
) -> DataFrame:
    """Batched top-k: (query_id, rank, doc_id, phrase_tf), rank by
    (phrase_tf DESC, doc_id ASC) within each query — the window IS
    partitioned (by query_id), so this path has no single-partition
    bottleneck at any batch size."""
    from pyspark.sql import Window

    hits = phrase_match_batch(spark, postings, phrases, max_gap=max_gap)
    w = Window.partitionBy("query_id").orderBy(
        F.col("phrase_tf").desc(), F.col("doc_id").asc()
    )
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "phrase_tf")
        .orderBy("query_id", "rank")
    )


def _min_window_best(terms: list[str]) -> Column:
    """The minimal-covering-window sweep as one Tungsten F.aggregate
    over a pmap column: merge the per-term position arrays into a
    pos-ascending (pos, tid) array, fold an accumulator holding the
    last-seen position per term (SCALAR struct fields l0..l{k-1}, not
    an array -- rebuilding a k-array per element via F.transform
    measured 25.2 vs 21.2 s p50 on the 600k-doc 3-head-term sweep;
    the dominant cost is the candidate pmap construction itself, which
    the page-scoped min_window_for_docs avoids entirely, 0.57 s on the
    same corpus) plus the best window so far. At
    each element the candidate window is [min(last_seen), pos]; only a
    STRICTLY smaller length replaces the best, so ties keep the
    earliest endpoint (the contract the DuckDB oracle mirrors with
    ORDER BY len, end). Returns struct(best_s, best_e, best_len)."""
    n = len(terms)

    def _tag(tid: int):
        # NB: must be a ONE-arg lambda -- F.transform dispatches on
        # lambda arity, and a two-arg lambda would receive the array
        # index as its second argument (shadowing a default-bound tid)
        return lambda p: F.struct(p.alias("pos"), F.lit(tid).alias("tid"))

    merged = F.sort_array(
        F.flatten(
            F.array(
                *[
                    F.transform(F.element_at(F.col("pmap"), t), _tag(i))
                    for i, t in enumerate(terms)
                ]
            )
        )
    )
    sentinel = 1 << 30

    def step(acc, x):
        new_last = [
            F.when(x["tid"] == i, x["pos"]).otherwise(acc[f"l{i}"])
            for i in range(n)
        ]
        s = F.least(*new_last) if n > 1 else new_last[0]
        complete = new_last[0] != F.lit(-1)
        for nl in new_last[1:]:
            complete = complete & (nl != F.lit(-1))
        ln = x["pos"] - s + F.lit(1)
        better = complete & (ln < acc["best_len"])
        return F.struct(
            *[nl.alias(f"l{i}") for i, nl in enumerate(new_last)],
            F.when(better, ln).otherwise(acc["best_len"]).alias("best_len"),
            F.when(better, s).otherwise(acc["best_s"]).alias("best_s"),
            F.when(better, x["pos"]).otherwise(acc["best_e"]).alias("best_e"),
        )

    init = F.struct(
        *[F.lit(-1).alias(f"l{i}") for i in range(n)],
        F.lit(sentinel).alias("best_len"),
        F.lit(-1).alias("best_s"),
        F.lit(-1).alias("best_e"),
    )
    return F.aggregate(merged, init, step)


def _min_window_candidates(
    postings: DataFrame, terms: list[str]
) -> DataFrame:
    """Docs containing ALL terms -> (doc_id, pmap); the same pushed
    term filter + one near-unique-key shuffle shape as phrase_match."""
    return (
        postings.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
            ).alias("pmap")
        )
        .filter(F.size(F.map_keys(F.col("pmap"))) == len(terms))
    )


def _min_window_select(cand: DataFrame, terms: list[str]) -> DataFrame:
    return cand.select(
        "doc_id", _min_window_best(terms).alias("acc")
    ).select(
        "doc_id",
        F.col("acc.best_s").alias("win_start"),
        F.col("acc.best_e").alias("win_end"),
        F.col("acc.best_len").alias("win_len"),
    )


def min_window_topk(
    spark: SparkSession,
    postings: DataFrame,
    query_text: str,
    k: int = 10,
) -> DataFrame:
    """Proximity ranking by snippet window: for EVERY doc containing
    ALL query terms, the SMALLEST token window [win_start, win_end]
    (1-based, inclusive) covering at least one occurrence of every
    distinct term -> top-k by (win_len ASC, doc_id ASC), rank attached.

    This is the corpus-wide form (it ranks BY window length, so every
    candidate doc runs the sweep; work per doc is bounded by that doc's
    query-term occurrences). For the serving pattern -- snippets for an
    already-ranked result page -- use min_window_for_docs, which scopes
    the sweep to the page's docs and costs O(page), never O(corpus).
    """
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        return spark.createDataFrame(
            [],
            "rank int, doc_id long, win_start int, win_end int, win_len int",
        )
    best = _min_window_select(
        _min_window_candidates(postings, terms), terms
    )
    topk = best.orderBy(
        F.col("win_len").asc(), F.col("doc_id").asc()
    ).limit(k)
    from pyspark.sql import Window

    # UNPARTITIONED window -- safe ONLY on the k-row limit() output
    assert k <= 10_000, f"rank window is single-partition; k={k} too large"
    w = Window.orderBy(F.col("win_len").asc(), F.col("doc_id").asc())
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("rank", "doc_id", "win_start", "win_end", "win_len")


def min_window_for_docs(
    spark: SparkSession,
    postings: DataFrame,
    query_text: str,
    doc_ids: list[int],
) -> DataFrame:
    """Snippet windows for an ALREADY-RANKED result page: the same
    minimal-covering-window sweep, scoped to `doc_ids` (the k docs a
    BM25 query returned) -> (doc_id, win_start, win_end, win_len);
    docs missing a term (or unknown ids) are absent from the result.

    This is the scalable serving shape -- snippet cost is O(result
    page), never O(corpus): the doc_id filter composes with the pushed
    term filter so only the page's postings rows leave the scan."""
    terms = sorted(set(tokenize(query_text)))
    ids = sorted(set(int(i) for i in doc_ids))
    if not terms or not ids:
        return spark.createDataFrame(
            [], "doc_id long, win_start int, win_end int, win_len int"
        )
    cand = _min_window_candidates(
        postings.filter(F.col("doc_id").isin(ids)), terms
    )
    return _min_window_select(cand, terms).orderBy("doc_id")


class PositionalStore:
    """Durable positional index: the positional postings written as
    term-range-partitioned, (term, doc_id)-sorted parquet.

    Spark-first storage choice: positions are int arrays, and Parquet's
    own encodings (delta/RLE + zstd) compress them; the layout work —
    what actually decides query cost — is (a) range partitioning by
    (term, doc_id) so a Zipf head term spreads over several files
    instead of hot-spotting one, and (b) within-partition sort by term
    so every row group's min/max term stats are tight and a phrase's
    `term IN (...)` pushed filter prunes to the handful of row groups
    holding those terms. No custom codec to maintain, and the store is
    readable by any parquet reader.

    Lifecycle verbs (LSM, same shape as the segment store's facade —
    the reference runs its whole lifecycle through handle verbs,
    /root/reference/fornax/api.py:327-416):

      * add_docs    — new docs become a DELTA GENERATION directory with
                      the same layout; reads union the generations in
                      one scan. Duplicate doc_ids raise.
      * delete_docs — ledger tombstones masked at query time with EXACT
                      shifted stats (n_docs/avgdl == a rebuild without
                      the docs, the deletes.py invariant).
      * compact     — fold generations minus tombstones into ONE fresh
                      generation; queries afterward == a clean rebuild.

    Tombstones live in the JSON ledger, so the delete list is
    driver-sized by construction; at web scale a delete wave past that
    belongs in compact(), not the ledger.
    """

    FORMAT = 1

    def __init__(
        self,
        path: str,
        n_docs: int,
        avgdl: float,
        generations: list[str] | None = None,
        tombstones: list[int] | None = None,
        total_dl: int | None = None,
        n_partitions: int | None = None,
    ):
        self.path = path
        self.n_docs = n_docs
        self.avgdl = avgdl
        self.generations = generations or ["postings"]
        self.tombstones = sorted(tombstones or [])
        # exact running token total (avgdl = total_dl / n_docs); ledgers
        # written before the lifecycle verbs lack it — reconstruct from
        # avgdl (exact: avgdl was computed as total/n on write)
        self.total_dl = (
            int(round(avgdl * n_docs)) if total_dl is None else int(total_dl)
        )
        self.n_partitions = n_partitions

    def postings(self, spark: SparkSession) -> DataFrame:
        """Live postings: all generations in ONE multi-path scan (the
        term filter still pushes down to every file), minus tombstoned
        docs via a broadcast anti-join (ledger-sized list)."""
        import os

        df = spark.read.parquet(
            *(os.path.join(self.path, g) for g in self.generations)
        )
        if self.tombstones:
            t = spark.createDataFrame(
                [(int(i),) for i in self.tombstones], "doc_id long"
            )
            df = df.join(F.broadcast(t), "doc_id", "left_anti")
        return df

    # -- lifecycle verbs ------------------------------------------------

    def _write_ledger(self) -> None:
        import json
        import os

        ledger = {
            "format": self.FORMAT,
            "n_docs": self.n_docs,
            "avgdl": self.avgdl,
            "n_partitions": self.n_partitions,
            "generations": self.generations,
            "tombstones": self.tombstones,
            "total_dl": self.total_dl,
        }
        tmp = os.path.join(self.path, "ledger.json.tmp")
        with open(tmp, "w") as f:
            json.dump(ledger, f)
        os.replace(tmp, os.path.join(self.path, "ledger.json"))

    def add_docs(
        self,
        spark: SparkSession,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "PositionalStore":
        """Incremental ingest: write `docs` as a new delta generation.

        Validation mirrors the segment facade's contract: a doc_id
        duplicated WITHIN the batch or already LIVE in the store raises
        ValueError (the reference's duplicate-id IntegrityError,
        /root/reference/fornax/api.py:357-416); a doc_id still in the
        tombstone list raises too — compact() first, else the query-time
        tombstone mask would swallow the re-added rows."""
        import os

        new_ids = docs.select(F.col(id_col).alias("doc_id"))
        dup = (
            new_ids.groupBy("doc_id")
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"add_docs: doc_id {dup[0]['doc_id']} duplicated within "
                "the batch"
            )
        if self.tombstones:
            t = spark.createDataFrame(
                [(int(i),) for i in self.tombstones], "doc_id long"
            )
            hit = new_ids.join(F.broadcast(t), "doc_id").limit(1).collect()
            if hit:
                raise ValueError(
                    f"add_docs: doc_id {hit[0]['doc_id']} is tombstoned — "
                    "compact() before re-adding it"
                )
        live = (
            self.postings(spark)
            .select("doc_id")
            .join(new_ids.distinct(), "doc_id")
            .limit(1)
            .collect()
        )
        if live:
            raise ValueError(
                f"add_docs: doc_id {live[0]['doc_id']} already live in the "
                "store — delete_docs + compact to replace it"
            )
        gen = f"postings_d{len(self.generations) + 1}"
        postings = build_positional_postings(
            docs, id_col=id_col, text_col=text_col
        )
        nparts = self.n_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        (
            postings.repartitionByRange(nparts, "term", "doc_id")
            .sortWithinPartitions("term", "doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(self.path, gen))
        )
        n_new = docs.count()  # zero-token docs count toward n_docs
        row = (
            spark.read.parquet(os.path.join(self.path, gen))
            .groupBy("doc_id")
            .agg(F.first("dl").alias("dl"))
            .agg(F.sum("dl").alias("total"))
            .collect()[0]
        )
        self.generations.append(gen)
        self.n_docs += n_new
        self.total_dl += int(row["total"] or 0)
        self.avgdl = self.total_dl / self.n_docs if self.n_docs else 0.0
        self._write_ledger()
        return self

    def delete_docs(
        self, spark: SparkSession, doc_ids: list[int]
    ) -> "PositionalStore":
        """Tombstone `doc_ids` with exact shifted stats: n_docs/avgdl
        afterward equal a rebuild without the docs (only ids actually
        present in the store shift the stats — same contract as the
        segment store's deletes.py)."""
        want = sorted(set(int(i) for i in doc_ids) - set(self.tombstones))
        if not want:
            return self
        ids = spark.createDataFrame([(i,) for i in want], "doc_id long")
        present = (
            self.postings(spark)
            .join(F.broadcast(ids), "doc_id")
            .groupBy("doc_id")
            .agg(F.first("dl").alias("dl"))
            .collect()
        )
        if not present:
            return self
        self.tombstones = sorted(
            set(self.tombstones) | {int(r["doc_id"]) for r in present}
        )
        self.n_docs -= len(present)
        self.total_dl -= int(sum(r["dl"] for r in present))
        self.avgdl = self.total_dl / self.n_docs if self.n_docs else 0.0
        self._write_ledger()
        return self

    def compact(self, spark: SparkSession) -> "PositionalStore":
        """Fold all generations minus tombstones into ONE fresh
        generation directory (written fully before the ledger swap, so a
        crash leaves the old state readable), then drop the old dirs."""
        import os
        import shutil

        nparts = self.n_partitions or int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        n = 1
        while f"postings_g{n}" in self.generations or os.path.exists(
            os.path.join(self.path, f"postings_g{n}")
        ):
            n += 1
        gen = f"postings_g{n}"
        (
            self.postings(spark)
            .repartitionByRange(nparts, "term", "doc_id")
            .sortWithinPartitions("term", "doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(self.path, gen))
        )
        old = list(self.generations)
        self.generations = [gen]
        self.tombstones = []
        self._write_ledger()
        for g in old:
            shutil.rmtree(os.path.join(self.path, g), ignore_errors=True)
        return self

    def phrase_topk(
        self, spark: SparkSession, phrase: str, k: int = 10, max_gap: int = 1
    ) -> DataFrame:
        return phrase_topk(
            spark, self.postings(spark), phrase, k=k, max_gap=max_gap
        )

    def phrase_bm25_topk(
        self, spark: SparkSession, phrase: str, k: int = 10, max_gap: int = 1
    ) -> DataFrame:
        return phrase_bm25_topk(
            spark,
            self.postings(spark),
            phrase,
            n_docs=self.n_docs,
            avgdl=self.avgdl,
            k=k,
            max_gap=max_gap,
        )

    def min_window_topk(
        self, spark: SparkSession, query_text: str, k: int = 10
    ) -> DataFrame:
        return min_window_topk(spark, self.postings(spark), query_text, k=k)

    def min_window_for_docs(
        self, spark: SparkSession, query_text: str, doc_ids: list[int]
    ) -> DataFrame:
        return min_window_for_docs(
            spark, self.postings(spark), query_text, doc_ids
        )


def write_positional_store(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int | None = None,
) -> PositionalStore:
    """Build positional postings from docs and persist them as a
    PositionalStore at `path` (see class docstring for the layout)."""
    postings = build_positional_postings(docs, id_col=id_col, text_col=text_col)
    if n_partitions is None:
        n_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    (
        postings.repartitionByRange(n_partitions, "term", "doc_id")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )
    n_docs = docs.count()
    # avgdl from the postings themselves (dl is denormalized per row):
    # sum over distinct docs / n_docs — zero-token docs have no postings
    # rows and contribute dl=0, matching build.corpus_stats
    dl_row = (
        spark.read.parquet(f"{path}/postings")
        .select("doc_id", "dl")
        .groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(F.sum("dl").alias("total"))
        .collect()[0]
    )
    total_dl = int(dl_row["total"] or 0)
    avgdl = (float(total_dl) / n_docs) if n_docs else 0.0
    store = PositionalStore(
        path,
        n_docs,
        avgdl,
        generations=["postings"],
        tombstones=[],
        total_dl=total_dl,
        n_partitions=n_partitions,
    )
    store._write_ledger()
    return store


def open_positional_store(path: str) -> PositionalStore:
    import json
    import os

    with open(os.path.join(path, "ledger.json")) as f:
        ledger = json.load(f)
    if ledger.get("format") != PositionalStore.FORMAT:
        raise ValueError(
            f"positional store at {path}: format {ledger.get('format')} "
            f"!= expected {PositionalStore.FORMAT}"
        )
    return PositionalStore(
        path,
        int(ledger["n_docs"]),
        float(ledger["avgdl"]),
        generations=ledger.get("generations"),
        tombstones=ledger.get("tombstones"),
        total_dl=ledger.get("total_dl"),
        n_partitions=ledger.get("n_partitions"),
    )


def phrase_bm25_topk(
    spark: SparkSession,
    postings: DataFrame,
    phrase: str,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    max_gap: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Phrase-as-virtual-term BM25: score the phrase like a single term
    whose tf is phrase_tf and whose df is the number of docs containing
    the phrase -> (rank, doc_id, score).

    df_phrase is computed inside the plan (single-row agg broadcast back
    over the hits — no extra driver action, and the hits frame is the
    post-phrase-filter candidate set, already tiny relative to corpus).
    """
    terms = tokenize(phrase)
    if not terms:
        return spark.createDataFrame([], "rank int, doc_id long, score double")
    hits = phrase_match(postings, terms, max_gap=max_gap)
    dfp = F.broadcast(hits.agg(F.count(F.lit(1)).alias("dfp")))
    scored = hits.crossJoin(dfp).select(
        "doc_id",
        (
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("dfp") + F.lit(0.5))
                / (F.col("dfp") + F.lit(0.5))
            )
            * F.col("phrase_tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("phrase_tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
            )
        ).alias("score"),
    )
    topk = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    from pyspark.sql import Window

    # UNPARTITIONED window — safe ONLY on the k-row limit() output (see
    # phrase_topk / wand.py).
    assert k <= 10_000, f"rank window is single-partition; k={k} too large"
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("rank", "doc_id", "score")


def phrase_topk(
    spark: SparkSession,
    postings: DataFrame,
    phrase: str,
    k: int = 10,
    max_gap: int = 1,
) -> DataFrame:
    """Phrase query -> (rank, doc_id, phrase_tf), top-k by
    (phrase_tf DESC, doc_id ASC) — the same deterministic-rank contract
    as the BM25 entries (north rule: rank-identical results)."""
    terms = tokenize(phrase)
    if not terms:
        return spark.createDataFrame([], "rank int, doc_id long, phrase_tf long")
    hits = phrase_match(postings, terms, max_gap=max_gap)
    topk = hits.orderBy(
        F.col("phrase_tf").desc(), F.col("doc_id").asc()
    ).limit(k)
    from pyspark.sql import Window

    # UNPARTITIONED window — safe ONLY on the k-row limit() output above
    # (same contract as wand.py's rank window; see the comment there).
    assert k <= 10_000, f"rank window is single-partition; k={k} too large"
    w = Window.orderBy(F.col("phrase_tf").desc(), F.col("doc_id").asc())
    return topk.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("rank", "doc_id", "phrase_tf")


def snippets_for_docs(
    spark: SparkSession,
    postings: DataFrame,
    docs: DataFrame,
    query_text: str,
    doc_ids: list[int],
    pad: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snippet TEXT for an already-ranked result page: the minimal
    covering window per doc (min_window_for_docs), padded by `pad`
    tokens each side and sliced from the document's own token stream ->
    (doc_id, win_start, win_end, win_len, snippet).

    Everything stays JVM-side: the tokenizer is the same [a-z0-9]+
    regex as textproc.tokenize, run as F.regexp_extract_all over ONLY
    the page's docs (O(page) text, never corpus), and the slice/join
    are array expressions. Positions are 1-based token indices, so the
    slice maps directly onto the window's [win_start, win_end]."""
    win = min_window_for_docs(spark, postings, query_text, doc_ids)
    ids = sorted(set(int(i) for i in doc_ids))
    if not ids:
        return spark.createDataFrame(
            [],
            "doc_id long, win_start int, win_end int, win_len int, "
            "snippet string",
        )
    page = docs.filter(F.col(id_col).isin(ids)).select(
        F.col(id_col).alias("doc_id"),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0
        ).alias("toks"),
    )
    s = F.greatest(F.lit(1), F.col("win_start") - F.lit(pad))
    e = F.least(F.size("toks"), F.col("win_end") + F.lit(pad))
    return (
        win.join(page, "doc_id")
        .select(
            "doc_id",
            "win_start",
            "win_end",
            "win_len",
            F.array_join(
                F.slice(F.col("toks"), s, e - s + F.lit(1)), " "
            ).alias("snippet"),
        )
        .orderBy("doc_id")
    )
