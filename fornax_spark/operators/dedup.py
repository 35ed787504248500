"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design:
  * exact: hash-groupBy on the text (map-side combine; at 100TB hash the
    text first so the shuffle carries 8-byte keys, not documents).
  * n-gram Jaccard: shingle explode + self equi-join on shingle —
    shuffle is on shingle hash (near-unique key, skew-safe), pair
    aggregation is a hash agg.
  * MinHash+LSH: Arrow-vectorized signatures (numpy), banding ->
    bucket-join so candidate generation never does O(n^2) work.
  * SimHash: vectorized bit-vote kernel -> 64-bit signature.
  * embedding near-dup: brute pairwise at test scale, LSH-bucketed
    variant in similarity.py for the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import stable_hash64
from .textstats import tokens_col

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per distinct text: (keep_id = min id, n_dups), grouping
    on the TEXT itself — the semantic baseline the DuckDB oracle and the
    hashed scale path are checked against."""
    return (
        df.groupBy(F.col(text_col))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("keep_id", "n_dups")
    )


def exact_dedup_groups_hashed(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Scale-default exact dedup: group on xxhash64(text) so the shuffle
    carries 8-byte keys + tiny partials instead of full documents (at
    100 TB the document bytes never move). A second independent 64-bit
    hash (seed 7) is counted per group as a collision canary —
    `hash_pure` is false iff two DIFFERENT texts collided under BOTH
    hashes' grouping key (first-hash collision), a ~2^-64 event per
    pair; callers can assert or route impure groups to an exact pass.
    Output: (keep_id, n_dups, hash_pure)."""
    t = F.col(text_col)
    return (
        df.groupBy(F.xxhash64(t).alias("h"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
            (F.countDistinct(F.xxhash64(t, F.lit(7))) == 1).alias("hash_pure"),
        )
        .select("keep_id", "n_dups", "hash_pure")
    )


def dedup_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    _group_hash=None,
) -> DataFrame:
    """Keep exactly one doc per distinct text (the min id); hash-grouped
    (the scale path — 8-byte shuffle keys, document bytes never move).

    Collision safety: groups whose second-hash canary fails (two distinct
    texts collided under the grouping hash, ~2^-64/pair) are routed back
    through the exact text-grouped pass, so output equals
    exact_dedup_groups semantics even under a first-hash collision. The
    impure-hash set is collision-sized, hence broadcast.

    _group_hash: test hook — inject a deliberately colliding grouping
    hash to exercise the fallback path.
    """
    t = F.col(text_col)
    h = _group_hash if _group_hash is not None else F.xxhash64(t)
    groups = df.groupBy(h.alias("h")).agg(
        F.min(F.col(id_col)).alias("keep_id"),
        (F.countDistinct(F.xxhash64(t, F.lit(7))) == 1).alias("hash_pure"),
    )
    pure_keep = groups.filter(F.col("hash_pure")).select(
        F.col("keep_id").alias(id_col)
    )
    impure_h = groups.filter(~F.col("hash_pure")).select("h")
    collided = df.join(F.broadcast(impure_h), h == impure_h["h"], "left_semi")
    rescued_keep = exact_dedup_groups(collided, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    keep = pure_keep.unionByName(rescued_keep)
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# word n-gram shingles + Jaccard pairs (fully JVM-side)
# ---------------------------------------------------------------------------


def ngrams_from_tokens(toks, n: int = 3):
    """Array of word n-gram shingles from a MATERIALIZED token column.

    `toks` must be a real column (use .withColumn first), not the
    tokenizer expression: expressions referenced inside higher-order
    lambdas are re-evaluated per element (no CSE), which turns an O(len)
    shingle build into O(len^2) regex work.
    """
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
        ),
    )
    # sequence(1, x) runs DESCENDING when x < 1 — guard short docs
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def with_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, shset): distinct n-gram shingles, tokens evaluated once/row.

    Uses functions.bind because ProjectCollapse would otherwise inline
    the tokenizer into every element_at of the n-gram transform
    (observed: O(len^2) regex work, 24ms/doc -> ~0.1ms/doc fixed).

    The input is fanned out first (functions.fan_out): a one-row-group
    corpus file otherwise runs the whole tokenize+shingle pipeline — and
    everything downstream of a broadcast self-join — on a single core.
    """
    from ..functions import bind, fan_out

    shingles = bind(
        tokens_col(text_col),
        lambda toks: F.array_distinct(ngrams_from_tokens(toks, n)),
    )
    return fan_out(df).select(F.col(id_col).alias("id"), shingles.alias("shset"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """(id_a, id_b, jaccard) for all pairs with shingle-set Jaccard >=
    threshold, id_a < id_b.

    Plan: explode distinct shingles -> self-join on shingle (skew-safe:
    shingle keys are near-unique under Zipf at n>=3) -> pair-count agg ->
    |A|+|B|-inter for the union. No pairwise cartesian anywhere.

    Plan shape (guide §2.4): on corpora whose shingle table fits a
    broadcast, the probe side is pre-partitioned by doc id so the join
    output's HashPartitioning(id_a) already satisfies the pair-count
    groupBy's clustering — the candidate-pair rows (the one data-sized
    intermediate: dense corpora generate orders of magnitude more
    candidates than input rows) are aggregated WITHOUT an exchange.
    Past the broadcast gate the classic sort-merge self-join + pair agg
    runs instead, which is the scalable shape at corpus sizes where no
    side can be broadcast.
    """
    # The shingle pipeline (tokenize + n-gram transform + explode +
    # xxhash) is evaluated independently by each consumer below instead
    # of being materialized: measured at sf1.0 it costs ~1 s of fully
    # parallel compute per evaluation, while persist has no unpersist()
    # owner here (cache accumulates across calls) and an eager
    # localCheckpoint pays a serialize job plus block churn that feeds
    # driver full-GC pauses between the many jobs of this verb. Set
    # sizes come straight from the distinct-shingle ARRAY (no groupBy).
    ws = with_shingles(df, id_col, text_col, n)
    sh = ws.select("id", F.explode("shset").alias("shingle")).select(
        "id", F.xxhash64("shingle").alias("sh")
    )
    sizes = ws.select("id", F.size("shset").alias("sz"))
    spark = df.sparkSession
    # Plan gate on TOTAL TEXT BYTES — a pure-codegen scan ~10x cheaper
    # than counting shingle rows (which tokenizes the whole corpus just
    # to pick a plan). Shingle rows are bounded by token count, i.e.
    # by chars/~5, so <=120 MB of text keeps the grouped broadcast
    # comfortably under Spark's relation caps; anything larger takes
    # the sort-merge shape.
    total_chars = (
        df.agg(F.sum(F.length(F.col(text_col)))).collect()[0][0] or 0
    )
    if total_chars <= 120_000_000:
        # Broadcast the GROUPED form (shingle -> id array): same bytes
        # but ~two orders of magnitude fewer hash-relation entries than
        # broadcasting the exploded rows, so the per-call driver build
        # is fast and the relation is far less full-GC fodder (this
        # verb's wall time was dominated by driver pauses between its
        # jobs, not task time — see OPTIMIZATION_r08.md). The probe
        # stays pre-partitioned by doc id so the pair-count groupBy
        # needs NO exchange of the candidate rows, and the partner
        # explode + id_b > id_a filter are pure codegen.
        para = spark.sparkContext.defaultParallelism
        grouped = sh.groupBy("sh").agg(F.collect_list("id").alias("ids"))
        pairs = (
            sh.repartition(para, "id")
            .join(F.broadcast(grouped), "sh")
            .select(F.col("id").alias("id_a"), F.explode("ids").alias("id_b"))
            .filter(F.col("id_b") > F.col("id_a"))
        )
    else:
        # corpus too large for any broadcast: classic sort-merge
        # self-join on the shingle hash + pair-count aggregation
        a = sh.alias("a")
        b = sh.alias("b")
        pairs = a.join(
            b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id"))
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    inter = pairs.groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jac_raw",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        # filter on the UNROUNDED value (exact rational of ints — identical
        # in any engine), round only for presentation/comparison
        .filter(F.col("jac_raw") >= threshold)
        .select("id_a", "id_b", F.round("jac_raw", 6).alias("jaccard"))
    )
    return out


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# 31-bit Mersenne prime: keeps (a*h + b) < 2^62 so the int64 math never
# wraps (a, b, h all < 2^31). Plenty of hash space for MinHash estimates.
_MERSENNE31 = (1 << 31) - 1


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE31, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE31, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(shingles: list[str], num_perm: int, seed: int = 42) -> np.ndarray:
    """Pure-Python/numpy MinHash over shingle strings — shared by the
    Spark UDF below and the pytest oracle (one code path, like
    textproc)."""
    a, b = _perm_params(num_perm, seed)
    if not shingles:
        return np.full(num_perm, _MERSENNE31, dtype=np.int64)
    base = np.fromiter(
        (stable_hash64(s) & _MERSENNE31 for s in set(shingles)), dtype=np.int64
    )
    # vectorized (a*h + b) mod p over the perm axis; all values < 2^62
    vals = (base[None, :] * a[:, None] + b[:, None]) % _MERSENNE31
    return vals.min(axis=1).astype(np.int64)


def ngrams_py(tokens: list[str], n: int) -> list[str]:
    """Python n-gram shingles — shared by the MinHash UDF and pytest
    oracles; semantics identical to ngrams_from_tokens (JVM)."""
    if len(tokens) < n:
        return []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>) via ONE Arrow-vectorized pandas UDF over the
    raw text (shingling happens Python-side through the shared tokenizer
    — a pandas UDF cannot consume a higher-order lambda expression, and
    this keeps one code path with the pytest oracle).

    Math is identical to minhash_signature row by row; the UDF caches
    shingle hashes across rows/batches of a task (guide §4.5 — shingle
    vocabularies are Zipf, so each distinct shingle is hashed once per
    task instead of once per occurrence)."""
    from ..functions import fan_out
    from ..fulltext.textproc import tokenize

    a, b = _perm_params(num_perm, seed)
    hash_cache: dict[str, int] = {}

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(text: pd.Series) -> pd.Series:
        def h(s: str) -> int:
            v = hash_cache.get(s)
            if v is None:
                v = hash_cache[s] = stable_hash64(s) & _MERSENNE31
            return v

        def sig(s: str) -> list[int]:
            sh = set(ngrams_py(tokenize(s), n))
            if not sh:
                return [_MERSENNE31] * num_perm
            base = np.fromiter((h(x) for x in sh), dtype=np.int64, count=len(sh))
            vals = (base[None, :] * a[:, None] + b[:, None]) % _MERSENNE31
            return vals.min(axis=1).astype(np.int64).tolist()

        return text.map(sig)

    return fan_out(df).select(
        F.col(id_col).alias("id"), sig_udf(F.col(text_col)).alias("sig")
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 16, rows: int = 4
) -> DataFrame:
    """Band the signatures and bucket-join: (id_a, id_b) candidates.

    Band key = (band_idx, hash of the band slice) — the join is an
    equi-join on the band key, never a cartesian. Scale note: bucket
    sizes are bounded by collision probability; a hot bucket (mass dup
    cluster) is handled by AQE skew split.
    """
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.xxhash64(
                    F.slice(F.col("sig"), bi * F.lit(rows) + F.lit(1), F.lit(rows)),
                    bi,
                ),
            )
        ).alias("band", "bh"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    n: int = 3,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """LSH candidates verified by exact shingle Jaccard (JVM set ops):
    (id_a, id_b, jaccard >= threshold)."""
    rows = num_perm // bands
    # Eager localCheckpoint, chosen by measurement over the two
    # alternatives: a lazy persist has no unpersist() owner here (cache
    # accumulates across calls) and races 2x/2x parallel recomputations
    # of the signature/shingle UDFs before it fills; NO materialization
    # leaves the post-UDF frames without real size stats, so the band
    # self-join loses its broadcast and AQE coalesces the tiny shuffle
    # inputs under the (much larger) join output. Checkpoint blocks are
    # freed by the ContextCleaner when the result frame is GC'd.
    sigs = minhash_signatures(
        df, id_col, text_col, num_perm, n, seed
    ).localCheckpoint(eager=True)
    cands = lsh_candidate_pairs(sigs, bands, rows)
    # verify on the 8-byte shingle HASHES, not the strings: |A∩B|/|A∪B|
    # is unchanged (same ~2^-64/pair collision exposure the exact
    # ngram_jaccard_pairs path already accepts by joining on
    # xxhash64(shingle)), the checkpoint shrinks ~5-10x, and the
    # array_intersect/union compares become long compares
    sets_df = (
        with_shingles(df, id_col, text_col, n)
        .select(
            "id", F.transform("shset", lambda x: F.xxhash64(x)).alias("shset")
        )
        .localCheckpoint(eager=True)
    )
    out = (
        cands.join(sets_df.withColumnRenamed("id", "id_a").withColumnRenamed("shset", "sh_a"), "id_a")
        .join(sets_df.withColumnRenamed("id", "id_b").withColumnRenamed("shset", "sh_b"), "id_b")
        .withColumn(
            "jac_raw",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jac_raw") >= threshold)
        .select("id_a", "id_b", F.round("jac_raw", 6).alias("jaccard"))
    )
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over tokens (tf-weighted bit votes). Shared kernel
    (UDF + pytest oracle)."""
    if not tokens:
        return 0
    from collections import Counter

    votes = np.zeros(64, dtype=np.int64)
    for tok, tf in Counter(tokens).items():
        h = stable_hash64(tok, seed=7)
        bits = np.unpackbits(
            np.frombuffer(int(h).to_bytes(8, "little"), dtype=np.uint8),
            bitorder="little",
        ).astype(np.int64)
        votes += tf * (2 * bits - 1)
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    # fold to signed int64
    return out - (1 << 64) if out >= (1 << 63) else out


def _token_bits(tok: str, cache: dict) -> np.ndarray:
    """(64,) int8 bit vector of stable_hash64(tok, seed=7) — the per-token
    quantity simhash64 votes with, cached across rows of a task."""
    bits = cache.get(tok)
    if bits is None:
        h = stable_hash64(tok, seed=7)
        bits = np.unpackbits(
            np.frombuffer(int(h).to_bytes(8, "little"), dtype=np.uint8),
            bitorder="little",
        ).astype(np.int8)
        cache[tok] = bits
    return bits


def simhash64_batch(tok_rows: list, cache: dict | None = None) -> np.ndarray:
    """Vectorized batch form of simhash64: one numpy pass over every
    token occurrence in the batch instead of per-row Counter loops.

    Bit i's vote is sum over token OCCURRENCES of (2*bit_i(hash) - 1) —
    identical to simhash64's tf-weighted sum over DISTINCT tokens (a
    tf-weighted sum over distincts IS the plain sum over occurrences).
    Equality with simhash64 row-by-row is pinned in tests.
    """
    if cache is None:
        cache = {}
    n = len(tok_rows)
    lens = np.fromiter((len(r) for r in tok_rows), dtype=np.int64, count=n)
    total = int(lens.sum())
    out = np.zeros(n, dtype=np.int64)
    if total == 0:
        return out
    # unique-token indirection: hash/unpack each distinct token once
    uniq: dict[str, int] = {}
    idx = np.empty(total, dtype=np.int32)
    k = 0
    for row in tok_rows:
        for t in row:
            j = uniq.get(t)
            if j is None:
                j = uniq[t] = len(uniq)
            idx[k] = j
            k += 1
    H = np.empty((len(uniq), 64), dtype=np.int8)
    for t, j in uniq.items():
        H[j] = _token_bits(t, cache)
    M = H[idx].astype(np.int32)  # (total, 64) bit matrix per occurrence
    # reduceat mis-handles empty segments (repeated offsets return a
    # neighbouring row; a trailing empty would clip into the previous
    # row's last token) — so compact empty rows out first: their vote
    # sum is 0 by definition, i.e. simhash 0, already in `out`.
    nz = lens > 0
    lens_nz = lens[nz]
    offsets = np.zeros(len(lens_nz), dtype=np.int64)
    np.cumsum(lens_nz[:-1], out=offsets[1:])
    sums = np.add.reduceat(M, offsets, axis=0)
    votes = 2 * sums - lens_nz[:, None]
    packed = np.packbits((votes > 0).astype(np.uint8), axis=1, bitorder="little")
    out[nz] = packed.view(np.int64).reshape(len(lens_nz))  # 2's compl == signed fold
    return out


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    from ..functions import fan_out

    bit_cache: dict[str, np.ndarray] = {}

    @F.pandas_udf(T.LongType())
    def sim_udf(toks: pd.Series) -> pd.Series:
        return pd.Series(
            simhash64_batch([list(ts) for ts in toks], bit_cache),
            index=toks.index,
        )

    return fan_out(df).select(
        F.col(id_col).alias("id"), sim_udf(tokens_col(text_col)).alias("simhash")
    )


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Scale path: block on 4 16-bit chunks (pigeonhole: any pair within
    hamming<=3 agrees on >=1 chunk) -> equi-join per chunk, verify
    exact distance with bit_count (JVM)."""
    # Eager localCheckpoint: the chunk self-join scans sigs twice, and
    # the materialized frame's REAL size stats are what let the planner
    # broadcast it — see minhash_dedup_pairs for the measured tradeoff
    sigs = simhash_signatures(df, id_col, text_col).localCheckpoint(eager=True)
    return simhash_pairs_from_signatures(sigs, max_hamming)


def simhash_pairs_from_signatures(
    sigs: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """The blocking + verify machinery of simhash_near_pairs over a
    precomputed signature table (id, simhash int64) — exposed so the
    pigeonhole-exhaustiveness property can be oracle-checked on
    signatures BOTH engines can derive (driver entry
    simhash_verified_pairs): with 4 16-bit chunks and max_hamming <= 3,
    any qualifying pair must agree on at least one chunk, so
    blocking ∧ exact-verify EQUALS the brute-force O(n^2) hamming join.
    """
    if max_hamming > 3:
        raise ValueError(
            "4x16-bit pigeonhole blocking is exhaustive only for "
            f"max_hamming <= 3 (got {max_hamming})"
        )
    chunks = sigs.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# near-dup cluster collapse: connected components over a pair table
# ---------------------------------------------------------------------------


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    """Collapse a near-dup PAIR table (from ngram_jaccard_pairs /
    minhash / simhash / embedding_near_dup_pairs) into components:
    one row per document in the pair graph, labeled with
    cluster_id = min doc_id of its connected component — the canonical
    keeper a dedup pipeline retains.

    Distributed min-label propagation: labels start as each node's own
    id; every round each node takes the min label over itself and its
    neighbours (one equi-join + one groupBy-min = two shuffles per
    round), converging in O(component diameter) rounds. Near-dup
    components are shallow in practice (dup clusters, not social
    graphs), so the round count stays small at any corpus scale; the
    driver loop follows the one-materializing-action-per-iteration
    pattern (the convergence count fills the new cache). Raises if
    max_iters rounds don't converge rather than returning a partial
    labeling.
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    labels.count()
    converged = False
    for _ in range(max_iters):
        prop = edges.join(labels, edges["src"] == labels["node"]).select(
            F.col("dst").alias("node"), "label"
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("nw"), "node")
            .filter(F.col("o.label") != F.col("nw.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iters} rounds; "
            "raise max_iters (component diameter exceeds the cap)"
        )
    # Hand back a lineage-free result and release the iteration cache:
    # localCheckpoint materializes the converged labels from the (still
    # cached) final round, then the persist is dropped. Checkpoint
    # blocks are freed by the ContextCleaner when the returned DataFrame
    # is garbage-collected — unlike a persisted frame, which would stay
    # in the cache manager with no unpersist() owner across repeated
    # pipeline calls.
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    ).localCheckpoint(eager=True)
    labels.unpersist()
    return out
