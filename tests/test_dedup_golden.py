"""Deterministic FULL-OUTPUT goldens for the approximate (no-SQL-oracle)
dedup entries, against pure-Python oracles built from the same shared
kernels (minhash_signature / simhash64 / tokenize — one code path, the
textproc pattern). This upgrades minhash_pairs / simhash_pairs from
recall bounds to exact expected-set equality on the driver fixture.
"""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from fornax_spark.fulltext.textproc import tokenize
from fornax_spark.operators.dedup import (
    minhash_dedup_pairs,
    minhash_signature,
    ngrams_py,
    simhash64,
    simhash_near_pairs,
)

SF = "/root/testdata/sf0.001"
NUM_PERM, N, BANDS, T = 64, 3, 16, 0.3


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    rows = df.select("doc_id", "text").collect()
    return df, {r["doc_id"]: r["text"] for r in rows}


def test_minhash_pairs_golden(spark, docs):
    """Engine output == {pairs that (a) collide in >=1 LSH band and
    (b) have exact shingle Jaccard >= threshold}, both computed by the
    python oracle. Band collision = band slice equality (the engine's
    band hash only compresses the slice)."""
    df, texts = docs
    rows = NUM_PERM // BANDS
    sh = {i: set(ngrams_py(tokenize(t), N)) for i, t in texts.items()}
    sig = {
        i: minhash_signature(sorted(s), NUM_PERM) for i, s in sh.items()
    }
    want = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        collide = any(
            np.array_equal(
                sig[a][bi * rows : (bi + 1) * rows],
                sig[b][bi * rows : (bi + 1) * rows],
            )
            for bi in range(BANDS)
        )
        if not collide:
            continue
        union = len(sh[a] | sh[b])
        jac = (len(sh[a] & sh[b]) / union) if union else 0.0
        if jac >= T:
            want.add((a, b, round(jac, 6)))
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_dedup_pairs(
            df, num_perm=NUM_PERM, n=N, bands=BANDS, threshold=T
        ).collect()
    }
    assert got == want
    assert want  # fixture must exercise the path
    # and the verified pairs are a subset of the exact-Jaccard truth
    exact = {
        (a, b)
        for a, b in itertools.combinations(sorted(texts), 2)
        if (sh[a] | sh[b])
        and len(sh[a] & sh[b]) / len(sh[a] | sh[b]) >= T
    }
    assert {(a, b) for a, b, _ in got} <= exact


def test_minhash_verified_recall_one(spark, docs):
    """The driver entry's parameterization (bands == num_perm, i.e. one
    row per band: candidate iff ANY of the 64 minhash values agree)
    reaches recall 1.0 on this corpus — the banding∧exact-verify output
    EQUALS the exact all-pairs Jaccard result, which is what licenses
    minhash_verified_pairs to share the ngram_jaccard_pairs DuckDB
    oracle (VERDICT r3 item 5)."""
    df, texts = docs
    sh = {i: set(ngrams_py(tokenize(t), N)) for i, t in texts.items()}
    exact = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        union = sh[a] | sh[b]
        if union and len(sh[a] & sh[b]) / len(union) >= T:
            exact.add((a, b, round(len(sh[a] & sh[b]) / len(union), 6)))
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_dedup_pairs(
            df, num_perm=NUM_PERM, n=N, bands=NUM_PERM, threshold=T
        ).collect()
    }
    assert got == exact
    assert exact  # fixture must exercise the path


def test_ann_lsh_topk_golden(spark):
    """The LSH ANN entry == a numpy oracle replaying the same planes,
    probes and exact cosine re-rank — full-output equality, not a recall
    bound (upgrades the driver's rows-only check)."""
    from fornax_spark.operators.similarity import (
        _hyperplanes,
        ann_search,
        build_ann_index,
    )

    emb_df = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb_df.collect()
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    q = vecs[ids == 0][0]
    mask = ids != 0
    ids, vecs = ids[mask], vecs[mask]

    n_planes, n_tables, seed, k = 8, 4, 42, 10
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    cand = np.zeros(len(ids), dtype=bool)
    for t in range(n_tables):
        planes = _hyperplanes(64, n_planes, seed + 1000 * t)
        buckets = ((vecs @ planes.T) > 0).astype(np.int64) @ weights
        qb = int(((planes @ q) > 0).astype(np.int64) @ weights)
        probes = {qb} | {qb ^ (1 << i) for i in range(n_planes)}
        cand |= np.isin(buckets, sorted(probes))
    cos = (vecs[cand] @ q) / (
        np.linalg.norm(vecs[cand], axis=1) * np.linalg.norm(q)
    )
    order = np.lexsort((ids[cand], -np.round(cos, 6)))[:k]
    want = [
        (int(ids[cand][i]), float(np.round(cos[i], 6))) for i in order
    ]

    index = build_ann_index(
        emb_df.filter("vec_id != 0"), dim=64,
        n_planes=n_planes, n_tables=n_tables, seed=seed,
    )
    got = [
        (r["id"], r["cosine"])
        for r in ann_search(index, [float(x) for x in q], k=k).collect()
    ]
    index.unpersist()
    assert got == want


def test_simhash_pairs_golden(spark, docs):
    """Pigeonhole blocking (4 x 16-bit chunks) is COMPLETE for
    hamming <= 3, so the engine must equal the brute-force python oracle
    over all pairs exactly."""
    df, texts = docs
    sig = {i: simhash64(tokenize(t)) for i, t in texts.items()}
    want = set()
    for a, b in itertools.combinations(sorted(texts), 2):
        ham = bin((sig[a] ^ sig[b]) & ((1 << 64) - 1)).count("1")
        if ham <= 3:
            want.add((a, b, ham))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_pairs(df, max_hamming=3).collect()
    }
    assert got == want
    assert want


def test_simhash_signature_blocking_is_exhaustive(spark):
    """Pigeonhole proof behind the simhash_verified_pairs driver entry:
    over ARBITRARY signatures (not just text-derived ones) the 4x16-bit
    blocking + verify equals brute force for max_hamming<=3, and the
    guard refuses a max_hamming the blocking cannot serve."""
    import itertools

    import numpy as np
    import pytest

    from fornax_spark.operators.dedup import simhash_pairs_from_signatures

    rng = np.random.default_rng(13)
    base = rng.integers(-(2**62), 2**62, size=40).astype(np.int64)
    # plant pairs at hamming 1..3 plus one at 4 (must NOT be reported)
    sigs = list(enumerate(base.tolist()))
    nxt = len(sigs)
    for k, bits in enumerate(([3], [3, 17], [3, 17, 41], [3, 17, 41, 55])):
        m = 0
        for b in bits:
            m |= 1 << b
        v = int(base[k]) ^ m
        v = v - (1 << 64) if v >= (1 << 63) else v
        sigs.append((nxt + k, v))
    df = spark.createDataFrame(sigs, "id long, simhash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_pairs_from_signatures(df, max_hamming=3).collect()
    }
    want = set()
    for (ia, sa), (ib, sb) in itertools.combinations(sigs, 2):
        ham = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
        if ham <= 3:
            want.add((min(ia, ib), max(ia, ib), ham))
    assert got == want
    assert any(h == 1 for *_ab, h in want)
    assert any(h == 3 for *_ab, h in want)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_pairs_from_signatures(df, max_hamming=4)
