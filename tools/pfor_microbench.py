"""Codec microbench: PForDelta (pfor.py) vs delta+varint (codec.py).

Pure numpy, no SparkSession — measures bytes/posting and encode/decode
ns/value on posting-shaped streams: sorted 64-bit hashed doc ids cut
into blocks of 128 (exactly what the segment encoder feeds the codec),
plus the tf/dl count streams. Run:

    python tools/pfor_microbench.py

Prints one JSON line; numbers quoted in BENCH.md §Compression.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from fornax_spark.fulltext import codec, pfor  # noqa: E402

BLOCK = codec.BLOCK_SIZE


def make_posting_stream(n_docs: int, df: int, seed: int):
    """One term's postings: `df` doc ids sampled from n_docs hashed
    (uniform 64-bit) ids, sorted — the exact distribution the segment
    store sees (xxhash64 ids are uniform over int64)."""
    rng = np.random.default_rng(seed)
    ids = rng.integers(-(2**63), 2**63 - 1, size=df, dtype=np.int64)
    ids = np.unique(ids)
    tf = rng.integers(1, 8, size=len(ids), dtype=np.int64)
    dl = rng.integers(40, 400, size=len(ids), dtype=np.int64)
    return ids, tf, dl


def bench_one(name, encode_batch, decode_doc, decode_cnt, docs, tf, dl,
              starts, reps=5):
    t0 = time.perf_counter()
    for _ in range(reps):
        db, tb, lb = encode_batch(docs, tf, dl, starts)
    enc_secs = (time.perf_counter() - t0) / reps
    nbytes = sum(map(len, db)) + sum(map(len, tb)) + sum(map(len, lb))
    ends = np.append(starts[1:], len(docs))
    counts = (ends - starts).tolist()
    t0 = time.perf_counter()
    for _ in range(reps):
        for blob, n in zip(db, counts):
            decode_doc(blob, n)
        for blob, n in zip(tb, counts):
            decode_cnt(blob, n)
        for blob, n in zip(lb, counts):
            decode_cnt(blob, n)
    dec_secs = (time.perf_counter() - t0) / reps
    n = len(docs)
    # round-trip integrity inside the bench itself
    got = np.concatenate(
        [decode_doc(blob, c) for blob, c in zip(db, counts)]
    )
    ok = True
    for s, e, i in zip(starts, ends, range(len(counts))):
        if not np.array_equal(decode_doc(db[i], e - s), docs[s:e]):
            ok = False
    assert ok, f"{name}: doc round-trip mismatch"
    del got
    return {
        "bytes_per_posting": round(nbytes / n, 3),
        "encode_ns_per_posting": round(enc_secs / n * 1e9, 1),
        "decode_ns_per_posting": round(dec_secs / (3 * n) * 1e9, 1),
    }


def main():
    # a realistic per-(bucket, term) group mix: head terms (large df,
    # tight gaps), torso, tail (df < block) — weighted like a Zipf
    # vocabulary's posting MASS (head terms own most postings)
    segments = []
    for df, reps, seed in [(120_000, 1, 1), (20_000, 6, 2), (900, 40, 3),
                           (60, 200, 4)]:
        for r in range(reps):
            segments.append(make_posting_stream(1_000_000, df, seed * 97 + r))
    docs = np.concatenate([s[0] for s in segments])
    tf = np.concatenate([s[1] for s in segments])
    dl = np.concatenate([s[2] for s in segments])
    # block starts restart at every stream boundary (block-first doc id
    # is absolute), exactly like the segment encoder's group walk
    starts, off = [], 0
    for s, _t, _d in segments:
        starts.extend(range(off, off + len(s), BLOCK))
        off += len(s)
    starts = np.asarray(starts, dtype=np.int64)

    out = {"n_postings": int(len(docs)), "n_blocks": int(len(starts))}
    out["varint"] = bench_one(
        "varint", codec.encode_blocks_batch, codec.delta_decode_docids,
        codec.decode_counts, docs, tf, dl, starts,
    )
    out["pfor"] = bench_one(
        "pfor", pfor.encode_blocks_batch, pfor.delta_decode_docids,
        pfor.decode_counts, docs, tf, dl, starts,
    )
    out["bytes_ratio_pfor_vs_varint"] = round(
        out["pfor"]["bytes_per_posting"] / out["varint"]["bytes_per_posting"],
        3,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
