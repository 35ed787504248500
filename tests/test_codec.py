"""Codec round-trip tests (kernel level, incl. property-based)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fornax_spark.fulltext.codec import (
    decode_counts,
    delta_decode_docids,
    delta_encode_docids,
    encode_counts,
    varint_decode,
    varint_encode,
)


def test_varint_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    buf = varint_encode(vals)
    # 0->1B, 1->1B, 127->1B, 128->2B, 300->2B, 2^32->5B, 2^63->10B, max->10B
    assert len(buf) == 1 + 1 + 1 + 2 + 2 + 5 + 10 + 10
    assert buf[:3] == bytes([0x00, 0x01, 0x7F])
    assert buf[3:5] == bytes([0x80, 0x01])  # 128
    out = varint_decode(buf, len(vals))
    assert (out == vals).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert (varint_decode(varint_encode(vals), len(vals)) == vals).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=300,
        unique=True,
    )
)
def test_docid_delta_roundtrip(xs):
    ids = np.array(sorted(xs), dtype=np.int64)
    assert (delta_decode_docids(delta_encode_docids(ids), len(ids)) == ids).all()


def test_counts_roundtrip():
    tf = np.array([1, 2, 3, 1000, 1], dtype=np.int64)
    assert (decode_counts(encode_counts(tf), 5) == tf).all()


def test_compression_ratio_on_dense_lists():
    # dense ascending ids (xxhash64-uniform spacing) compress well
    rng = np.random.default_rng(0)
    ids = np.sort(rng.integers(-(2**62), 2**62, 10_000, dtype=np.int64))
    raw = ids.nbytes
    enc = len(delta_encode_docids(ids))
    assert enc < raw  # 10k uniform over 2^63: deltas ~2^49 -> ~8B vs 8B... allow <=


def test_batch_encode_identity():
    """encode_blocks_batch == per-block delta_encode/encode_counts."""
    from fornax_spark.fulltext.codec import encode_blocks_batch

    rng = np.random.default_rng(1)
    # 3 term runs with block size 4: starts at 0,4,8 | 10 | 13
    docs = np.concatenate(
        [
            np.sort(rng.choice(2**62, 10, replace=False)) - 2**61,
            np.sort(rng.choice(1000, 3, replace=False)),
            np.sort(rng.choice(2**40, 5, replace=False)),
        ]
    ).astype(np.int64)
    tf = rng.integers(1, 100, len(docs)).astype(np.int64)
    dl = rng.integers(5, 2000, len(docs)).astype(np.int64)
    starts = np.array([0, 4, 8, 10, 13], dtype=np.int64)
    ends = np.append(starts[1:], len(docs))
    db, tb, lb = encode_blocks_batch(docs, tf, dl, starts)
    for i, (s, e) in enumerate(zip(starts, ends)):
        assert db[i] == delta_encode_docids(docs[s:e])
        assert tb[i] == encode_counts(tf[s:e])
        assert lb[i] == encode_counts(dl[s:e])
        assert (delta_decode_docids(db[i], e - s) == docs[s:e]).all()


def test_varint_wire_format_golden():
    """Pin the LEB128 wire format to literal bytes: the fused
    single-buffer encoder (and any future rewrite) must stay
    byte-identical to stores written by earlier code versions."""
    import numpy as np

    from fornax_spark.fulltext import codec

    v = np.array(
        [0, 1, 127, 128, 300, 16384, (1 << 63) + 5, 2**64 - 1],
        dtype=np.uint64,
    )
    buf, sizes = codec.varint_encode_sizes(v)
    assert buf == (
        b"\x00\x01\x7f\x80\x01\xac\x02\x80\x80\x01"
        b"\x85\x80\x80\x80\x80\x80\x80\x80\x80\x01"
        b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    )
    assert list(sizes) == [1, 1, 1, 2, 2, 3, 10, 10]
    assert codec.varint_encode(v) == buf
    assert np.array_equal(codec.varint_decode(buf, len(v)), v)


def test_encode_body_unsorted_fallback():
    """The encoder kernel trusts the sorted-layout contract but must
    still produce identical blocks if a caller hands it unsorted rows
    (the lexsort fallback path)."""
    import numpy as np
    import pandas as pd

    from fornax_spark.fulltext import codec
    from fornax_spark.fulltext.segments import _encoder, bucket_of_docs_np

    class B:
        def __init__(self, v):
            self.value = v

    n_buckets = 4
    rng = np.random.default_rng(3)
    n = 5000
    t = rng.integers(0, 40, n).astype(np.int64)
    d = rng.choice(10**6, size=n, replace=False).astype(np.int64)
    tf = rng.integers(1, 5, n).astype(np.int64)
    dl = rng.integers(10, 500, n).astype(np.int64)
    # since the shuffle stopped carrying the bucket column (r6), the
    # kernel derives buckets from doc ids — the frames carry only
    # (term_id, doc_id, tfdl) and the sorted frame orders by the SAME
    # derivation the kernel recomputes
    pdf = pd.DataFrame(
        {
            "term_id": t.astype(np.int32),
            "doc_id": d,
            "tfdl": (tf << 32) | dl,
        }
    )
    dfv = np.bincount(t, minlength=64).astype(np.int64)
    enc = _encoder(1000, 100.0, codec.BLOCK_SIZE, B(dfv), n_buckets)
    # NB the STREAM-level carry split still requires the trailing
    # (bucket, term) group to be contiguous at the end (that contract
    # belongs to the Spark layout, not the kernel); pin a sentinel
    # trailing group on both frames so only intra-call ordering varies.
    # doc_id 2^62 lands in the LAST bucket (top bits of the biased id)
    # and term 60 > every body term, so the sorted frame stays on the
    # order-check fast path while the shuffled frame takes the lexsort
    # fallback.
    sentinel = pd.DataFrame(
        {"term_id": np.int32(60),
         "doc_id": np.int64(2**62), "tfdl": (np.int64(1) << 32) | 50},
        index=[0],
    )
    srt = pdf.assign(
        _b=bucket_of_docs_np(pdf["doc_id"].to_numpy(np.int64), n_buckets)
    ).sort_values(["_b", "term_id", "doc_id"], kind="mergesort").drop(
        columns="_b"
    )
    srt = pd.concat([srt, sentinel], ignore_index=True)
    shuf = pd.concat(
        [pdf.sample(frac=1.0, random_state=5), sentinel],
        ignore_index=True,
    )
    a = pd.concat(list(enc(iter([srt]))), ignore_index=True)
    b = pd.concat(list(enc(iter([shuf]))), ignore_index=True)
    key = ["bucket", "term_id", "block_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
