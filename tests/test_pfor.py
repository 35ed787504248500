"""PForDelta codec unit tests — pure numpy, no SparkSession.

Mirrors tests/test_codec.py's strategy for the varint codec: exact
round-trips across shapes (empty / single / all-equal / adversarial
outliers), determinism of the encoded bytes, property-based round-trip
via hypothesis, and parity of the batch encoder with the per-block
functions (the same invariant codec.encode_blocks_batch pins)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fornax_spark.fulltext import codec, pfor


def _rt(values):
    v = np.asarray(values, dtype=np.uint64)
    blob = pfor.pfor_encode(v)
    out = pfor.pfor_decode(blob, len(v))
    np.testing.assert_array_equal(out, v)
    return blob


def test_roundtrip_shapes():
    _rt([])
    _rt([0])
    _rt([2**64 - 1])
    _rt([7] * 128)
    _rt([0] * 128)
    _rt(np.arange(128))
    # fat head + narrow tail: the posting-delta shape (absolute biased
    # first doc id then small gaps)
    _rt([2**63 + 12345] + [3, 1, 4, 1, 5, 9, 2, 6] * 15)
    # powers of two straddle the width-selection boundaries
    _rt([2**k for k in range(64)])
    # exceptions at first/last positions
    _rt([2**40] + [1] * 126 + [2**50])


def test_bit_lengths_exact():
    probes = [0, 1, 2, 3, 4, 7, 8, 2**31 - 1, 2**31, 2**32 - 1, 2**32,
              2**52, 2**53, 2**53 + 1, 2**62, 2**63, 2**64 - 1]
    got = pfor._bit_lengths(np.array(probes, dtype=np.uint64))
    want = [int(x).bit_length() for x in probes]
    assert list(got) == want


def test_encode_deterministic():
    rng = np.random.default_rng(7)
    v = rng.integers(0, 2**20, size=300, dtype=np.uint64)
    v[::37] = rng.integers(2**40, 2**63, size=len(v[::37]), dtype=np.uint64)
    assert pfor.pfor_encode(v) == pfor.pfor_encode(v.copy())


def test_docid_delta_roundtrip_and_compression():
    rng = np.random.default_rng(11)
    gaps = rng.integers(1, 2000, size=128, dtype=np.int64)
    doc_ids = np.cumsum(gaps) - 2**62
    blob = pfor.delta_encode_docids(doc_ids)
    out = pfor.delta_decode_docids(blob, len(doc_ids))
    np.testing.assert_array_equal(out, doc_ids)
    # clustered small gaps: PFor packs at the gap width; varint spends
    # >= 1 byte/value. The absolute first value rides as one exception.
    vblob = codec.delta_encode_docids(doc_ids)
    assert len(blob) < len(vblob)


def test_counts_roundtrip():
    tf = np.array([1, 1, 2, 1, 7, 1, 300, 1], dtype=np.int64)
    blob = pfor.encode_counts(tf)
    np.testing.assert_array_equal(pfor.decode_counts(blob, len(tf)), tf)


def test_batch_matches_per_block():
    rng = np.random.default_rng(3)
    n = 1000
    gaps = rng.integers(1, 500, size=n, dtype=np.int64)
    doc_ids = np.sort(rng.choice(np.cumsum(gaps), size=n, replace=False))
    tf = rng.integers(1, 50, size=n, dtype=np.int64)
    dl = rng.integers(10, 400, size=n, dtype=np.int64)
    starts = np.arange(0, n, 128, dtype=np.int64)
    db, tb, lb = pfor.encode_blocks_batch(doc_ids, tf, dl, starts)
    ends = np.append(starts[1:], n)
    assert len(db) == len(starts)
    for i, (s, e) in enumerate(zip(starts, ends)):
        assert db[i] == pfor.delta_encode_docids(doc_ids[s:e])
        assert tb[i] == pfor.encode_counts(tf[s:e])
        assert lb[i] == pfor.encode_counts(dl[s:e])
        np.testing.assert_array_equal(
            pfor.delta_decode_docids(db[i], e - s), doc_ids[s:e]
        )


def test_too_many_exceptions_raises():
    # >65535 values all needing the exception channel at the chosen
    # width cannot occur at real block sizes (<=128), but the encoder
    # must fail loud rather than truncate the uint16 count
    v = np.zeros(200000, dtype=np.uint64)
    v[::3] = np.uint64(2**63)  # ~66.7k wide outliers in a sea of zeros:
    # the cost scan picks b=0 + exception channel, overflowing uint16
    with pytest.raises(ValueError, match="exceptions"):
        pfor.pfor_encode(v)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**64 - 1),
        min_size=0,
        max_size=200,
    )
)
def test_roundtrip_property(values):
    _rt(values)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=2**40),
        min_size=1,
        max_size=150,
    ),
    st.integers(min_value=-(2**62), max_value=2**62),
)
def test_docid_property(gaps, base):
    doc_ids = np.cumsum(np.array(gaps, dtype=np.int64)) + base
    blob = pfor.delta_encode_docids(doc_ids)
    np.testing.assert_array_equal(
        pfor.delta_decode_docids(blob, len(doc_ids)), doc_ids
    )
