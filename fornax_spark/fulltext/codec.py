"""Posting-block codec: delta + varint, fully numpy-vectorized.

Encode: sorted int64 doc_ids -> zigzag-free monotone deltas -> LEB128
varint bytes. tf / dl arrays varint-encoded directly. Decode is also
vectorized (continuation-bit cumsum -> np.add.at scatter) so the
query-time hot path never loops per posting in Python.

Block-max metadata (per block: exact max BM25 contribution, first/last
doc id) enables MaxScore/block-max pruning at query time (Ding & Suel,
"Faster top-k document retrieval using block-max indexes", SIGIR'11 —
public literature).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_U64 = np.uint64
_OFFSET = np.uint64(1 << 63)  # signed int64 -> uint64 order-preserving bias


def _to_u64_biased(a: np.ndarray) -> np.ndarray:
    """Order-preserving map int64 -> uint64 (x + 2^63)."""
    return (a.astype(np.int64).view(_U64) + _OFFSET).astype(_U64)


def _from_u64_biased(a: np.ndarray) -> np.ndarray:
    return (a.astype(_U64) - _OFFSET).view(np.int64)


def varint_encode_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128 varint encode a uint64 array; also return per-value byte
    counts so callers can slice the stream into blocks without
    re-encoding (the batch-encode fast path)."""
    v = values.astype(_U64, copy=True)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbytes = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= (_U64(1) << _U64(7 * k))).astype(np.int64)
    max_b = int(nbytes.max())
    out = np.zeros((n, max_b), dtype=np.uint8)
    for j in range(max_b):
        chunk = ((v >> _U64(7 * j)) & _U64(0x7F)).astype(np.uint8)
        cont = (j + 1 < nbytes).astype(np.uint8) * 0x80
        out[:, j] = np.where(j < nbytes, chunk | cont, 0)
    mask = np.arange(max_b)[None, :] < nbytes[:, None]
    return out[mask].tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128 varint encode a uint64 array, vectorized."""
    v = values.astype(_U64, copy=True)
    n = len(v)
    if n == 0:
        return b""
    # byte length per value: 1 + one byte per 7-bit threshold crossed
    nbytes = np.ones(n, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= (_U64(1) << _U64(7 * k))).astype(np.int64)
    # emit up to 10 groups of 7 bits
    max_b = int(nbytes.max())
    out = np.zeros((n, max_b), dtype=np.uint8)
    for j in range(max_b):
        chunk = ((v >> _U64(7 * j)) & _U64(0x7F)).astype(np.uint8)
        cont = (j + 1 < nbytes).astype(np.uint8) * 0x80
        out[:, j] = np.where(j < nbytes, chunk | cont, 0)
    mask = np.arange(max_b)[None, :] < nbytes[:, None]
    return out[mask].tobytes()


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Vectorized LEB128 decode -> uint64 array of `count` values."""
    if count == 0:
        return np.zeros(0, dtype=_U64)
    b = np.frombuffer(buf, dtype=np.uint8)
    ends = (b & 0x80) == 0  # terminal byte per value
    # group index of each byte: 0-based value id
    grp = np.zeros(len(b), dtype=np.int64)
    grp[1:] = np.cumsum(ends)[:-1]
    # position of byte within its group
    starts = np.zeros(len(b), dtype=np.int64)
    end_pos = np.flatnonzero(ends)
    starts[end_pos[:-1] + 1] = end_pos[:-1] + 1
    start_of_grp = np.maximum.accumulate(starts)
    pos = np.arange(len(b)) - start_of_grp
    vals = np.zeros(count, dtype=_U64)
    np.add.at(vals, grp, (b & 0x7F).astype(_U64) << (_U64(7) * pos.astype(_U64)))
    return vals


def delta_encode_docids(doc_ids: np.ndarray) -> bytes:
    """Strictly-increasing int64 doc ids -> varint(first_biased, deltas)."""
    u = _to_u64_biased(np.asarray(doc_ids, dtype=np.int64))
    deltas = np.empty_like(u)
    deltas[0] = u[0]
    deltas[1:] = u[1:] - u[:-1]
    return varint_encode(deltas)


def delta_decode_docids(buf: bytes, count: int) -> np.ndarray:
    deltas = varint_decode(buf, count)
    return _from_u64_biased(np.cumsum(deltas, dtype=_U64))


def encode_blocks_batch(
    doc_ids: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    block_starts: np.ndarray,
) -> tuple[list[bytes], list[bytes], list[bytes]]:
    """Encode MANY posting blocks in three vectorized passes.

    doc_ids must be sorted ascending within each block run;
    block_starts are the start indices (ascending, first == 0). Returns
    per-block (doc_blob, tf_blob, dl_blob), byte-identical to calling
    delta_encode_docids / encode_counts per block — but ~100x cheaper
    for web-scale encode jobs where blocks are small and numerous (the
    per-call numpy overhead dominated the per-block path).
    """
    n = len(doc_ids)
    if n == 0:
        return [], [], []
    u = _to_u64_biased(np.asarray(doc_ids, dtype=np.int64))
    deltas = u.copy()
    deltas[1:] -= u[:-1]
    deltas[block_starts] = u[block_starts]  # block-first values absolute

    ends = np.append(block_starts[1:], n)

    def slice_stream(values: np.ndarray) -> list[bytes]:
        buf, sizes = varint_encode_sizes(values)
        offs = np.zeros(len(values) + 1, dtype=np.int64)
        np.cumsum(sizes, out=offs[1:])
        return [
            buf[offs[s] : offs[e]] for s, e in zip(block_starts, ends)
        ]

    return (
        slice_stream(deltas),
        slice_stream(np.asarray(tf, dtype=np.int64).astype(_U64)),
        slice_stream(np.asarray(dl, dtype=np.int64).astype(_U64)),
    )


def encode_counts(counts: np.ndarray) -> bytes:
    """tf/dl arrays (small positive ints) -> varint bytes."""
    return varint_encode(np.asarray(counts, dtype=np.int64).astype(_U64))


def decode_counts(buf: bytes, count: int) -> np.ndarray:
    return varint_decode(buf, count).astype(np.int64)
