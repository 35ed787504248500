"""Shared text-processing kernels: HTML extraction, tokenization, id hashing.

ONE code path used by (a) the Spark engine via Arrow-vectorized pandas
UDFs and (b) the pure-Python oracle (oracle.py). This is how we meet
the per-row invariant "byte-identical extracted text per url" — the
analogue of the reference pinning stable ids via sha256
(/root/reference/fornax/api.py:31-47).

All functions are deterministic, locale-independent, and NFC-pinned.
"""

from __future__ import annotations

import html as _htmlmod
import re
import unicodedata

# --------------------------------------------------------------------------
# HTML -> text extraction
# --------------------------------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes) -> str:
    """Deterministic HTML -> plain text.

    Rules (pinned; oracle and engine share this exact function):
      1. decode UTF-8 (errors -> U+FFFD), 2. drop <script>/<style> blocks,
      3. strip tags, 4. unescape entities, 5. NFC normalize,
      6. collapse whitespace runs to single spaces, strip ends.
    """
    s = html_bytes.decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmlmod.unescape(s)
    s = unicodedata.normalize("NFC", s)
    s = _WS_RE.sub(" ", s).strip()
    return s


# --------------------------------------------------------------------------
# Tokenization
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    """ASCII-alnum tokenizer over NFC-lowercased text.

    Deliberately simple and SQL-mirrorable: equivalent to DuckDB's
    regexp_extract_all(lower(text), '[a-z0-9]+'), which lets the driver
    oracle verify the whole postings pipeline in ANSI SQL.
    """
    return _TOKEN_RE.findall(unicodedata.normalize("NFC", text).lower())


# --------------------------------------------------------------------------
# XXH64 — pure-Python implementation of the public xxHash64 algorithm
# (https://github.com/Cyan4973/xxHash spec). Spark's F.xxhash64 hashes a
# string column's UTF-8 bytes with XXH64 seed=42; this implementation is
# unit-tested to match Spark bit-for-bit (tests/test_textproc.py) so the
# engine can use the JVM-side codegen'd hash while the oracle computes
# identical 64-bit doc ids in Python. Mirrors the reference's stable-id
# contract sha256(str(x)) % maxsize (/root/reference/fornax/api.py:31-47).
# --------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of raw bytes, returned as a SIGNED int64 (Spark semantics)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k1
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def doc_id_of_url(url: str) -> int:
    """Stable signed-int64 doc id = XXH64(utf8(url), seed=42).

    Identical to Spark's F.xxhash64(col) on a non-null string column, so
    the engine computes ids JVM-side (codegen, no Python) while the
    oracle uses this function.
    """
    return xxh64(url.encode("utf-8"), 42)
