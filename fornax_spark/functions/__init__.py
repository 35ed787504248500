"""Scalar function kernels shared across operators.

- stable_hash64: deterministic 64-bit hash (blake2b) for shingles /
  tokens — C-speed, reproducible across processes (unlike Python's
  builtin hash()), used inside Arrow-vectorized UDFs and by pytest
  oracles alike. Mirrors the reference's stable-id contract
  (/root/reference/fornax/api.py:31-47).
- nema kernels: the reference's proximity / delta-plus functions
  (/root/reference/fornax/opt.py:6-47) as pure Spark column
  expressions — documenting the V1/V2 operator mapping of SURVEY.md §2.3.
"""

from __future__ import annotations

from hashlib import blake2b

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASK63 = (1 << 63) - 1


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Spread an under-partitioned input across the cluster before
    CPU-heavy per-row work (tokenizers, signature UDFs, shingle builds).

    Small corpora — one parquet row group, a handful of splits — scan as
    1-6 partitions no matter how many cores exist, which serializes every
    downstream map/UDF pipeline on one core. This repartitions such
    inputs to defaultParallelism; it is a NO-OP whenever the input is
    already at least that parallel (the normal case at scale, where a
    scan has hundreds of splits), so the added exchange only ever fires
    when it is by construction small.

    Callers should hand this a scan-level frame (table read, optionally
    projected/filtered): the partition probe walks the physical plan, and
    probing through an adaptive plan with upstream exchanges could
    materialize those stages early. All in-repo call sites comply.
    """
    sc = df.sparkSession.sparkContext
    n = target or sc.defaultParallelism
    try:
        if df.rdd.getNumPartitions() >= n:
            return df
    except Exception:  # noqa: BLE001 — probe failure: keep the input as-is
        return df
    return df.repartition(n)


def stable_hash64(s: str | bytes, seed: int = 0) -> int:
    """Deterministic signed-ish 64-bit hash (non-negative, 63 bits)."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    d = blake2b(s, digest_size=8, salt=seed.to_bytes(8, "little")).digest()
    return int.from_bytes(d, "little") & _MASK63


def bind(expr: Column, fn) -> Column:
    """Evaluate `expr` ONCE per row and feed it to fn as a bound variable.

    Catalyst's ProjectCollapse inlines withColumn-ed expressions into
    every downstream use site, so an expensive expression (e.g. a regexp
    tokenizer) referenced k times — or inside a higher-order lambda —
    gets re-evaluated k times (or O(n) times). Wrapping it as
    element_at(transform(array(expr), fn), 1) binds it to a lambda
    VARIABLE, which is a true single evaluation, still whole-stage
    codegen, and immune to projection collapse.
    """
    return F.element_at(F.transform(F.array(expr), fn), 1)


def proximity(dist: Column, h: int, alpha: float) -> Column:
    """NeMa eq.1 proximity kernel (reference fornax/opt.py:6-30):
    P(d) = alpha^d if d <= h else 0, as a codegen'd column expression."""
    if h < 0:
        raise ValueError("h must be >= 0")
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    return F.when(dist <= h, F.pow(F.lit(alpha), dist)).otherwise(F.lit(0.0))


def delta_plus(x: Column, y: Column) -> Column:
    """NeMa eq.3 positive-difference (reference fornax/opt.py:33-47):
    max(x - y, 0)."""
    return F.greatest(x - y, F.lit(0.0))
