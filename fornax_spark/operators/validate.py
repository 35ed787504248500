"""Ingest validation: the reference's handle-level integrity guards as
filter-based DataFrame ops.

Reference parity (raise-on-bad-input is the contract, not silent drops):
  * edges: integer endpoints, NO self-loops
    (/root/reference/fornax/api.py:515-543)
  * matches: weight coercible to float and 0 < weight <= 1
    (api.py:753-798; DB-level CHECK constraints exercised in
    test/test_model.py:146-173)
  * dangling references: a match (v, u) must point at existing query and
    target nodes (the reference enforces this with FOREIGN KEYs;
    api.py:357-543 inserts nodes before edges/matches can reference them)

Each validator returns (valid, rejects-with-reason); `check_or_raise`
gives the reference's raising behavior in ONE Spark action.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Validated:
    valid: DataFrame
    rejects: DataFrame  # original columns + `reason` string


def _split(df: DataFrame, reason: "F.Column") -> Validated:
    tagged = df.withColumn("reason", reason)
    return Validated(
        valid=tagged.filter(F.col("reason").isNull()).drop("reason"),
        rejects=tagged.filter(F.col("reason").isNotNull()),
    )


def validate_edges(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    start: str = "start",
    end: str = "end",
) -> Validated:
    """Reject null endpoints, self-loops, and (when `nodes` with a single
    id column is given) edges referencing unknown nodes."""
    df = edges
    if nodes is not None:
        nid = nodes.columns[0]
        known = nodes.select(F.col(nid).alias("__known")).distinct()
        df = (
            df.join(
                F.broadcast(known.withColumnRenamed("__known", "__ks")),
                df[start] == F.col("__ks"),
                "left",
            )
            .join(
                F.broadcast(known.withColumnRenamed("__known", "__ke")),
                df[end] == F.col("__ke"),
                "left",
            )
        )
    reason = (
        F.when(F.col(start).isNull() | F.col(end).isNull(), "null endpoint")
        .when(F.col(start) == F.col(end), "self-loop")
    )
    if nodes is not None:
        reason = reason.when(
            F.col("__ks").isNull() | F.col("__ke").isNull(), "dangling node ref"
        )
    out = _split(df, reason.otherwise(F.lit(None)))
    if nodes is not None:
        out = Validated(
            valid=out.valid.drop("__ks", "__ke"),
            rejects=out.rejects.drop("__ks", "__ke"),
        )
    return out


def validate_matches(
    matches: DataFrame,
    query_nodes: DataFrame | None = None,
    target_nodes: DataFrame | None = None,
) -> Validated:
    """Reject null fields, weights outside (0, 1], and (when node tables
    are given) matches referencing unknown query/target nodes.
    matches: (v, u, weight)."""
    df = matches
    if query_nodes is not None:
        qn = query_nodes.select(
            F.col(query_nodes.columns[0]).alias("__qn")
        ).distinct()
        df = df.join(F.broadcast(qn), df["v"] == F.col("__qn"), "left")
    if target_nodes is not None:
        tn = target_nodes.select(
            F.col(target_nodes.columns[0]).alias("__tn")
        ).distinct()
        df = df.join(F.broadcast(tn), df["u"] == F.col("__tn"), "left")
    reason = (
        F.when(
            F.col("v").isNull() | F.col("u").isNull() | F.col("weight").isNull(),
            "null field",
        )
        .when(
            (F.col("weight") <= 0) | (F.col("weight") > 1),
            "weight out of range (0, 1]",
        )
    )
    if query_nodes is not None:
        reason = reason.when(F.col("__qn").isNull(), "dangling query node")
    if target_nodes is not None:
        reason = reason.when(F.col("__tn").isNull(), "dangling target node")
    out = _split(df, reason.otherwise(F.lit(None)))
    drop = [c for c in ("__qn", "__tn") if c in out.valid.columns]
    if drop:
        out = Validated(
            valid=out.valid.drop(*drop), rejects=out.rejects.drop(*drop)
        )
    return out


def check_rows_or_raise(
    query_edges: list,
    target_edges: list,
    matches: list,
    sample: int = 5,
) -> None:
    """Driver-side twin of check_or_raise for already-collected Row/dict
    inputs (nema_match's in-process dispatch): same reason strings, same
    reject JSON shape (nulls omitted, column order preserved, compact
    separators — matching Spark's to_json), same ValueError prefix — so
    the same malformed input raises the identical error regardless of
    which executor the size dispatch picks."""
    import json

    bad: list[str] = []
    for rows in (query_edges, target_edges):
        for r in rows:
            s, e = r["start"], r["end"]
            if s is None or e is None:
                reason = "null endpoint"
            elif s == e:
                reason = "self-loop"
            else:
                continue
            d = {k: v for k, v in (("start", s), ("end", e)) if v is not None}
            d["reason"] = reason
            bad.append(json.dumps(d, separators=(",", ":")))
    for r in matches:
        v, u, w = r["v"], r["u"], r["weight"]
        if v is None or u is None or w is None:
            reason = "null field"
        elif not (0 < w <= 1):
            reason = "weight out of range (0, 1]"
        else:
            continue
        d = {
            k: x
            for k, x in (("v", v), ("u", u), ("weight", w))
            if x is not None
        }
        d["reason"] = reason
        bad.append(json.dumps(d, separators=(",", ":")))
    if bad:
        raise ValueError("invalid ingest rows: " + "; ".join(bad[:sample]))


def check_or_raise(*validated: Validated, sample: int = 5) -> None:
    """Raise ValueError listing up to `sample` rejects across all the
    given validations — the reference's IntegrityError behavior, paid
    with a single Spark action (the rejects are unioned first)."""
    rej = None
    for v in validated:
        r = v.rejects.select(
            F.to_json(F.struct(*[c for c in v.rejects.columns]))
            .alias("reject")
        )
        rej = r if rej is None else rej.unionByName(r)
    if rej is None:
        return
    bad = rej.take(sample)
    if bad:
        raise ValueError(
            "invalid ingest rows: " + "; ".join(r["reject"] for r in bad)
        )
