"""Ingest validation guards, mirroring the reference's handle-level
IntegrityError tests (/root/reference/test/test_model.py:146-173 and
api.py:515-543, 753-798)."""

from __future__ import annotations

import pytest


def test_match_weight_bounds(spark):
    from fornax_spark.operators.validate import validate_matches

    m = spark.createDataFrame(
        [(1, 10, 1.0), (2, 11, 1.1), (3, 12, 0.0), (4, 13, 0.5), (5, None, 0.5)],
        "v long, u long, weight double",
    )
    out = validate_matches(m)
    assert {r["v"] for r in out.valid.collect()} == {1, 4}
    rejects = {r["v"]: r["reason"] for r in out.rejects.collect()}
    # weight must satisfy 0 < w <= 1 (reference CHECK constraints)
    assert rejects[2] == "weight out of range (0, 1]"
    assert rejects[3] == "weight out of range (0, 1]"
    assert rejects[5] == "null field"


def test_match_dangling_refs(spark):
    from fornax_spark.operators.validate import validate_matches

    m = spark.createDataFrame(
        [(1, 10, 0.5), (2, 99, 0.5), (7, 10, 0.5)],
        "v long, u long, weight double",
    )
    qn = spark.createDataFrame([(1,), (2,)], "id long")
    tn = spark.createDataFrame([(10,), (11,)], "id long")
    out = validate_matches(m, query_nodes=qn, target_nodes=tn)
    assert [tuple(r) for r in out.valid.collect()] == [(1, 10, 0.5)]
    reasons = {r["v"]: r["reason"] for r in out.rejects.collect()}
    assert reasons[2] == "dangling target node"
    assert reasons[7] == "dangling query node"


def test_edge_self_loops_and_dangling(spark):
    from fornax_spark.operators.validate import validate_edges

    e = spark.createDataFrame(
        [(1, 2), (3, 3), (1, 9), (None, 2)], "start long, end long"
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    out = validate_edges(e, nodes=nodes)
    assert [tuple(r) for r in out.valid.collect()] == [(1, 2)]
    reasons = {
        (r["start"], r["end"]): r["reason"] for r in out.rejects.collect()
    }
    assert reasons[(3, 3)] == "self-loop"
    assert reasons[(1, 9)] == "dangling node ref"
    assert reasons[(None, 2)] == "null endpoint"


def test_nema_match_raises_on_bad_matches(spark):
    from fornax_spark.operators.nema import nema_match

    qdf = spark.createDataFrame([(1, 2)], "start long, end long")
    tdf = spark.createDataFrame([(10, 11)], "start long, end long")
    bad = spark.createDataFrame(
        [(1, 10, 1.0), (2, 11, 0.0)], "v long, u long, weight double"
    )
    with pytest.raises(ValueError, match="invalid ingest rows"):
        nema_match(qdf, tdf, bad)


def test_nema_match_raises_on_self_loop_edge(spark):
    from fornax_spark.operators.nema import nema_match

    qdf = spark.createDataFrame([(1, 2), (2, 2)], "start long, end long")
    tdf = spark.createDataFrame([(10, 11)], "start long, end long")
    m = spark.createDataFrame([(1, 10, 1.0)], "v long, u long, weight double")
    with pytest.raises(ValueError, match="invalid ingest rows"):
        nema_match(qdf, tdf, m)
