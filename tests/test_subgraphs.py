"""End-to-end golden test of top-n subgraph enumeration + node-link JSON,
mirroring the reference's figure-4 scenario and its exact expected
payloads (/root/reference/test/test_api.py:462-671). The fixture,
expected node lists, link lists, costs and the ORDER of the two
zero-cost subgraphs (sha256 hash tiebreak) are the reference's own.
"""

from __future__ import annotations

import pytest

from fornax_spark.operators.subgraphs import SQLITE_MAX_SIZE, _hash

# reference fixture, 0-based (test_api.py:470-530)
QE = [(0, 2), (0, 1), (1, 3), (3, 4)]
TE = [
    (0, 1), (0, 2), (0, 3), (2, 6), (3, 4), (3, 5), (4, 6), (5, 7),
    (6, 9), (7, 8), (7, 11), (8, 9), (9, 10), (10, 11), (10, 12),
]
M = [
    (0, 0), (0, 3), (0, 7), (1, 1), (1, 4), (1, 8), (2, 2), (2, 5),
    (2, 11), (2, 12), (3, 6), (3, 9), (4, 10),
]


@pytest.fixture(scope="module")
def payload(spark):
    from fornax_spark.operators.nema import nema_match
    from fornax_spark.operators.subgraphs import node_link_graphs

    qdf = spark.createDataFrame(QE, "start long, end long")
    tdf = spark.createDataFrame(TE, "start long, end long")
    mdf = spark.createDataFrame(
        [(v, u, 1.0) for v, u in M], "v long, u long, weight double"
    )
    res = nema_match(qdf, tdf, mdf, h=2, alpha=0.3, lam=0.3, max_iters=10)
    return node_link_graphs(
        res,
        query_nodes=[(i, {"my_id": i + 1}) for i in range(5)],
        query_edges=QE,
        target_nodes=[(i, {"my_id": i + 1}) for i in range(13)],
        target_edges=TE,
        n=2,
        hopping_distance=2,
        max_iters=10,
    )


def _node(nid, ntype, my_id):
    return {"id": _hash((nid, ntype), SQLITE_MAX_SIZE), "type": ntype,
            "my_id": my_id}


def _link(s, e, etype, w=1.0):
    if etype == "match":
        a = _hash((s, "query"), SQLITE_MAX_SIZE)
        b = _hash((e, "target"), SQLITE_MAX_SIZE)
    else:
        a = _hash((s, etype), SQLITE_MAX_SIZE)
        b = _hash((e, etype), SQLITE_MAX_SIZE)
    return {"source": a, "target": b, "type": etype, "weight": w}


def test_metadata(payload):
    assert payload["max_iters"] == 10
    assert payload["hopping_distance"] == 2
    assert len(payload["graphs"]) == 2


def test_costs_are_zero(payload):
    # both top graphs are perfect embeddings (test_api.py:521-523,597-600)
    assert payload["graphs"][0]["cost"] == 0
    assert payload["graphs"][1]["cost"] == 0


def test_first_graph(payload):
    # reference test_second_graph_nodes/links (its graphs[0]):
    # the embedding through target 5 (my_id 6)
    g = payload["graphs"][0]
    assert g["is_multigraph"] is False
    want_nodes = [
        _node(0, "query", 1), _node(1, "query", 2), _node(2, "query", 3),
        _node(3, "query", 4), _node(4, "query", 5),
        _node(5, "target", 6), _node(7, "target", 8), _node(8, "target", 9),
        _node(9, "target", 10), _node(10, "target", 11),
    ]
    assert g["nodes"] == want_nodes
    want_links = (
        [_link(0, 7, "match"), _link(1, 8, "match"), _link(2, 5, "match"),
         _link(3, 9, "match"), _link(4, 10, "match")]
        + [_link(0, 1, "query"), _link(0, 2, "query"),
           _link(1, 3, "query"), _link(3, 4, "query")]
        + [_link(5, 7, "target"), _link(7, 8, "target"),
           _link(8, 9, "target"), _link(9, 10, "target")]
    )
    assert g["links"] == want_links


def test_second_graph(payload):
    # reference test_first_graph_nodes/links (its graphs[1]):
    # the embedding through target 11 (my_id 12)
    g = payload["graphs"][1]
    want_nodes = [
        _node(0, "query", 1), _node(1, "query", 2), _node(2, "query", 3),
        _node(3, "query", 4), _node(4, "query", 5),
        _node(7, "target", 8), _node(8, "target", 9), _node(9, "target", 10),
        _node(10, "target", 11), _node(11, "target", 12),
    ]
    assert g["nodes"] == want_nodes
    want_links = (
        [_link(0, 7, "match"), _link(1, 8, "match"), _link(2, 11, "match"),
         _link(3, 9, "match"), _link(4, 10, "match")]
        + [_link(0, 1, "query"), _link(0, 2, "query"),
           _link(1, 3, "query"), _link(3, 4, "query")]
        + [_link(7, 8, "target"), _link(7, 11, "target"),
           _link(8, 9, "target"), _link(9, 10, "target"),
           _link(10, 11, "target")]
    )
    assert g["links"] == want_links


def test_payload_is_json_serializable(payload):
    import json

    s = json.dumps(payload)
    assert json.loads(s) == payload
