"""Handle facade (Connection / GraphHandle / QueryHandle): the
reference's user surface (/root/reference/fornax/api.py) driven
end-to-end through the facade ONLY — figure-4 payload must equal the
module-level path's golden output, metadata must round-trip through
STORAGE, and ragged/reserved/invalid inputs must raise like the
reference's handle-level guards (api.py:357-416, 515-543, 753-798)."""

from __future__ import annotations

import pytest

from tests.test_subgraphs import M, QE, TE


@pytest.fixture()
def conn(spark, tmp_path):
    from fornax_spark import Connection

    return Connection(str(tmp_path / "fx"), spark)


def _figure4_payload(conn):
    from fornax_spark import GraphHandle, QueryHandle

    qg = GraphHandle.create(conn)
    qg.add_nodes(my_id=[i + 1 for i in range(5)])
    qg.add_edges([s for s, _t in QE], [t for _s, t in QE])
    tg = GraphHandle.create(conn)
    tg.add_nodes(my_id=[i + 1 for i in range(13)])
    tg.add_edges([s for s, _t in TE], [t for _s, t in TE])
    q = QueryHandle.create(conn, qg, tg)
    q.add_matches([v for v, _u in M], [u for _v, u in M], [1.0] * len(M))
    return q.execute(n=2, hopping_distance=2, max_iters=10)


def test_facade_reproduces_figure4_golden(spark, conn):
    """The payload produced THROUGH THE FACADE equals the payload from
    the module-level pipeline (itself golden-tested line-for-line
    against the reference's expected output in test_subgraphs.py)."""
    from fornax_spark.operators.nema import nema_match_rows
    from fornax_spark.operators.subgraphs import node_link_graphs

    got = _figure4_payload(conn)

    res = nema_match_rows(
        spark, QE, TE, [(v, u, 1.0) for v, u in M], h=2, max_iters=10
    )
    want = node_link_graphs(
        res,
        query_nodes=[(i, {"my_id": i + 1}) for i in range(5)],
        query_edges=QE,
        target_nodes=[(i, {"my_id": i + 1}) for i in range(13)],
        target_edges=TE,
        n=2,
        hopping_distance=2,
        max_iters=10,
    )
    assert got == want


def test_facade_lifecycle_and_meta_storage(spark, conn):
    """Auto ids, read-by-id, len, stored edge/node metadata entering
    payloads from parquet (not function args), cascading delete."""
    from fornax_spark import GraphHandle, QueryHandle

    g1 = GraphHandle.create(conn)
    g2 = GraphHandle.create(conn)
    assert (g1.graph_id, g2.graph_id) == (0, 1)
    g1.add_nodes(name=["a", "b", "c"])
    g1.add_edges([0, 1], [1, 2], relationship=["friend", "foe"])
    assert len(g1) == 3
    # metadata persisted as columns and re-read from storage
    reread = GraphHandle.read(conn, 0)
    assert [m["name"] for _i, m in reread.nodes()] == ["a", "b", "c"]
    assert [m["relationship"] for _s, _e, m in reread.edges()] == [
        "friend", "foe",
    ]

    tgt = GraphHandle.create(conn)
    tgt.add_nodes(name=["x", "y", "z"])
    tgt.add_edges([0, 1], [1, 2])
    q = QueryHandle.create(conn, g1, tgt)
    q.add_matches([0, 1], [0, 1], [0.9, 0.8])
    assert len(q) == 2
    assert q.query_graph() == g1 and q.target_graph() == tgt
    payload = q.execute(n=1)
    # stored node meta surfaces in the payload nodes
    names = {n.get("name") for n in payload["graphs"][0]["nodes"]}
    assert {"a", "b", "c"} <= names
    # stored edge meta surfaces in the payload links
    rels = {
        l.get("relationship")
        for l in payload["graphs"][0]["links"]
        if l["type"] == "query"
    }
    assert "friend" in rels

    q.delete()
    with pytest.raises(ValueError, match="cannot read query"):
        QueryHandle.read(conn, q.query_id)
    g2.delete()
    with pytest.raises(ValueError, match="cannot read graph"):
        GraphHandle.read(conn, 1)


def test_facade_rejects_bad_input(spark, conn):
    from fornax_spark import GraphHandle, InvalidEdgeError, QueryHandle

    g = GraphHandle.create(conn)
    with pytest.raises(ValueError, match="at least one keyword"):
        g.add_nodes()
    with pytest.raises(ValueError, match="reserved"):
        g.add_nodes(id=[1, 2])
    # ragged kwargs -> NullValue poison -> raise (reference api.py:395-404)
    with pytest.raises(ValueError, match="ragged"):
        g.add_nodes(name=["a", "b"], age=[1])
    g.add_nodes(name=["a", "b", "c"])
    with pytest.raises(ValueError, match="reserved"):
        g.add_edges([0], [1], weight=[2.0])
    with pytest.raises(InvalidEdgeError, match="different nodes"):
        g.add_edges([0], [0])
    with pytest.raises(ValueError, match="ragged"):
        g.add_edges([0, 1], [1])
    g.add_edges([0, 1], [1, 2])

    t = GraphHandle.create(conn)
    t.add_nodes(name=["x"])
    q = QueryHandle.create(conn, g, t)
    with pytest.raises(ValueError, match="bounds error"):
        q.add_matches([0], [0], [1.5])
    with pytest.raises(ValueError, match="ragged"):
        q.add_matches([0, 1], [0], [0.5])
    with pytest.raises(ValueError, match="no matches"):
        q.execute()


def test_facade_custom_id_src(spark, conn):
    """id_src supplies hashable custom ids; string ids go through the
    reference's sha256 hash so payload ids stay bit-compatible."""
    from fornax_spark import GraphHandle
    from fornax_spark.operators.subgraphs import _hash

    g = GraphHandle.create(conn)
    g.add_nodes(id_src=["Anne", "Ben"], role=["x", "y"])
    ids = [i for i, _m in g.nodes()]
    assert sorted(ids) == sorted(
        _hash(s, conn.maxsize) for s in ["Anne", "Ben"]
    )
