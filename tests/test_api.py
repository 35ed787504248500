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


def test_id_src_stored_in_meta(spark, conn):
    """Reference parity (test/test_api.py:202-208): id_src is hashed
    for the node_id but ALSO serialized into the stored meta, so
    payloads for id_src-created graphs carry the id_src key."""
    from fornax_spark import GraphHandle

    g = GraphHandle.create(conn)
    g.add_nodes(id_src=["a", "b", "c", "d"])
    metas = {m["id_src"] for _i, m in g.nodes()}
    assert metas == {"a", "b", "c", "d"}


def test_duplicate_node_ids_raise(spark, conn):
    """Parquet appends enforce no primary key, so the facade raises
    InvalidNodeError where the reference hits a DB IntegrityError:
    duplicates within one call, across calls, and auto-ids landing on a
    stored custom id."""
    from fornax_spark import GraphHandle, InvalidNodeError

    g = GraphHandle.create(conn)
    with pytest.raises(InvalidNodeError, match="duplicate"):
        g.add_nodes(id_src=["a", "a"])
    g.add_nodes(id_src=["a", "b"])
    with pytest.raises(InvalidNodeError, match="already exists"):
        g.add_nodes(id_src=["b", "c"])
    # auto ids continue from the node count; a stored custom INT id in
    # that range must clash rather than silently duplicate
    g2 = GraphHandle.create(conn)
    g2.add_nodes(id_src=[1])
    with pytest.raises(InvalidNodeError, match="already exists"):
        g2.add_nodes(name=["x", "y"])  # auto ids 1, 2 -> 1 collides


def test_add_nodes_default_path_single_job(spark, conn):
    """VERDICT r3 item 7: the default-id add_nodes must not pay a Spark
    count() per call — with the catalog-cached node count, the append
    write is the call's only job."""
    from fornax_spark import GraphHandle

    g = GraphHandle.create(conn)
    g.add_nodes(name=["seed"])  # first call may count (cache fill)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    g.add_nodes(name=["a", "b"])
    after = len(tracker.getJobIdsForGroup(None))
    assert after - before == 1, f"expected 1 job, saw {after - before}"
    assert len(g) == 3  # cached count tracks appends


def test_bulk_df_ingest_figure4_parity(spark, conn, tmp_path):
    """VERDICT r3 item 3: figure-4 built ENTIRELY through the bulk
    DataFrame ingest path (add_nodes_df / add_edges_df /
    add_matches_df) produces the identical payload to the kwargs
    path."""
    from fornax_spark import GraphHandle, QueryHandle

    want = _figure4_payload(conn)

    qg = GraphHandle.create(conn)
    qg.add_nodes_df(
        spark.createDataFrame([(i + 1,) for i in range(5)], "my_id long")
    )
    qg.add_edges_df(spark.createDataFrame(QE, "start long, end long"))
    tg = GraphHandle.create(conn)
    tg.add_nodes_df(
        spark.createDataFrame([(i + 1,) for i in range(13)], "my_id long")
    )
    tg.add_edges_df(spark.createDataFrame(TE, "start long, end long"))
    q = QueryHandle.create(conn, qg, tg)
    n = q.add_matches_df(
        spark.createDataFrame(
            [(v, u, 1.0) for v, u in M], "v long, u long, weight double"
        )
    )
    assert n == len(M) and len(q) == len(M)
    got = q.execute(n=2, hopping_distance=2, max_iters=10)
    assert got == want


def test_bulk_ingest_plan_no_driver_materialization(spark, conn, tmp_path):
    """The bulk ingest frame must be a pure distributed transform of
    the source scan — no LocalTableScan (collected rows re-parallelized
    through the driver) anywhere in its plan."""
    from fornax_spark import GraphHandle
    from fornax_spark.plans import physical_plan

    p = str(tmp_path / "edges_src")
    spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "start long, end long"
    ).write.parquet(p)
    g = GraphHandle.create(conn)
    g.add_nodes(name=["x"])
    frame = g._edges_frame(spark.read.parquet(p))
    plan = physical_plan(frame)
    assert "LocalTableScan" not in plan, plan
    assert "parquet" in plan.lower(), plan


def test_bulk_df_ingest_rejects_bad_input(spark, conn):
    from fornax_spark import GraphHandle, InvalidNodeError, QueryHandle

    g = GraphHandle.create(conn)
    with pytest.raises(InvalidNodeError, match="duplicate"):
        g.add_nodes_df(
            spark.createDataFrame([("a",), ("a",)], "k string"), id_col="k"
        )
    g.add_nodes_df(spark.createDataFrame([("a",), ("b",)], "k string"), id_col="k")
    with pytest.raises(InvalidNodeError, match="already exists"):
        g.add_nodes_df(spark.createDataFrame([("b",)], "k string"), id_col="k")
    with pytest.raises(ValueError, match="invalid ingest rows"):
        g.add_edges_df(spark.createDataFrame([(3, 3)], "start long, end long"))
    t = GraphHandle.create(conn)
    t.add_nodes(name=["x"])
    q = QueryHandle.create(conn, g, t)
    with pytest.raises(ValueError, match="invalid ingest rows"):
        q.add_matches_df(
            spark.createDataFrame([(0, 0, 1.5)], "v long, u long, weight double")
        )


def test_facade_distributed_path_parity(spark, conn):
    """VERDICT r3 item 4: QueryHandle.execute with local_threshold=0
    forces the DISTRIBUTED nema branch through the facade wiring —
    payload must equal the in-process path's figure-4 golden."""
    want = _figure4_payload(conn)
    from fornax_spark import GraphHandle, QueryHandle

    qg = GraphHandle.create(conn)
    qg.add_nodes(my_id=[i + 1 for i in range(5)])
    qg.add_edges([s for s, _t in QE], [t for _s, t in QE])
    tg = GraphHandle.create(conn)
    tg.add_nodes(my_id=[i + 1 for i in range(13)])
    tg.add_edges([s for s, _t in TE], [t for _s, t in TE])
    q = QueryHandle.create(conn, qg, tg)
    q.add_matches([v for v, _u in M], [u for _v, u in M], [1.0] * len(M))
    got = q.execute(n=2, hopping_distance=2, max_iters=10, local_threshold=0)
    assert got == want


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


def test_df_ingest_int_ids_with_nulls_keep_mod_path(spark, conn):
    """ADVICE r4 (high): Arrow converts an int64 batch containing any
    null to float64 — id hashing must dispatch on the SPARK column type
    so integer ids in a nullable frame still take the mod path (never
    sha256('1.0')), and null ids must raise instead of hashing to
    sha256('nan')."""
    from fornax_spark import GraphHandle, InvalidNodeError

    g = GraphHandle.create(conn)
    with pytest.raises(InvalidNodeError, match="null id"):
        g.add_nodes_df(
            spark.createDataFrame(
                [(1,), (None,), (3,)], "k long"
            ),
            id_col="k",
        )
    # same frame without the null: ids must equal the kwargs/_hash path
    g.add_nodes_df(spark.createDataFrame([(1,), (3,)], "k long"), id_col="k")
    ids = sorted(i for i, _m in g.nodes())
    assert ids == sorted(conn._hash(i) for i in (1, 3))


def test_df_ingest_nullable_int_batch_parity_with_hash(spark, conn):
    """A LongType column that Arrow WOULD batch as float64 (nulls
    filtered out before ingest but present in the source frame's
    lineage) must hash identically to subgraphs._hash — including
    negative values (pmod == Python % semantics)."""
    from fornax_spark import GraphHandle

    src = spark.createDataFrame(
        [(1,), (None,), (-5,), (2**62,)], "k long"
    ).filter("k is not null")
    g = GraphHandle.create(conn)
    g.add_nodes_df(src, id_col="k")
    ids = sorted(i for i, _m in g.nodes())
    assert ids == sorted(conn._hash(i) for i in (1, -5, 2**62))


def test_df_ingest_null_endpoints_raise_via_validate(spark, conn):
    """Null edge endpoints / match fields must hash to NULL and be
    rejected by the operators/validate contract (the docstring's claim),
    not silently hashed as sha256('None')."""
    from fornax_spark import GraphHandle, QueryHandle

    g = GraphHandle.create(conn)
    g.add_nodes(my_id=[1, 2])
    with pytest.raises(ValueError, match="invalid ingest rows"):
        g.add_edges_df(
            spark.createDataFrame(
                [("a", None), ("a", "b")], "start string, end string"
            )
        )
    t = GraphHandle.create(conn)
    t.add_nodes(name=["x"])
    q = QueryHandle.create(conn, g, t)
    with pytest.raises(ValueError, match="invalid ingest rows"):
        q.add_matches_df(
            spark.createDataFrame(
                [(None, 0, 0.9)], "v string, u long, weight double"
            )
        )


def test_len_on_deleted_handle_raises_not_resurrects(spark, conn):
    """ADVICE r4 (medium): len() on a deleted handle must raise via
    _check_exists, and _update_stats must never re-create a catalog row
    a cascading delete removed (phantom graphs accepted writes)."""
    from fornax_spark import GraphHandle, QueryHandle

    g = GraphHandle.create(conn)
    g.add_nodes(my_id=[1, 2])
    t = GraphHandle.create(conn)
    t.add_nodes(name=["x"])
    q = QueryHandle.create(conn, g, t)
    gid, qid = g.graph_id, q.query_id
    q.delete()
    g.delete()
    with pytest.raises(ValueError, match="cannot read graph"):
        len(g)
    with pytest.raises(ValueError, match="cannot read query"):
        len(q)
    # a direct stat write on the stale handle must be a no-op
    g._update_stats(n_nodes=99)
    q._update_stats(n_matches=99)
    cat = conn._load()
    assert str(gid) not in cat["graphs"]
    assert str(qid) not in cat["queries"]
    with pytest.raises(ValueError, match="cannot read graph"):
        g.add_nodes(my_id=[9])


def test_corpus_handle_facade(spark, conn, tmp_path):
    """VERDICT r4 item 7: the fulltext product behind the same handle
    verbs as graphs/queries — build/search through Connection.corpus
    must be bit-identical to the module-level search_segments path,
    registry-backed with cascading delete."""
    import pandas as pd

    from fornax_spark.fulltext.build import build_index_from_table
    from fornax_spark.fulltext.segments import build_segments
    from fornax_spark.fulltext.wand import search_segments

    docs = spark.createDataFrame(
        [(i, f"alpha beta tok{i % 17} tok{i % 5}") for i in range(200)],
        "doc_id long, text string",
    )
    c = conn.create_corpus("pages")
    assert len(c) == 0
    c.build(docs, n_buckets=8)
    assert len(c) == 200
    # module-level store on the SAME docs: results must be bit-identical
    idx = build_index_from_table(docs)
    ref_store = build_segments(spark, idx, str(tmp_path / "refseg"), n_buckets=8)
    want = [tuple(r) for r in search_segments(spark, ref_store, "alpha tok3", k=7).collect()]
    got = [tuple(r) for r in c.search("alpha tok3", k=7).collect()]
    assert got == want
    idx.postings.unpersist()

    # batch path + reopen by name and by id
    qpdf = pd.DataFrame(
        {"query_id": [0, 1], "query_text": ["alpha tok3", "beta tok4"], "k": 5}
    )
    batch = [tuple(r) for r in c.search_batch(qpdf).collect()]
    again = conn.corpus("pages")
    assert again.corpus_id == c.corpus_id
    assert [tuple(r) for r in again.search_batch(qpdf).collect()] == batch
    assert conn.corpora()[0]["name"] == "pages"

    # live deletes flow through the handle
    gone = [r["doc_id"] for r in c.search("alpha tok3", k=1).collect()]
    c.delete_docs(gone)
    assert gone[0] not in [
        r["doc_id"] for r in c.search("alpha tok3", k=7).collect()
    ]
    assert len(c) == 199

    # bucketed publish: handle prefers the shuffle-free form, results
    # unchanged (deletes still applied via the directory tombstones)
    c.publish_bucketed()
    after = [tuple(r) for r in c.search("alpha tok3", k=7).collect()]
    assert gone[0] not in [d for _r, d, _s in after]

    # double build raises; cascading delete removes row + store + the
    # published bucketed table (catalog entry AND warehouse files) —
    # no stale queryable table, no parquet leak (ADVICE r5)
    with pytest.raises(ValueError, match="already built"):
        c.build(docs)
    import json
    import os

    from fornax_spark.fulltext.segments import _bucketed_manifest_path

    with open(_bucketed_manifest_path(c.path)) as f:
        man = json.load(f)
    assert spark.catalog.tableExists(man["table"])
    assert os.path.isdir(man["location"])
    p = c.path
    c.delete()
    assert not os.path.exists(p)
    assert not spark.catalog.tableExists(man["table"])
    assert not os.path.isdir(man["location"])
    with pytest.raises(ValueError, match="cannot read corpus"):
        conn.corpus("pages")
    # post-delete handle methods surface the handle-level error, same
    # contract as GraphHandle/QueryHandle (ADVICE r5)
    with pytest.raises(ValueError, match="cannot read corpus"):
        len(c)
    with pytest.raises(ValueError, match="cannot read corpus"):
        c.search("alpha", k=1)


def test_corpus_handle_unbuilt_and_collision(spark, conn, tmp_path):
    """delete_docs on an unbuilt corpus gives the friendly no-built-
    store error (not a raw FileNotFoundError), and two stores published
    under the SAME table name don't silently serve each other's blocks:
    open_bucketed_table re-registers the table at its own manifest's
    location (ADVICE r5)."""
    from fornax_spark.fulltext.segments import (
        _catalog_table_location,
        open_bucketed_table,
    )
    from fornax_spark.fulltext.wand import search_segments

    c = conn.create_corpus("empty")
    with pytest.raises(ValueError, match="no built store yet"):
        c.delete_docs([1])
    c.delete()

    d1 = spark.createDataFrame(
        [(i, f"apple banana w{i % 7}") for i in range(60)],
        "doc_id long, text string",
    )
    d2 = spark.createDataFrame(
        [(1000 + i, f"cherry date w{i % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    c1 = conn.create_corpus("c1").build(d1, n_buckets=4)
    c2 = conn.create_corpus("c2").build(d2, n_buckets=4)
    c1.publish_bucketed("collide_tbl")
    c2.publish_bucketed("collide_tbl")  # steals the catalog name
    # reopening c1's store must NOT reuse the catalog's collide_tbl
    # (now rooted at c2's files) — it re-registers at c1's location
    import os

    s1 = open_bucketed_table(spark, c1.path)
    assert _catalog_table_location(spark, "collide_tbl") == os.path.join(
        os.path.abspath(c1.path), "bucketed_blocks"
    )
    got = {r["doc_id"] for r in search_segments(spark, s1, "apple", k=5).collect()}
    assert got and all(d < 1000 for d in got)
    assert s1.n_docs == 60
    c1.delete()
    # c1's manifest points at the shared name but c2 re-registers on its
    # next open; c1.delete() must not have nuked c2's files
    s2 = open_bucketed_table(spark, c2.path)
    got2 = {r["doc_id"] for r in search_segments(spark, s2, "cherry", k=5).collect()}
    assert got2 and all(d >= 1000 for d in got2)
    c2.delete()
    spark.sql("DROP TABLE IF EXISTS collide_tbl")


def test_bucketed_collision_refuses_managed_table(spark, conn, tmp_path):
    """The collision handler's re-register DROP is metadata-only ONLY
    for EXTERNAL tables — colliding with a user's MANAGED table must
    raise instead of deleting their data files (ADVICE r6)."""
    from fornax_spark.fulltext.segments import open_bucketed_table

    spark.sql("DROP TABLE IF EXISTS managed_collide")
    spark.sql("CREATE TABLE managed_collide (x INT) USING parquet")
    spark.range(3).selectExpr("cast(id as int) x").write.mode(
        "append"
    ).saveAsTable("managed_collide")
    d = spark.createDataFrame(
        [(i, f"kiwi w{i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    c = conn.create_corpus("mg").build(d, n_buckets=4)
    try:
        with pytest.raises(ValueError, match="MANAGED"):
            c.publish_bucketed("managed_collide")
        # the managed table and its data survived the refusal
        assert spark.table("managed_collide").count() == 3
    finally:
        c.delete()
        spark.sql("DROP TABLE IF EXISTS managed_collide")


def test_corpus_facade_stale_snapshot_falls_back(spark, conn):
    """VERDICT r5 item 3, facade side: when the store's segments change
    after publish (ledger rewritten by a rebuild/merge in place), the
    handle must stop preferring the now-stale bucketed table and serve
    the directory store instead — never the old snapshot."""
    from fornax_spark.fulltext.segments import (
        BucketedSegmentStore,
        SegmentStore,
        _load_ledger,
        _save_ledger,
    )

    docs = spark.createDataFrame(
        [(i, f"kiwi mango tok{i % 9}") for i in range(80)],
        "doc_id long, text string",
    )
    c = conn.create_corpus("stale_facade").build(docs, n_buckets=4)
    want = [tuple(r) for r in c.search("kiwi tok3", k=5).collect()]
    c.publish_bucketed()
    assert isinstance(c._store(), BucketedSegmentStore)
    assert [tuple(r) for r in c.search("kiwi tok3", k=5).collect()] == want

    # simulate an in-place compaction rewriting the ledger after publish
    ledger = _load_ledger(c.path)
    ledger["groups"]["g9999"] = {"status": "done", "buckets": []}
    _save_ledger(c.path, ledger)

    st = c._store()
    assert isinstance(st, SegmentStore)
    assert not isinstance(st, BucketedSegmentStore)
    assert [tuple(r) for r in c.search("kiwi tok3", k=5).collect()] == want
    c.delete()


def test_corpus_compact_facade(spark, conn):
    """VERDICT r5 item 5: build -> delete_docs -> compact() through the
    handle — the compacted store must equal a CLEAN rebuild over the
    surviving docs (tombstones physically dropped, stats exact), the
    registry row repoints to the new generation directory, the old one
    is gone, and a previously published bucketed table is refreshed
    under the same name (still the shuffle-free form)."""
    import os

    from fornax_spark.fulltext.build import build_index_from_table
    from fornax_spark.fulltext.deletes import TOMBSTONE_FILE
    from fornax_spark.fulltext.segments import (
        BucketedSegmentStore,
        build_segments,
    )
    from fornax_spark.fulltext.wand import search_segments
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"pear plum tok{i % 11} tok{i % 4}") for i in range(150)],
        "doc_id long, text string",
    )
    c = conn.create_corpus("compactme").build(docs, n_buckets=8)
    gone = [r["doc_id"] for r in c.search("pear tok3", k=3).collect()]
    c.delete_docs(gone)
    c.publish_bucketed()
    old_path = c.path

    c.compact()

    assert c.path != old_path and not os.path.exists(old_path)
    assert not os.path.exists(os.path.join(c.path, TOMBSTONE_FILE))
    assert len(c) == 150 - len(gone)
    st = c._store()
    assert isinstance(st, BucketedSegmentStore)  # re-published
    assert st.n_docs == 150 - len(gone)

    # parity with a clean rebuild over the surviving documents
    survivors = docs.filter(~F.col("doc_id").isin(gone))
    idx = build_index_from_table(survivors)
    ref = build_segments(
        spark, idx, os.path.join(conn.root, "refclean"), n_buckets=8
    )
    for q in ["pear tok3", "plum tok1 tok2", "zzznope"]:
        want = [tuple(r) for r in search_segments(spark, ref, q, k=7).collect()]
        assert [tuple(r) for r in c.search(q, k=7).collect()] == want
    idx.postings.unpersist()

    # compacting again (no tombstones) still round-trips
    c.compact()
    assert len(c) == 150 - len(gone)
    c.delete()


def test_corpus_add_docs_facade(spark, conn):
    """Incremental ingest through the handle (r6): add_docs folds a
    delta generation into the live store — search afterward equals a
    clean rebuild over the concatenated corpus; a duplicate doc_id
    raises from the merge's disjointness check; a published bucketed
    table is refreshed."""
    import os

    from fornax_spark.fulltext.build import build_index_from_table
    from fornax_spark.fulltext.segments import (
        BucketedSegmentStore,
        build_segments,
    )
    from fornax_spark.fulltext.wand import search_segments

    first = spark.createDataFrame(
        [(i, f"fig date tok{i % 6}") for i in range(90)],
        "doc_id long, text string",
    )
    more = spark.createDataFrame(
        [(1000 + i, f"fig grape tok{i % 6}") for i in range(60)],
        "doc_id long, text string",
    )
    c = conn.create_corpus("growme").build(first, n_buckets=8)
    c.publish_bucketed()
    c.add_docs(more)
    assert len(c) == 150
    st = c._store()
    assert isinstance(st, BucketedSegmentStore)  # re-published
    assert st.n_docs == 150

    both = first.unionByName(more)
    idx = build_index_from_table(both)
    ref = build_segments(
        spark, idx, os.path.join(conn.root, "refboth"), n_buckets=8
    )
    for q in ["fig tok3", "grape tok1", "date"]:
        want = [tuple(r) for r in search_segments(spark, ref, q, k=8).collect()]
        assert [tuple(r) for r in c.search(q, k=8).collect()] == want
    idx.postings.unpersist()

    # duplicate doc_id -> loud failure, corpus unchanged
    dup = spark.createDataFrame(
        [(5, "smuggled duplicate")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="more than one input store"):
        c.add_docs(dup)
    assert len(c) == 150
    # ...but a TOMBSTONED id may be re-ingested (replace = delete + add)
    c.delete_docs([5])
    assert len(c) == 149
    c.add_docs(spark.createDataFrame(
        [(5, "replacement text fig")], "doc_id long, text string"
    ))
    assert len(c) == 150
    got = {r["doc_id"] for r in c.search("replacement", k=3).collect()}
    assert got == {5}
    c.delete()


def test_corpus_boolean_weighted_facets_verbs(spark, conn, tmp_path):
    """The r7 serving verbs through the facade: search_boolean /
    search_weighted / facets on a CorpusHandle equal the raw-index
    paths, including from the published bucketed form."""
    from fornax_spark.fulltext.build import build_index_from_table
    from fornax_spark.fulltext.query import (
        facet_counts,
        search_boolean,
        search_weighted,
    )

    docs = spark.createDataFrame(
        [
            (i, f"alpha beta tok{i % 17} tok{i % 5}", ["en", "de"][i % 2])
            for i in range(200)
        ],
        "doc_id long, text string, lang string",
    )
    c = conn.create_corpus("bw")
    c.build(docs, n_buckets=8)
    idx = build_index_from_table(docs)
    kw = dict(should="alpha tok3", must="tok0", must_not="tok4", k=9)
    want_b = [tuple(r) for r in search_boolean(spark, idx, **kw).collect()]
    wts = {"alpha": 1.0, "tok3": 0.5}
    want_w = [tuple(r) for r in search_weighted(spark, idx, wts, k=9).collect()]
    want_f = sorted(
        tuple(r)
        for r in facet_counts(spark, idx, docs, "alpha tok3", "lang").collect()
    )
    assert [tuple(r) for r in c.search_boolean(**kw).collect()] == want_b
    assert [tuple(r) for r in c.search_weighted(wts, k=9).collect()] == want_w
    assert (
        sorted(tuple(r) for r in c.facets("alpha tok3", docs, "lang").collect())
        == want_f
    )
    # published bucketed form serves the same answers (decode_postings
    # runs over BucketedSegmentStore.blocks)
    c.publish_bucketed("bw_bool_tbl")
    assert [tuple(r) for r in c.search_boolean(**kw).collect()] == want_b
    assert [tuple(r) for r in c.search_weighted(wts, k=9).collect()] == want_w
    idx.postings.unpersist()
