"""Handle-style public API: the reference's entire user surface
(Connection / GraphHandle / QueryHandle, /root/reference/fornax/api.py:
74-121, 245-489, 590-1041) composed over this repo's Spark-first pieces
(registry-style catalog, validation, nema_match, node_link_graphs).

A user of the reference writes::

    with fornax.Connection(url) as conn:
        g = fornax.GraphHandle.create(conn)
        g.add_nodes(name=['a', 'b'])
        g.add_edges([0], [1])
        q = fornax.QueryHandle.create(conn, query_graph, target_graph)
        q.add_matches([0], [0], [.9])
        result = q.execute(n=5)

This module gives the same verbs over a directory-rooted catalog plus
parquet node/edge/match tables:

  * graphs and queries share ONE namespace with auto-assigned integer
    ids and cascading delete (reference model.py:10-31, api.py:289-345).
  * per-node / per-edge / per-match metadata is STORED as a JSON column
    in the parquet tables (the reference persists `meta` through the
    engine; api.py:404-416) and re-enters result payloads from storage,
    not from function arguments.
  * ragged keyword arguments are poisoned with NullValue and rejected at
    ingest (reference api.py:395-404 lets json serialization fail; here
    the failure is an explicit ValueError naming the short column).
  * ids are hashed with the reference's exact unsalted scheme
    (sha256 % maxsize for non-ints, identity for ints; api.py:31-47),
    so payload node ids are bit-identical to the reference's.
  * execute() runs the NeMa refinement through nema_match's size
    dispatch: tutorial-scale graphs run in-process, big candidate
    tables take the distributed DataFrame path — same recipe either
    way — and assembles the reference's exact node-link JSON payload
    (api.py:941-1041) via operators/subgraphs.node_link_graphs.

Storage is plain parquet + a JSON catalog so handles survive sessions;
`add_*` appends, mirroring the reference's transactional inserts.
"""

from __future__ import annotations

import itertools
import json
import os
import shutil

from pyspark.sql import SparkSession

from .operators.nema import nema_match
from .operators.subgraphs import SQLITE_MAX_SIZE, _hash, node_link_graphs

CATALOG_FILE = "catalog.json"

EDGE_RESERVED = ("start", "end", "type", "weight")


class NullValue:
    """Ragged-kwarg poison (reference api.py:160-166): a value that
    cannot be JSON-serialized, marking positions where zip_longest ran
    past the end of a shorter keyword column."""


class InvalidNodeError(Exception):
    pass


class InvalidEdgeError(Exception):
    pass


class Connection:
    """A directory-rooted namespace of graphs and queries.

    :param root: directory holding the catalog and all graph/query data
    :param spark: the SparkSession used for storage and execution

    Supports the reference's context-manager syntax; there is no
    transaction to roll back (parquet appends are atomic per call), so
    __enter__/__exit__ only open/close the namespace.
    """

    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        self.maxsize = SQLITE_MAX_SIZE
        os.makedirs(root, exist_ok=True)

    def __enter__(self) -> "Connection":
        return self

    def __exit__(self, exc_type, exc_val, tb) -> bool:
        return False

    def _hash(self, item) -> int:
        return _hash(item, self.maxsize)

    # -- catalog io (atomic tmp+rename, same discipline as the segment
    # ledger) ----------------------------------------------------------
    def _catalog_path(self) -> str:
        return os.path.join(self.root, CATALOG_FILE)

    def _load(self) -> dict:
        p = self._catalog_path()
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {"next_graph_id": 0, "next_query_id": 0, "graphs": {},
                "queries": {}}

    def _save(self, cat: dict) -> None:
        tmp = self._catalog_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cat, f, indent=1, sort_keys=True)
        os.replace(tmp, self._catalog_path())


def _zip_meta(keys: list[str], columns: list, n_hint: int | None = None):
    """zip_longest the keyword columns with NullValue poison and yield
    per-row meta dicts; a NullValue in any dict means the input was
    ragged -> raise (reference api.py:395-404, where json.dumps fails)."""
    zipped = itertools.zip_longest(*columns, fillvalue=NullValue())
    for values in zipped:
        meta = dict(zip(keys, values))
        for k, v in meta.items():
            if isinstance(v, NullValue):
                raise ValueError(
                    f"ragged keyword arguments: column {k!r} is shorter "
                    "than its siblings"
                )
        yield meta


class GraphHandle:
    """Handle to a graph with unique id `graph_id` under `connection`."""

    def __init__(self, connection: Connection, graph_id: int):
        self._graph_id = graph_id
        self.conn = connection
        self._check_exists()

    def __repr__(self) -> str:
        return f"<GraphHandle(graph_id={self._graph_id})>"

    def __eq__(self, other) -> bool:
        return self.graph_id == other.graph_id

    def __len__(self) -> int:
        p = self._nodes_path()
        if not os.path.exists(p):
            return 0
        return self.conn.spark.read.parquet(p).count()

    @property
    def graph_id(self) -> int:
        return self._graph_id

    @classmethod
    def create(cls, connection: Connection) -> "GraphHandle":
        """Create a new empty graph and return a handle (auto id)."""
        cat = connection._load()
        gid = cat["next_graph_id"]
        cat["graphs"][str(gid)] = {}
        cat["next_graph_id"] = gid + 1
        connection._save(cat)
        os.makedirs(cls._dir_for(connection, gid), exist_ok=True)
        return GraphHandle(connection, gid)

    @classmethod
    def read(cls, connection: Connection, graph_id: int) -> "GraphHandle":
        return GraphHandle(connection, graph_id)

    @staticmethod
    def _dir_for(conn: Connection, gid: int) -> str:
        return os.path.join(conn.root, f"graph_{gid}")

    def _nodes_path(self) -> str:
        return os.path.join(self._dir_for(self.conn, self._graph_id), "nodes")

    def _edges_path(self) -> str:
        return os.path.join(self._dir_for(self.conn, self._graph_id), "edges")

    def _check_exists(self) -> None:
        cat = self.conn._load()
        if str(self._graph_id) not in cat["graphs"]:
            raise ValueError(
                f"cannot read graph with graph id: {self._graph_id}"
            )

    def delete(self) -> None:
        """Cascading delete: catalog row + nodes + edges."""
        self._check_exists()
        cat = self.conn._load()
        del cat["graphs"][str(self._graph_id)]
        self.conn._save(cat)
        shutil.rmtree(self._dir_for(self.conn, self._graph_id),
                      ignore_errors=True)

    def add_nodes(self, **kwargs) -> None:
        """Append nodes. Keyword columns become per-node JSON metadata;
        `id_src` (optional) supplies hashable custom ids, otherwise ids
        are sequential from the current node count; `id` is reserved."""
        self._check_exists()
        keys = list(kwargs.keys())
        if not keys:
            raise ValueError("add_nodes requires at least one keyword argument")
        if "id" in keys:
            raise ValueError(
                "id is a reserved node attribute which cannot be assigned"
            )
        id_src = kwargs.pop("id_src", None)
        meta_keys = list(kwargs.keys())
        metas = list(_zip_meta(meta_keys, list(kwargs.values())))
        if id_src is not None:
            ids = list(id_src)
            if len(ids) != len(metas) and meta_keys:
                raise ValueError(
                    "ragged keyword arguments: id_src length differs "
                    "from the metadata columns"
                )
            if not metas:
                metas = [{} for _ in ids]
        else:
            start = len(self)
            ids = list(range(start, start + len(metas)))
        rows = []
        for nid, meta in zip(ids, metas):
            hashed = self.conn._hash(nid)
            if not isinstance(hashed, int):
                raise InvalidNodeError(f"{nid!r}: node_id must be an integer")
            rows.append((hashed, json.dumps(meta)))
        self.conn.spark.createDataFrame(
            rows, "node_id long, meta string"
        ).write.mode("append").parquet(self._nodes_path())

    def add_edges(self, sources, targets, **kwargs) -> None:
        """Append undirected edges (stored doubled, reference
        api.py:472-486). Keyword columns become per-edge JSON metadata;
        start/end/type/weight are reserved."""
        self._check_exists()
        for k in EDGE_RESERVED:
            if k in kwargs:
                raise ValueError(
                    f"{k} is a reserved attribute which cannot be "
                    "assigned using kwargs"
                )
        meta_keys = list(kwargs.keys())
        cols = [list(sources), list(targets), *map(list, kwargs.values())]
        rows = []
        for s, t, *values in itertools.zip_longest(
            *cols, fillvalue=NullValue()
        ):
            meta = dict(zip(meta_keys, values))
            if isinstance(s, NullValue) or isinstance(t, NullValue) or any(
                isinstance(v, NullValue) for v in meta.values()
            ):
                raise ValueError(
                    "ragged arguments: sources/targets/keyword columns "
                    "differ in length"
                )
            hs, ht = self.conn._hash(s), self.conn._hash(t)
            if hs == ht:
                raise InvalidEdgeError(
                    f"({s!r}, {t!r}): edges must start and end on "
                    "different nodes"
                )
            m = json.dumps(meta)
            rows.append((hs, ht, m))
            rows.append((ht, hs, m))
        self.conn.spark.createDataFrame(
            rows, "start long, end long, meta string"
        ).write.mode("append").parquet(self._edges_path())

    # -- reads ---------------------------------------------------------
    def nodes(self) -> list[tuple[int, dict]]:
        """(node_id, meta) pairs — stored-metadata read."""
        p = self._nodes_path()
        if not os.path.exists(p):
            return []
        return sorted(
            (int(r["node_id"]), json.loads(r["meta"]))
            for r in self.conn.spark.read.parquet(p).collect()
        )

    def edges(self) -> list[tuple[int, int, dict]]:
        """(start, end, meta) with start < end (un-doubled)."""
        p = self._edges_path()
        if not os.path.exists(p):
            return []
        return sorted(
            (int(r["start"]), int(r["end"]), json.loads(r["meta"]))
            for r in self.conn.spark.read.parquet(p).collect()
            if r["start"] < r["end"]
        )

    def edges_df(self):
        """The doubled (start, end) edge DataFrame — the distributed
        input to nema_match at scale."""
        return self.conn.spark.read.parquet(self._edges_path())


class QueryHandle:
    """Handle to a query (query graph, target graph, candidate matches)
    with unique id `query_id` under `connection`."""

    def __init__(self, connection: Connection, query_id: int):
        self.query_id = query_id
        self.conn = connection
        self._check_exists()

    def __eq__(self, other) -> bool:
        return self.query_id == other.query_id

    def __len__(self) -> int:
        p = self._matches_path()
        if not os.path.exists(p):
            return 0
        return self.conn.spark.read.parquet(p).count()

    def _check_exists(self) -> None:
        cat = self.conn._load()
        if str(self.query_id) not in cat["queries"]:
            raise ValueError(
                f"cannot read query with query id {self.query_id}"
            )

    def _dir(self) -> str:
        return os.path.join(self.conn.root, f"query_{self.query_id}")

    def _matches_path(self) -> str:
        return os.path.join(self._dir(), "matches")

    @classmethod
    def create(
        cls, connection: Connection,
        query_graph: GraphHandle, target_graph: GraphHandle,
    ) -> "QueryHandle":
        cat = connection._load()
        qid = cat["next_query_id"]
        cat["queries"][str(qid)] = {
            "start_graph_id": query_graph.graph_id,
            "end_graph_id": target_graph.graph_id,
        }
        cat["next_query_id"] = qid + 1
        connection._save(cat)
        os.makedirs(os.path.join(connection.root, f"query_{qid}"),
                    exist_ok=True)
        return QueryHandle(connection, qid)

    @classmethod
    def read(cls, connection: Connection, query_id: int) -> "QueryHandle":
        return QueryHandle(connection, query_id)

    def delete(self) -> None:
        self._check_exists()
        cat = self.conn._load()
        del cat["queries"][str(self.query_id)]
        self.conn._save(cat)
        shutil.rmtree(self._dir(), ignore_errors=True)

    def query_graph(self) -> GraphHandle:
        self._check_exists()
        cat = self.conn._load()
        return GraphHandle(
            self.conn, cat["queries"][str(self.query_id)]["start_graph_id"]
        )

    def target_graph(self) -> GraphHandle:
        self._check_exists()
        cat = self.conn._load()
        return GraphHandle(
            self.conn, cat["queries"][str(self.query_id)]["end_graph_id"]
        )

    def add_matches(self, sources, targets, weights, **kwargs) -> None:
        """Append candidate matches (query node, target node, weight in
        (0, 1]); keyword columns become per-match JSON metadata."""
        self._check_exists()
        for k in EDGE_RESERVED:
            if k in kwargs:
                raise ValueError(
                    f"{k} is a reserved attribute which cannot be "
                    "assigned using kwargs"
                )
        meta_keys = list(kwargs.keys())
        cols = [list(sources), list(targets), list(weights),
                *map(list, kwargs.values())]
        rows = []
        for v, u, w, *values in itertools.zip_longest(
            *cols, fillvalue=NullValue()
        ):
            meta = dict(zip(meta_keys, values))
            if any(
                isinstance(x, NullValue)
                for x in (v, u, w, *meta.values())
            ):
                raise ValueError(
                    "ragged arguments: sources/targets/weights/keyword "
                    "columns differ in length"
                )
            w = float(w)
            if not 0 < w <= 1:
                raise ValueError(
                    f"({v!r}, {u!r}, {w}): bounds error: 0 < weight <= 1"
                )
            rows.append(
                (self.conn._hash(v), self.conn._hash(u), w, json.dumps(meta))
            )
        self.conn.spark.createDataFrame(
            rows, "v long, u long, weight double, meta string"
        ).write.mode("append").parquet(self._matches_path())

    def execute(
        self, n: int = 5, hopping_distance: int = 2, max_iters: int = 10
    ) -> dict:
        """Top-n fuzzy subgraph matches as the reference's node-link JSON
        payload (api.py:941-1041). Refinement goes through nema_match's
        size dispatch (in-process at tutorial scale, distributed
        DataFrames at candidate volume); payload node/edge metadata
        comes from the STORED meta columns."""
        self._check_exists()
        if not len(self):
            raise ValueError("Cannot execute query with no matches")
        qg, tg = self.query_graph(), self.target_graph()
        spark = self.conn.spark
        matches_df = spark.read.parquet(self._matches_path()).select(
            "v", "u", "weight"
        )
        res = nema_match(
            qg.edges_df().select("start", "end"),
            tg.edges_df().select("start", "end"),
            matches_df,
            h=hopping_distance,
            max_iters=max_iters,
        )
        return node_link_graphs(
            res,
            query_nodes=qg.nodes(),
            query_edges=qg.edges(),
            target_nodes=tg.nodes(),
            target_edges=tg.edges(),
            n=n,
            hopping_distance=hopping_distance,
            max_iters=max_iters,
            maxsize=self.conn.maxsize,
        )
