"""Top-n scored subgraph enumeration + node-link JSON assembly (V16/V18/
S9) — the reference's user-facing product.

Pipeline position: `nema_match` (operators/nema.py) refines candidate
matches distributively; by the time refinement converges the surviving
state is O(|matches| x h-hop-degree) rows — independent of corpus scale
(candidates come from the user-supplied match table, not the data).
Enumeration is inherently a GLOBAL sequential greedy (seeds visited in
ascending-cost order with cross-seed dedup — reference
/root/reference/fornax/opt.py:698-712), so it runs driver-side on the
collected tables, exactly as the reference runs it in NumPy. The
DataFrame stages end where the sequential algorithm begins.

Reference parity:
  * greedy refinement       opt.py:431-507 (Refiner) + 698-712
  * subgraph scoring        api.py:886-894 (_get_scores: unmatched-node
                            penalty `sz - len(subgraph)`, / n query nodes)
  * deterministic ranking   api.py:973-977 (score, then sha256 hash of
                            the subgraph tuple)
  * node-link JSON          api.py:896-1041 (_node_to_dict/_edge_to_dict/
                            execute), golden-tested end-to-end against
                            the reference's own expected payloads in
                            tests/test_subgraphs.py (mirror of
                            /root/reference/test/test_api.py:462-671)
"""

from __future__ import annotations

import hashlib
import sys

from .nema import NemaResult

#: the reference hashes ids with sha256 % maxsize (api.py:31-47); under
#: SQLite it pins maxsize to 2**63-1 (api.py:72-80)
SQLITE_MAX_SIZE = 2**63 - 1


def _hash(item, maxsize: int = sys.maxsize) -> int:
    """Unsalted stable hash, bit-compatible with the reference
    (api.py:31-47): ints pass through mod maxsize, everything else is
    sha256 of str()."""
    if isinstance(item, int):
        return item % maxsize
    return int(hashlib.sha256(str(item).encode("utf-8")).hexdigest(), 16) % maxsize


def enumerate_subgraphs(
    result: NemaResult, n_query_nodes: int | None = None
) -> list[dict]:
    """All maximal greedy subgraph matches with scores, ranked.

    Returns [{"pairs": [(v, u), ...], "score": float}, ...] sorted by
    (score, _hash(pairs-tuple)) — the reference's deterministic ranking.

    Greedy walk (reference Refiner.__call__): seeds are (v, u) pairs in
    ascending inference-cost order; from a seed, recursively add each
    neighbour argmin (vv, uu) unless the query node vv is already
    matched in this subgraph. Identical (sorted) pair sets are emitted
    once. Score = (sum of inference costs + (sz - |subgraph|)) / n_query
    where sz = #matched query nodes: every unmatched query node costs a
    full 1.0 (api.py:886-894).
    """
    assert result.neighbour_argmins is not None, "run nema_match first"
    if result.local_costs is not None:  # in-process fast path: no collect
        inference = dict(result.local_costs)
        argmin_rows = result.local_argmins
    else:
        inference = {
            (r["v"], r["u"]): float(r["cost"])
            for r in result.inference_costs.collect()
        }
        argmin_rows = [
            (r["v"], r["u"], r["vv"], r["uu"])
            for r in result.neighbour_argmins.collect()
        ]
    neigh: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for v, u, vv, uu in sorted(argmin_rows):
        neigh.setdefault((int(v), int(u)), []).append((int(vv), int(uu)))

    def walk(seed: tuple[int, int], out: list[tuple[int, int]]) -> None:
        if seed[0] in {v for v, _u in out}:
            return
        out.append(seed)
        for nxt in neigh.get(seed, []):
            walk(nxt, out)

    # seeds in ascending cost order; (v, u) tiebreak for determinism
    # (the reference's np.sort(order=['cost']) leaves ties unspecified)
    seeds = sorted(inference, key=lambda k: (inference[k], k))
    subgraphs: list[list[tuple[int, int]]] = []
    seen: set[tuple] = set()
    for seed in seeds:
        sub: list[tuple[int, int]] = []
        walk(seed, sub)
        key = tuple(sorted(sub))
        if sub and key not in seen:
            seen.add(key)
            subgraphs.append(sorted(sub))

    sz = len({v for v, _u in inference})  # #query nodes with any match
    # denominator = TOTAL query graph nodes (api.py:892: len(query_nodes));
    # defaults to sz when the query graph has no matchless nodes
    n_query = n_query_nodes if n_query_nodes is not None else sz
    scored = []
    for sub in subgraphs:
        score = sum(inference[p] for p in sub) + (sz - len(sub))
        score /= n_query
        scored.append({"pairs": sub, "score": score})
    scored.sort(key=lambda g: (g["score"], _hash(tuple(map(tuple, g["pairs"])))))
    return scored


def node_link_graphs(
    result: NemaResult,
    query_nodes: list[tuple[int, dict]],
    query_edges: list[tuple[int, int]],
    target_nodes: list[tuple[int, dict]],
    target_edges: list[tuple[int, int]],
    n: int = 5,
    hopping_distance: int = 2,
    max_iters: int = 10,
    maxsize: int = SQLITE_MAX_SIZE,
) -> dict:
    """Assemble the reference's exact JSON payload (api.py:941-1041):
    top-n subgraph matches as node-link graphs.

    query_nodes/target_nodes: (id, meta-dict) pairs; edges: (start, end)
    or (start, end, meta-dict) — the 3-tuple form carries STORED
    per-edge metadata into the payload (reference api.py:913-938 spreads
    edge.meta into each link dict; the handle facade feeds this from its
    parquet meta columns). Node ids are hashed with their type so one
    payload can carry both graphs; match links carry
    weight = 1 - inference_cost.
    """
    ranked = enumerate_subgraphs(result, n_query_nodes=len(query_nodes))[:n]
    if result.local_costs is not None:
        inference = dict(result.local_costs)
    else:
        inference = {
            (r["v"], r["u"]): float(r["cost"])
            for r in result.inference_costs.collect()
        }

    def node_dict(nid: int, ntype: str, meta: dict) -> dict:
        return {"id": _hash((nid, ntype), maxsize), "type": ntype, **meta}

    def edge_dict(start: int, end: int, etype: str, meta: dict, weight=1.0) -> dict:
        if etype in ("query", "target"):
            s = _hash((start, etype), maxsize)
            e = _hash((end, etype), maxsize)
        else:  # match: query-side start, target-side end
            s = _hash((start, "query"), maxsize)
            e = _hash((end, "target"), maxsize)
        return {"source": s, "target": e, "type": etype, "weight": weight, **meta}

    def _edge3(e):  # (start, end) | (start, end, meta)
        return e[0], e[1], (e[2] if len(e) > 2 else {})

    ekey = lambda e: (e[0], e[1])  # noqa: E731 — dicts don't compare
    nkey = lambda x: x[0]  # noqa: E731

    q_nodes = [node_dict(i, "query", m) for i, m in sorted(query_nodes, key=nkey)]
    q_edges = [
        edge_dict(s, e, "query", m)
        for s, e, m in (_edge3(x) for x in sorted(query_edges, key=ekey))
    ]
    t_nodes = [node_dict(i, "target", m) for i, m in sorted(target_nodes, key=nkey)]
    t_edges = [
        edge_dict(s, e, "target", m)
        for s, e, m in (_edge3(x) for x in sorted(target_edges, key=ekey))
    ]

    graphs = []
    for g in ranked:
        match_ends = {_hash((u, "target"), maxsize) for _v, u in g["pairs"]}
        matches = [
            edge_dict(v, u, "match", {}, 1.0 - inference[(v, u)])
            for v, u in sorted(g["pairs"])
        ]
        nxt = {
            "is_multigraph": False,
            "cost": g["score"],
            "nodes": list(q_nodes),
            "links": matches + list(q_edges),
        }
        nxt["nodes"].extend([x for x in t_nodes if x["id"] in match_ends])
        nxt["links"].extend(
            [
                x
                for x in t_edges
                if x["source"] in match_ends and x["target"] in match_ends
            ]
        )
        graphs.append(nxt)

    return {
        "graphs": graphs,
        "iters": result.iters,
        "hopping_distance": hopping_distance,
        "max_iters": max_iters,
    }
