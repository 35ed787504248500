"""NeMa-style iterative matcher vs a self-written pure-Python oracle
implementing the exact cost recipe documented in operators/nema.py.

Scenario style mirrors the reference's figure-4 golden tests
(/root/reference/test/test_opt.py:68-151) with our own graphs/values.
"""

from __future__ import annotations

import pytest


def _bfs_within(edges: list[tuple[int, int]], h: int) -> dict[int, dict[int, int]]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for src in adj:
        dist = {src: 0}
        frontier = [src]
        for d in range(1, h + 1):
            nxt = []
            for x in frontier:
                for y in adj[x]:
                    if y not in dist:
                        dist[y] = d
                        nxt.append(y)
            frontier = nxt
        out[src] = dist
    return out


def nema_oracle(qedges, tedges, matches, h=2, alpha=0.3, lam=0.3,
                max_iters=10, stable_frac=0.9):
    """Pure-Python implementation of the documented cost recipe."""
    qn = _bfs_within(qedges, h)
    tn = _bfs_within(tedges, h)
    by_v: dict[int, list[tuple[int, float]]] = {}
    for v, u, w in matches:
        by_v.setdefault(v, []).append((u, w))

    def prox(d):
        return alpha ** d if d <= h else 0.0

    beta = {}
    for v, _u, _w in matches:
        nbrs = {vv: d for vv, d in qn.get(v, {}).items() if vv != v}
        if nbrs:
            beta[v] = sum(prox(d) for d in nbrs.values())

    prev_costs: dict[tuple[int, int], float] = {}
    prev_opt = None
    iters = 0
    inference: dict[tuple[int, int], float] = {}
    for it in range(max_iters):
        iters = it + 1
        inference = {}
        for v, u, w in matches:
            nbrs = {vv: d for vv, d in qn.get(v, {}).items() if vv != v}
            if not nbrs:
                continue
            partials = []
            for vv, dv in nbrs.items():
                cands = []
                for uu, w_n in by_v.get(vv, []):
                    du = tn.get(u, {}).get(uu)
                    if du is None:
                        continue
                    pc = prev_costs.get((vv, uu), 0.0)
                    c = (1 - lam) * max(prox(dv) - prox(du), 0.0) + lam * (
                        1.0 - w_n + pc
                    )
                    cands.append((c, uu))
                if cands:
                    partials.append(min(cands)[0])
                else:
                    partials.append(
                        (1 - lam) * max(prox(dv) - 0.0, 0.0) + lam * 1.0
                    )
            inference[(v, u)] = (1.0 - w) + (
                sum(partials) / len(partials)
            ) / beta.get(v, 1.0)
        opt = {}
        for (v, u), c in inference.items():
            if v not in opt or (c, u) < (opt[v][1], opt[v][0]):
                opt[v] = (u, c)
        cur = {(v, u) for v, (u, _c) in opt.items()}
        if prev_opt is not None and prev_opt:
            same = len(prev_opt & cur)
            if same / len(prev_opt) > stable_frac:
                prev_costs = inference
                break
        prev_opt = cur
        prev_costs = inference
    final = {k: c / iters for k, c in prev_costs.items()}
    opt = {}
    for (v, u), c in final.items():
        if v not in opt or (c, u) < (opt[v][1], opt[v][0]):
            opt[v] = (u, c)
    return final, opt, iters


QEDGES = [(1, 2), (1, 3), (2, 4)]
# target: nodes 11..14 mirror the query graph; 15 is a decoy
TEDGES = [(11, 12), (11, 13), (12, 14), (13, 15)]
MATCHES = [
    (1, 11, 1.0), (1, 15, 0.9),
    (2, 12, 0.9), (2, 15, 0.4),
    (3, 13, 0.8), (3, 14, 0.8),
    (4, 14, 0.7), (4, 15, 0.6),
]


def test_nema_matches_oracle(spark):
    from fornax_spark.operators.nema import nema_match

    qdf = spark.createDataFrame(QEDGES, "start long, end long")
    tdf = spark.createDataFrame(TEDGES, "start long, end long")
    mdf = spark.createDataFrame(MATCHES, "v long, u long, weight double")

    res = nema_match(qdf, tdf, mdf, h=2, alpha=0.3, lam=0.3, max_iters=10)
    want_costs, want_opt, want_iters = nema_oracle(
        QEDGES, TEDGES, MATCHES, h=2, alpha=0.3, lam=0.3, max_iters=10
    )

    assert res.iters == want_iters
    got = {(r["v"], r["u"]): r["cost"] for r in res.inference_costs.collect()}
    assert set(got) == set(want_costs)
    for k, c in want_costs.items():
        assert got[k] == pytest.approx(c, abs=1e-9), k
    got_opt = {r["v"]: r["u"] for r in res.optimal_match.collect()}
    assert got_opt == {v: u for v, (u, _c) in want_opt.items()}


def test_nema_isomorphic_assignment_wins(spark):
    """With the correct mapping available, NeMa must pick it."""
    from fornax_spark.operators.nema import nema_match

    qdf = spark.createDataFrame(QEDGES, "start long, end long")
    tdf = spark.createDataFrame(TEDGES, "start long, end long")
    mdf = spark.createDataFrame(MATCHES, "v long, u long, weight double")
    res = nema_match(qdf, tdf, mdf)
    got = {r["v"]: r["u"] for r in res.optimal_match.collect()}
    assert got == {1: 11, 2: 12, 3: 13, 4: 14}


def test_nema_local_equals_distributed(spark):
    """The size-dispatched in-process path must agree with the
    distributed DataFrame path on costs, optimal assignment, iteration
    count AND the greedy transition table."""
    from fornax_spark.operators.nema import nema_match

    qdf = spark.createDataFrame(QEDGES, "start long, end long")
    tdf = spark.createDataFrame(TEDGES, "start long, end long")
    mdf = spark.createDataFrame(MATCHES, "v long, u long, weight double")

    loc = nema_match(qdf, tdf, mdf, h=2, alpha=0.3, lam=0.3, max_iters=10)
    dist = nema_match(
        qdf, tdf, mdf, h=2, alpha=0.3, lam=0.3, max_iters=10,
        local_threshold=0,
    )
    assert loc.iters == dist.iters
    ca = {(r["v"], r["u"]): r["cost"] for r in loc.inference_costs.collect()}
    cb = {(r["v"], r["u"]): r["cost"] for r in dist.inference_costs.collect()}
    assert set(ca) == set(cb)
    for k in ca:
        assert ca[k] == pytest.approx(cb[k], abs=1e-12), k
    assert {r["v"]: r["u"] for r in loc.optimal_match.collect()} == {
        r["v"]: r["u"] for r in dist.optimal_match.collect()
    }
    assert sorted(
        tuple(r) for r in loc.neighbour_argmins.collect()
    ) == sorted(tuple(r) for r in dist.neighbour_argmins.collect())


def test_nema_dispatch_same_errors(spark):
    """ADVICE r3: the same malformed input must raise the IDENTICAL
    error regardless of which size-dispatch branch runs — both paths
    now go through one validation contract (check_rows_or_raise is the
    driver-side twin of check_or_raise)."""
    from fornax_spark.operators.nema import nema_match

    qdf = spark.createDataFrame(QEDGES, "start long, end long")
    tdf = spark.createDataFrame(TEDGES, "start long, end long")
    loops = spark.createDataFrame([(5, 5)], "start long, end long")
    badw = spark.createDataFrame([(1, 11, 1.5)], "v long, u long, weight double")
    okm = spark.createDataFrame([(5, 11, 0.5)], "v long, u long, weight double")

    for bad_args in ((loops, tdf, okm), (qdf, tdf, badw)):
        msgs = []
        for lt in (100_000, 0):
            with pytest.raises(ValueError) as ei:
                nema_match(*bad_args, local_threshold=lt)
            msgs.append(str(ei.value))
        assert msgs[0] == msgs[1], msgs


def test_nema_local_path_validates(spark):
    from fornax_spark.operators.nema import nema_match

    qdf = spark.createDataFrame(QEDGES, "start long, end long")
    tdf = spark.createDataFrame(TEDGES, "start long, end long")
    bad = spark.createDataFrame(
        [(1, 11, 1.5)], "v long, u long, weight double"
    )
    with pytest.raises(ValueError, match="invalid ingest rows"):
        nema_match(qdf, tdf, bad)
    loops = spark.createDataFrame([(5, 5)], "start long, end long")
    with pytest.raises(ValueError, match="invalid ingest rows"):
        nema_match(
            loops, tdf,
            spark.createDataFrame([(5, 11, 0.5)], "v long, u long, weight double"),
        )
