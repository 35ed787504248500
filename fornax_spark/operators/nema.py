"""NeMa-style iterative fuzzy subgraph matching as DataFrame operators.

This is the Spark-first re-expression of the reference's analytic core
(SURVEY.md §2.3, /root/reference/fornax/opt.py): candidate matches are
refined by iterating a neighborhood-consistency cost until the optimal
assignment stabilizes. The composition demonstrates every vectorized
operator the reference implements in NumPy, as native Spark ops:

  V1  proximity kernel            -> functions.proximity (column expr)
  V2  positive-difference         -> functions.delta_plus
  V7  similarity -> cost          -> 1 - weight
  V8  beta normalizer per v       -> groupBy(v).sum(prox) + broadcast join
  V9  neighborhood matching cost  -> column exprs over the outer join
  V10 per-(v,u,vv) arg-min / beta -> F.min(struct(cost, uu)) group arg-min
  V11 inference cost (mean+label) -> groupBy(v,u) agg
  V12 optimal match per v         -> window row_number == 1
  V13 iterative refinement        -> driver loop, persist per iteration
  V14 convergence (90% stable)    -> join prev vs cur optimal, ratio
  V15 cost normalization          -> cost / iters
  V20 memoized dict lookup        -> left join + coalesce(default)

Cost model (documented here, validated against the bundled numpy oracle
in tests/test_nema.py; the structure follows the NeMa paper's published
recipe — proximity-weighted neighborhood agreement plus label cost —
with this module's exact formulas as the specification):

  P(d)             = alpha^d if d <= h else 0
  nb(v,u,vv,uu)    = (1-lam) * max(P(dist_v) - P(dist_u~), 0)
                     + lam * (1 - w(vv,uu) + prev_cost(vv,uu))
                     where missing uu => P(dist_u~) = 0, w = 0,
                     prev_cost = 0
  partial(v,u,vv)  = min over uu of nb   (ties: smallest uu)
  inference(v,u)   = (1 - w(v,u)) + sum(partial)/count(partial) / beta(v)
  optimal(v)       = argmin_u inference  (ties: smallest u)
  iterate until > `stable_frac` of optimal matches unchanged or
  max_iters; final costs divided by the iteration count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import delta_plus, proximity
from .graph import hhop_neighbours, match_neighbourhood_join, undirect_edges


@dataclass
class NemaResult:
    inference_costs: DataFrame  # (v, u, cost)
    optimal_match: DataFrame  # (v, u, cost)
    iters: int
    # lowest-final-cost neighbour (vv, uu) per (v, u, vv) — the greedy
    # refiner's transition table (reference fornax/opt.py:431-507)
    neighbour_argmins: DataFrame | None = None  # (v, u, vv, uu)
    # populated by the in-process fast path only: the same results as
    # driver-side structures, letting the (inherently driver-side)
    # greedy enumeration skip the DataFrame round-trip
    local_costs: dict | None = None  # {(v, u): cost}
    local_argmins: list | None = None  # [(v, u, vv, uu)]


def _bfs_within(edges: list[tuple[int, int]], h: int) -> dict[int, dict[int, int]]:
    """(node -> neighbour -> hop distance <= h), undirected, self dist 0 —
    the in-process mirror of graph.hhop_neighbours."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: dict[int, dict[int, int]] = {}
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


def _nema_local(
    qedges: list[tuple[int, int]],
    tedges: list[tuple[int, int]],
    matches: list[tuple[int, int, float]],
    h: int,
    alpha: float,
    lam: float,
    max_iters: int,
    stable_frac: float,
):
    """In-process kernel: the SAME cost recipe (same formulas, same
    tie-breaks, same convergence rule as the DataFrame path above) on
    driver-side dicts. The distributed expression pays ~40 scheduled
    Spark jobs for the iterative loop — right at real candidate volumes,
    3 orders of magnitude of pure scheduling overhead at tutorial scale
    (the reference runs the same workload in-memory in ~74 ms). One
    recipe, two executors; `nema_match` dispatches by input size.

    Returns (final_costs {(v,u): cost}, optimal {v: (u, cost)}, iters,
    argmins [(v, u, vv, uu)]).
    """
    qn = _bfs_within(qedges, h)
    tn = _bfs_within(tedges, h)
    by_vv: dict[int, list[tuple[int, float]]] = {}
    for v, u, w in matches:
        by_vv.setdefault(v, []).append((u, w))

    def prox(d: int) -> float:
        return alpha ** d if d <= h else 0.0

    beta: dict[int, float] = {}
    for v in {m[0] for m in matches}:
        nbrs = {vv: d for vv, d in qn.get(v, {}).items() if vv != v}
        if nbrs:
            beta[v] = sum(prox(nbrs[vv]) for vv in sorted(nbrs))

    prev_costs: dict[tuple[int, int], float] = {}
    prev_opt: set[tuple[int, int]] | None = None
    iters = 0
    for it in range(max_iters):
        iters = it + 1
        inference: dict[tuple[int, int], float] = {}
        for v, u, w in matches:
            nbrs = {vv: d for vv, d in qn.get(v, {}).items() if vv != v}
            if not nbrs:
                continue
            partials = []
            for vv in sorted(nbrs):
                dv = nbrs[vv]
                cands = []
                for uu, w_n in by_vv.get(vv, []):
                    du = tn.get(u, {}).get(uu)
                    if du is None:
                        continue
                    pc = prev_costs.get((vv, uu), 0.0)
                    cands.append(
                        (1 - lam) * max(prox(dv) - prox(du), 0.0)
                        + lam * (1.0 - w_n + pc)
                    )
                if cands:
                    partials.append(min(cands))
                else:  # the left-outer NULL row: prox_u = w_n = pc = 0
                    partials.append(
                        (1 - lam) * max(prox(dv) - 0.0, 0.0) + lam * 1.0
                    )
            inference[(v, u)] = (1.0 - w) + (
                sum(partials) / len(partials)
            ) / beta.get(v, 1.0)
        cur_opt_map: dict[int, tuple[float, int]] = {}
        for (v, u), c in inference.items():
            if v not in cur_opt_map or (c, u) < cur_opt_map[v]:
                cur_opt_map[v] = (c, u)
        cur = {(v, cu[1]) for v, cu in cur_opt_map.items()}
        converged = (
            prev_opt is not None
            and len(prev_opt) > 0
            and len(prev_opt & cur) / len(prev_opt) > stable_frac
        )
        prev_opt = cur
        prev_costs = inference
        if converged:
            break

    # greedy-refiner transition table on the final UN-normalized costs;
    # missing (vv, uu) defaults to the last 0-based pass index, ties
    # break toward the smallest uu (sentinel rows never survive: a
    # candidate-less (v, u, vv) group has only the uu=-1 row)
    argmins: list[tuple[int, int, int, int]] = []
    for v, u, _w in matches:
        nbrs = {vv: d for vv, d in qn.get(v, {}).items() if vv != v}
        for vv in sorted(nbrs):
            dv = nbrs[vv]
            cands = []
            for uu, w_n in by_vv.get(vv, []):
                du = tn.get(u, {}).get(uu)
                if du is None:
                    continue
                pc = prev_costs.get((vv, uu), float(iters - 1))
                cands.append(
                    (
                        (1 - lam) * max(prox(dv) - prox(du), 0.0)
                        + lam * (1.0 - w_n + pc),
                        uu,
                    )
                )
            if cands:
                argmins.append((v, u, vv, min(cands)[1]))

    final = {k: c / float(iters) for k, c in prev_costs.items()}
    optimal: dict[int, tuple[int, float]] = {}
    for (v, u), c in final.items():
        if v not in optimal or (c, u) < (optimal[v][1], optimal[v][0]):
            optimal[v] = (u, c)
    return final, optimal, iters, argmins


def _nema_match_local_df(
    spark, local_rows, h, alpha, lam, max_iters, stable_frac, validate
) -> NemaResult:
    """Small-input executor for nema_match: validate the collected rows
    in-process (same rules and error shape as operators/validate), run
    `_nema_local`, and wrap the results in the usual NemaResult
    DataFrames so every downstream consumer (enumerate_subgraphs,
    node_link_graphs, the driver entry) is agnostic to the dispatch."""
    qe_rows, te_rows, m_rows = local_rows
    if validate:
        # one validation contract for both dispatch paths: the driver-side
        # twin of operators/validate.check_or_raise (same reasons, same
        # reject JSON, same ValueError) — callers catch one error shape
        # regardless of input size (see test_nema_dispatch_same_errors)
        from .validate import check_rows_or_raise

        check_rows_or_raise(qe_rows, te_rows, m_rows)

    final, optimal, iters, argmins = _nema_local(
        [(int(r["start"]), int(r["end"])) for r in qe_rows],
        [(int(r["start"]), int(r["end"])) for r in te_rows],
        [(int(r["v"]), int(r["u"]), float(r["weight"])) for r in m_rows],
        h, alpha, lam, max_iters, stable_frac,
    )
    inf_df = spark.createDataFrame(
        [(v, u, c) for (v, u), c in sorted(final.items())],
        "v long, u long, cost double",
    )
    opt_df = spark.createDataFrame(
        [(v, u, c) for v, (u, c) in sorted(optimal.items())],
        "v long, u long, cost double",
    )
    arg_df = spark.createDataFrame(
        sorted(argmins), "v long, u long, vv long, uu long"
    )
    return NemaResult(
        inference_costs=inf_df,
        optimal_match=opt_df,
        iters=iters,
        neighbour_argmins=arg_df,
        local_costs=final,
        local_argmins=sorted(argmins),
    )


def nema_match_rows(
    spark,
    query_edges: list[tuple[int, int]],
    target_edges: list[tuple[int, int]],
    matches: list[tuple[int, int, float]],
    h: int = 2,
    alpha: float = 0.3,
    lam: float = 0.3,
    max_iters: int = 10,
    stable_frac: float = 0.9,
    validate: bool = True,
) -> NemaResult:
    """nema_match over plain Python rows: callers that already hold the
    (tutorial-scale) inputs driver-side skip the DataFrame round-trip
    AND the size-probe collects — same kernel, same validation, same
    NemaResult."""
    qe = [{"start": a, "end": b} for a, b in query_edges]
    te = [{"start": a, "end": b} for a, b in target_edges]
    m = [{"v": v, "u": u, "weight": w} for v, u, w in matches]
    return _nema_match_local_df(
        spark, (qe, te, m), h, alpha, lam, max_iters, stable_frac, validate
    )


def _optimal(inference: DataFrame) -> DataFrame:
    w = Window.partitionBy("v").orderBy(F.col("cost").asc(), F.col("u").asc())
    return (
        inference.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("v", "u", "cost")
    )


def nema_match(
    query_edges: DataFrame,
    target_edges: DataFrame,
    matches: DataFrame,
    h: int = 2,
    alpha: float = 0.3,
    lam: float = 0.3,
    max_iters: int = 10,
    stable_frac: float = 0.9,
    validate: bool = True,
    local_threshold: int = 100_000,
) -> NemaResult:
    """Iterative NeMa cost refinement.

    query_edges/target_edges: (start, end); matches: (v, u, weight) the
    user-supplied label-similarity candidates (weights in (0,1]) — the
    engine never computes label similarity itself, preserving the
    reference's contract (/root/reference/docs/api.rst:63-66).

    validate=True raises on malformed input (self-loop edges, weights
    outside (0, 1], nulls) before any refinement work, mirroring the
    reference's handle-level IntegrityErrors (api.py:515-543, 753-798).

    Size dispatch: when every input fits under `local_threshold` rows,
    the identical recipe runs in-process (`_nema_local`) — the
    distributed loop costs ~40 scheduled jobs that dwarf tutorial-scale
    inputs, while candidate tables at real volumes take the DataFrame
    path unchanged. 0 disables the fast path. The probe is a
    limit(threshold+1) collect, not a count — bounded driver transfer.
    """
    local_rows = None
    if local_threshold:
        cap = local_threshold + 1
        qe = query_edges.select("start", "end").limit(cap).collect()
        if len(qe) < cap:
            te = target_edges.select("start", "end").limit(cap).collect()
            if len(te) < cap:
                m = matches.select("v", "u", "weight").limit(cap).collect()
                if len(m) < cap:
                    local_rows = (qe, te, m)
    if local_rows is not None:
        return _nema_match_local_df(
            matches.sparkSession, local_rows, h, alpha, lam, max_iters,
            stable_frac, validate,
        )
    if validate:
        from .validate import check_or_raise, validate_edges, validate_matches

        check_or_raise(
            validate_edges(query_edges),
            validate_edges(target_edges),
            validate_matches(matches),
        )
    qh = hhop_neighbours(undirect_edges(query_edges), h)
    th = hhop_neighbours(undirect_edges(target_edges), h)
    nb = match_neighbourhood_join(matches, qh, th).persist()
    nb.count()  # materialize so the hop caches can be dropped
    qh.unpersist()
    th.unpersist()

    # V8: beta(v) = sum of proximities of v's h-hop neighbourhood
    beta = (
        nb.select("v", "vv", "dist_v")
        .distinct()
        .groupBy("v")
        .agg(F.sum(proximity(F.col("dist_v"), h, alpha)).alias("beta"))
    )

    prox_v = proximity(F.col("dist_v"), h, alpha)
    prox_u = F.coalesce(
        proximity(F.col("dist_u"), h, alpha), F.lit(0.0)
    )
    w_n = F.coalesce(F.col("w_n"), F.lit(0.0))

    prev_costs: DataFrame | None = None  # (vv, uu, prev_cost)
    prev_opt: DataFrame | None = None
    inference: DataFrame | None = None
    iters = 0

    for it in range(max_iters):
        iters = it + 1
        if prev_costs is None:
            step = nb.withColumn("prev_cost", F.lit(0.0))
        else:
            pc = prev_costs.select(
                F.col("v").alias("vv"),
                F.col("u").alias("uu"),
                F.col("cost").alias("prev_cost_raw"),
            )
            step = nb.join(pc, ["vv", "uu"], "left").withColumn(
                "prev_cost", F.coalesce(F.col("prev_cost_raw"), F.lit(0.0))
            )
        # V9 neighborhood cost
        step = step.withColumn(
            "nb_cost",
            (1 - lam) * delta_plus(prox_v, prox_u)
            + lam * (F.lit(1.0) - w_n + F.col("prev_cost")),
        )
        # V10 arg-min per (v, u, vv), deterministic tie-break by uu
        partial = step.groupBy("v", "u", "vv", "weight").agg(
            F.min(F.struct(F.col("nb_cost"), F.col("uu"))).alias("m")
        )
        # V11 inference = label cost + normalized mean of partial costs
        inference = (
            partial.groupBy("v", "u", "weight")
            .agg(
                F.sum(F.col("m.nb_cost")).alias("s"),
                F.count(F.lit(1)).alias("c"),
            )
            .join(F.broadcast(beta), "v", "left")
            .select(
                "v",
                "u",
                (
                    (F.lit(1.0) - F.col("weight"))
                    + (F.col("s") / F.col("c"))
                    / F.coalesce(F.col("beta"), F.lit(1.0))
                ).alias("cost"),
            )
            .persist()
        )
        opt = _optimal(inference).persist()

        # ONE materializing action per iteration (iterative driver loops
        # pay per-action scheduling, not per-row, at this stage): the
        # convergence stats scan opt -> inference, filling both caches.
        converged = False
        if prev_opt is not None:
            row = (
                prev_opt.select("v", "u")
                .withColumn("p", F.lit(1))
                .join(
                    opt.select("v", "u").withColumn("c", F.lit(1)),
                    ["v", "u"],
                    "full",
                )
                .agg(
                    F.sum("p").alias("total"),
                    F.count(F.when(F.col("p").isNotNull()
                                   & F.col("c").isNotNull(), 1)).alias("same"),
                )
                .collect()[0]
            )
            total, same = int(row["total"] or 0), int(row["same"])
            converged = bool(total) and same / total > stable_frac
            prev_opt.unpersist()
        else:
            opt.count()
        if prev_costs is not None:
            prev_costs.unpersist()  # superseded iteration's cache
        prev_opt = opt
        prev_costs = inference
        if converged:
            break

    # Greedy-refiner transition table (reference opt.py:431-487,694-696):
    # fold the FINAL (un-normalized) inference costs back into the
    # neighbourhood costs — a missing (vv, uu) defaults to the last
    # 0-based pass index, mirroring the reference's dict default — and
    # keep the lowest-cost uu per (v, u, vv). Ties break toward the
    # smallest uu with the missing-neighbour sentinel (-1, V6) first;
    # sentinel and self-transition rows are then dropped
    # (reference valid_neighbours, opt.py:489-507).
    pc_final = prev_costs.select(
        F.col("v").alias("vv"),
        F.col("u").alias("uu"),
        F.col("cost").alias("pc_raw"),
    )
    stepf = nb.join(pc_final, ["vv", "uu"], "left").withColumn(
        "prev_cost", F.coalesce(F.col("pc_raw"), F.lit(float(iters - 1)))
    )
    neighbour_argmins = (
        stepf.withColumn(
            "nb_cost",
            (1 - lam) * delta_plus(prox_v, prox_u)
            + lam * (F.lit(1.0) - w_n + F.col("prev_cost")),
        )
        .withColumn("uu_s", F.coalesce(F.col("uu"), F.lit(-1)))
        .groupBy("v", "u", "vv")
        .agg(F.min(F.struct(F.col("nb_cost"), F.col("uu_s"))).alias("m"))
        .select("v", "u", "vv", F.col("m.uu_s").alias("uu"))
        .filter(F.col("uu") >= 0)
        .persist()
    )
    neighbour_argmins.count()
    nb.unpersist()
    if prev_opt is not None:
        prev_opt.unpersist()
    # V15: normalize by iteration count
    final_costs = prev_costs.select(
        "v", "u", (F.col("cost") / F.lit(float(iters))).alias("cost")
    )
    return NemaResult(
        inference_costs=final_costs,
        optimal_match=_optimal(final_costs),
        iters=iters,
        neighbour_argmins=neighbour_argmins,
    )
