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
) -> NemaResult:
    """Iterative NeMa cost refinement.

    query_edges/target_edges: (start, end); matches: (v, u, weight) the
    user-supplied label-similarity candidates (weights in (0,1]) — the
    engine never computes label similarity itself, preserving the
    reference's contract (/root/reference/docs/api.rst:63-66).

    validate=True raises on malformed input (self-loop edges, weights
    outside (0, 1], nulls) before any refinement work, mirroring the
    reference's handle-level IntegrityErrors (api.py:515-543, 753-798).
    """
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
