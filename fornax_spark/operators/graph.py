"""Graph operators: the reference's relational graph algebra re-expressed
as DataFrame ops (SURVEY.md §2.2 R5-R10).

The reference stores undirected graphs as doubled directed edges
(/root/reference/fornax/api.py:472-486) and expands h-hop
neighborhoods with a recursive UNION query
(/root/reference/fornax/select.py:49-72). Spark has no recursive CTE;
the idiomatic equivalent is a driver-side loop of frontier joins with
a group-min distance — persisted per iteration, exactly the pattern
the reference's own NumPy fixed-point loop uses driver-side
(/root/reference/fornax/opt.py:655-691).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirect_edges(edges: DataFrame, start: str = "start", end: str = "end") -> DataFrame:
    """Materialize both directions + drop self-loops (reference
    api.py:472-486, 537-542)."""
    fwd = edges.select(F.col(start).alias("start"), F.col(end).alias("end"))
    rev = edges.select(F.col(end).alias("start"), F.col(start).alias("end"))
    return fwd.unionByName(rev).filter(F.col("start") != F.col("end")).distinct()


def hhop_neighbours(edges: DataFrame, h: int) -> DataFrame:
    """All (node, neighbour, distance) pairs with distance <= h, distance
    = shortest hop count, including distance 0 self rows (reference
    select.py:8-46 seeds distance-0 rows, then recursive UNION + MIN).

    Driver loop: frontier(i) = frontier(i-1) ⋈ edges; acc = UNION of all
    frontiers; final groupBy(node, neighbour).min(distance). Each
    iteration is one shuffle on the join key; frontier persisted.
    """
    e = edges.select(
        F.col("start").alias("e_start"), F.col("end").alias("e_end")
    )
    nodes = (
        e.select(F.col("e_start").alias("node"))
        .union(e.select(F.col("e_end").alias("node")))
        .distinct()
    )
    acc = nodes.select(
        F.col("node"), F.col("node").alias("neighbour"), F.lit(0).alias("distance")
    )
    frontier = acc.select("node", "neighbour")
    frontiers = []
    for dist in range(1, h + 1):
        frontier = (
            frontier.join(e, frontier["neighbour"] == e["e_start"], "inner")
            .select("node", F.col("e_end").alias("neighbour"))
            .distinct()
        ).persist()
        frontiers.append(frontier)
        acc = acc.unionByName(frontier.withColumn("distance", F.lit(dist)))
    out = acc.groupBy("node", "neighbour").agg(
        F.min("distance").alias("distance")
    ).persist()
    out.count()  # materialize, then free the per-hop frontier caches
    for f in frontiers:
        f.unpersist()
    return out


def match_neighbourhood_join(
    matches: DataFrame, query_hops: DataFrame, target_hops: DataFrame
) -> DataFrame:
    """The reference's central outer join (select.py:75-131): pair each
    match (v,u) with every query-side neighbour vv of v and the
    target-side matched neighbour uu of u when one exists (LEFT OUTER —
    missing correspondences surface as NULL uu).

    matches: (v, u, weight); query_hops/target_hops: output of
    hhop_neighbours over the query/target graphs.
    """
    qn = query_hops.select(
        F.col("node").alias("v"),
        F.col("neighbour").alias("vv"),
        F.col("distance").alias("dist_v"),
    )
    tn = target_hops.select(
        F.col("node").alias("u"),
        F.col("neighbour").alias("uu"),
        F.col("distance").alias("dist_u"),
    )
    # neighbour matches: does some match pair (vv, uu) exist?
    nm = matches.select(
        F.col("v").alias("vv"), F.col("u").alias("uu"), F.col("weight").alias("w_n")
    )
    left = matches.join(qn, "v", "inner").filter(F.col("vv") != F.col("v"))
    right = nm.join(tn, "uu", "inner")
    return left.join(
        right,
        (left["vv"] == right["vv"]) & (left["u"] == right["u"]),
        "left",
    ).select(
        left["v"],
        left["u"],
        left["vv"],
        right["uu"],
        left["dist_v"],
        right["dist_u"],
        left["weight"],
        right["w_n"],
    )
