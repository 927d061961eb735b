"""Distributed triangle counting (degree-ordered orientation).

Triangles are the graph primitive behind clustering coefficients and
peer-group detection (a scanning host has many edges but few triangles;
a normal service cluster is triangle-dense), and on the curation side
they density-profile near-dup/citation graphs.

The naive three-way self-join explodes on hubs: a node of degree d
contributes d² wedge candidates. The published fix (compact-forward;
also Cohen's MapReduce variant, Suri & Vassilvitskii WWW'11) is to
orient every undirected edge from the LOWER endpoint to the HIGHER in
the total order (degree, id) and enumerate each triangle exactly once
from its lowest-order corner: out-degrees under this orientation are
bounded by O(sqrt(m)), so the wedge join is skew-bounded no matter how
large a hub the raw graph has. Everything is DataFrame joins on narrow
(id, id) pairs — Catalyst/AQE handle the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Distinct undirected edges oriented low→high by (degree, id).

    Output columns: u, v, du, dv (endpoint degrees carried along so the
    wedge stage can enforce the order without re-joining degrees)."""
    from stream4flow_spark.operators.graph import degrees, und_edges

    # und feeds the degree union (2 refs) AND the orientation join — an
    # uncached frame re-derives the whole upstream edge pipeline per
    # reference (the same multiplicative-rescan trap kcore documents)
    und = und_edges(edges, src_col, dst_col).localCheckpoint(eager=True)
    deg = degrees(und)
    withdeg = (
        und.join(deg.select(F.col("n").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("n").alias("b"), F.col("deg").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return withdeg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("da")).otherwise(F.col("db")).alias("du"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )


def _triangles_oriented(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Every triangle exactly once as (u, v, w) in ORIENTATION order
    (lowest-(degree,id) corner first) — the raw enumeration both public
    views share."""
    # o feeds both wedge legs and the closing semi-join (3 refs)
    o = _oriented(edges, src_col, dst_col).localCheckpoint(eager=True)
    # wedges at the lowest-order corner u: two out-edges u→v, u→w with
    # (dv,v) < (dw,w); the closing edge v→w is oriented v→w by
    # transitivity of the total order, so ONE semi-join closes it
    e1 = o.select(
        F.col("u"), F.col("v"), F.col("dv").alias("d1")
    )
    e2 = o.select(
        F.col("u"), F.col("v").alias("w"), F.col("dv").alias("d2")
    )
    wedges = e1.join(e2, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v") < F.col("w")))
    )
    closing = o.select(F.col("u").alias("v"), F.col("v").alias("w"))
    return wedges.join(closing, ["v", "w"], "left_semi").select(
        "u", "v", "w"
    )


def triangles(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Every triangle of the undirected graph exactly once: columns
    x, y, z with x < y < z (plain id order, engine-portable)."""
    tri = _triangles_oriented(edges, src_col, dst_col)
    # canonicalize corners to plain id order for a stable, oracle-
    # replayable output (the orientation order was an internal device)
    arr = F.array_sort(F.array("u", "v", "w"))
    return tri.select(
        arr[0].alias("x"), arr[1].alias("y"), arr[2].alias("z")
    )


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(host, n_triangles) for every node in at least one triangle.

    Counts corners straight off the oriented enumeration — corner
    membership doesn't care about order, so the canonicalizing
    array_sort pass over every triangle row is skipped."""
    tri = _triangles_oriented(edges, src_col, dst_col)
    # one explode, not a 3-way union: each union branch re-executes the
    # whole wedge join + closing semi-join over the checkpointed edge
    # frame (the r15 before-plan shows the BHJ pair THREE times), so the
    # most expensive join in the operator ran 3x per action. explode
    # enumerates the same three corners from ONE pass (guide §2.4 —
    # same device host_pagerank's node set uses since r14).
    corners = tri.select(
        F.explode(F.array("u", "v", "w")).alias("host")
    )
    return corners.groupBy("host").agg(F.count("*").alias("n_triangles"))


def clustering_coefficient(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(host, degree, n_triangles, coefficient): local clustering
    coefficient = 2·triangles / (deg·(deg−1)) — how close each node's
    neighborhood is to a clique (1.0 = clique member, 0 = star hub).
    The normalized form of triangle_count that makes hosts of different
    degrees comparable; nodes in no triangle get coefficient 0.
    One extra id-keyed left join of the (small) per-node triangle
    counts against the degree table."""
    from stream4flow_spark.operators.graph import degrees, und_edges

    und = und_edges(edges, src_col, dst_col).localCheckpoint(eager=True)
    deg = degrees(und)
    tri = triangle_count(und, "a", "b")
    return (
        deg.join(tri, deg["n"] == tri["host"], "left")
        .select(
            F.col("n").alias("host"),
            F.col("deg").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    2.0 * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("deg") * (F.col("deg") - 1)),
                    6,
                ),
            )
            .otherwise(0.0)
            .alias("coefficient"),
        )
    )


def triangle_count_sampled(
    edges: DataFrame,
    p: float,
    src_col: str = "src",
    dst_col: str = "dst",
    salt: str = "s4f-doulion",
) -> DataFrame:
    """DOULION (Tsourakakis et al., KDD'09) approximate GLOBAL triangle
    count: keep each undirected edge with probability ``p`` via a
    deterministic md5 coin on the canonical edge (engine/run/partition
    independent — same edges, same estimate), count triangles on the
    sparsified graph, scale by 1/p³ (each triangle survives with
    probability p³). Expected work drops by p² on the wedge join — the
    knob for when even the degree-oriented exact count is too much.

    Output: one row, ``n_triangles_est`` (double). Variance shrinks as
    p³·T grows; at p=1 this IS the exact count (tested)."""
    from stream4flow_spark.operators.graph import und_edges

    und = und_edges(edges, src_col, dst_col)
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("a"), F.lit("|"), F.col("b"), F.lit(salt))),
                1,
                4,
            ),
            16,
            10,
        ).cast("int")
        < int(p * 65536)
    )
    kept = und.filter(coin)
    tri = _triangles_oriented(kept, "a", "b")
    return tri.agg(
        (F.count("*") / F.lit(p**3)).alias("n_triangles_est")
    )
