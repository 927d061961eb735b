"""Shared graph preprocessing for the graph-operator family
(pagerank / triangles / kcore): one canonical definition of the
undirected distinct edge set and of node degrees, so the operators —
and their CTE-replaying oracles — can never diverge on edge semantics
(self-loop handling, direction collapsing, dedup)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def und_edges(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Distinct undirected edges as (a, b) with a < b; self-loops
    dropped. Narrow (id, id) rows — the wire format every downstream
    graph stage keeps."""
    return (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )


def degrees(und: DataFrame) -> DataFrame:
    """(n, deg) over an ``und_edges`` frame — each endpoint counts its
    incident edges; map-side partial aggregation applies."""
    return (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )


def label_propagation(
    edges: DataFrame,
    rounds: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007), made deterministic: every node starts labeled with
    itself; each round it adopts the most frequent label among its
    neighbors, ties broken by the SMALLEST label; fixed ``rounds``
    (communities stabilize in a few rounds on modular graphs, and a
    fixed count keeps the result a pure function of the input).

    Where ``connected_components`` answers "who is reachable", LPA
    answers "who is densely together" — two cliques joined by one
    bridge edge are ONE component but TWO communities.

    Scale shape: each round is one edge⋈label join + one (node, label)
    count + one argmax-by-struct-min aggregate — ids and counts on the
    wire, state one row per node, localCheckpoint per round (flat
    lineage, the components/kcore hygiene).

    Output: (node, community) — community = the shared label.
    """
    und = und_edges(edges, src_col, dst_col)
    both = und.unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = both.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        votes = (
            both.join(
                labels.select(
                    F.col("node").alias("b"), F.col("label")
                ),
                "b",
            )
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        nxt = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("label").alias("l"),
                    )
                ).alias("w")
            )
            .select("node", F.col("w.l").alias("label"))
            .localCheckpoint(eager=True)
        )
        labels.unpersist()
        labels = nxt
    out = labels.select("node", F.col("label").alias("community"))
    both.unpersist()
    return out
