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
