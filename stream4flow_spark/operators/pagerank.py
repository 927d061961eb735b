"""Fixed-iteration PageRank over an edge DataFrame.

The graph-centrality sibling of the Pregel min-label components in
``llmdata/dedup.py``: "which hosts matter" is the next question a
network analyst asks after "which hosts talk" (top_n_host_stats) and
"which hosts talk to each other" (the biflow join) — and the same
shape ranks documents in a near-dup/citation graph on the LLM side.

Deliberately FIXED-iteration (power iteration, k rounds) rather than
convergence-tested: the plan is k statically-composed join+aggregate
rounds Catalyst sees whole, the cost is predictable (k × two
exchanges), and the result is a pure function of the input — which is
what lets the DuckDB oracle replay the exact arithmetic CTE-for-CTE
and hash-match. Simplified dangling-node treatment (their mass is
dropped, the standard simplification): deterministic, and rank ORDER —
the thing consumers use — is unaffected for the usual "who are the
hubs" question.

Scale shape: state per round is one (node, rank) row per node;
contributions shuffle keyed by dst — k rounds × O(edges) exchange of
8-byte ranks, never payloads. Node/edge frames are cached once; at
billions of edges this is the textbook iterative-join PageRank every
Spark deployment runs (GraphX's Pregel does the same exchanges), with
AQE free to pick broadcast vs shuffle per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    out_col: str = "pagerank",
) -> DataFrame:
    """Rank nodes of the DISTINCT directed graph in ``edges``.

    Returns (node, ``out_col``) for every node appearing as src or dst.
    Deterministic: same edges → bit-identical ranks on any
    partitioning (per-node contribution sums are the only float
    reductions; verify with a rounded compare across engines).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    e_deg = e.join(outdeg, "src").persist()
    nodes = nodes.persist()

    n = nodes.count()  # scalar: the teleport term needs |V|
    if n == 0:
        # an all-null/empty edge slice has no graph — return the empty
        # (node, out_col) frame instead of tripping 1.0/0 below
        e_deg.unpersist()
        nodes.unpersist()
        return nodes.withColumn(out_col, F.lit(0.0))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn(out_col, F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (
            e_deg.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .select(
                F.col("dst").alias("node"),
                (F.col(out_col) / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
            ).alias(out_col),
        )
    # same hygiene as the components Pregel loop (llmdata/dedup.py):
    # truncate lineage off the cached edge/node frames, then release
    # them — otherwise every call leaks two cached frames into a
    # long-lived session
    ranks = ranks.localCheckpoint(eager=True)
    e_deg.unpersist()
    nodes.unpersist()
    return ranks
