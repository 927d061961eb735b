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
    seeds: DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Rank nodes of the DISTINCT directed graph in ``edges``.

    Returns (node, ``out_col``) for every node appearing as src or dst.
    Deterministic: same edges → bit-identical ranks on any
    partitioning (per-node contribution sums are the only float
    reductions; verify with a rounded compare across engines).

    ``seeds``: PERSONALIZED PageRank — a one-column (node) DataFrame of
    teleport targets. The (1−d) restart mass goes only to the seeds
    (uniformly) instead of every node, so ranks answer "which nodes
    matter *relative to this seed set*": similar hosts to a victim set,
    documents related to a query set in the citation/near-dup graph.
    The iteration arithmetic is otherwise identical; with
    ``seeds=None`` (default) the result is exactly standard PageRank
    (unit-tested equivalence against seeds=all-nodes).

    ``weight_col``: EDGE-WEIGHTED PageRank — each node's rank flows to
    its successors proportionally to edge weight instead of uniformly
    (duplicate (src, dst) rows pre-sum their weights). In a flow graph,
    weighting by bytes/packets ranks hosts by traffic importance, not
    edge count. Unweighted is the weight≡1 special case (tested)."""
    if weight_col is None:
        e = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        ).distinct()
        outdeg = e.groupBy("src").agg(
            F.count("*").cast("double").alias("deg")
        )
    else:
        e = (
            edges.groupBy(
                F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
            )
            .agg(F.sum(F.col(weight_col)).cast("double").alias("__w"))
            .filter(F.col("__w") > 0)
        )
        outdeg = e.groupBy("src").agg(F.sum("__w").alias("deg"))
    # both endpoints from ONE pass over e (explode, not a two-branch
    # union) so the node-cache materialization never re-derives the
    # upstream edge pipeline per branch
    nodes = (
        e.select(F.explode(F.array("src", "dst")).alias("node"))
        .distinct()
    )
    e_deg = e.join(outdeg, "src").persist()
    nodes = nodes.persist()

    n = nodes.count()  # scalar: the teleport term needs |V|
    if n == 0:
        # an all-null/empty edge slice has no graph — return the empty
        # (node, out_col) frame instead of tripping 1.0/0 below
        e_deg.unpersist()
        nodes.unpersist()
        return nodes.withColumn(out_col, F.lit(0.0))
    if seeds is None:
        is_seed = F.lit(True)
        n_seeds = n
    else:
        # seed membership as a broadcastable flag column — the seed set
        # is bounded (a victim list / query docs), ids only on the wire
        seed_ids = seeds.select(
            F.col(seeds.columns[0]).alias("node")
        ).distinct()
        seed_flags = seed_ids.withColumn("__s", F.lit(True))
        flagged = (
            nodes.join(F.broadcast(seed_flags), "node", "left")
            .select("node", F.coalesce("__s", F.lit(False)).alias("__s"))
            .localCheckpoint(eager=True)
        )
        # count seeds AFTER intersecting with the node set: a seed
        # absent from the edge graph receives no rank row, so counting
        # it would silently shrink total restart mass below (1-damping)
        # and deflate every rank
        n_seeds = flagged.filter(F.col("__s")).count()
        if n_seeds == 0:
            e_deg.unpersist()
            nodes.unpersist()
            raise ValueError(
                "personalized pagerank needs >=1 seed node present in "
                "the edge graph"
            )
        nodes.unpersist()  # superseded by the flagged frame
        nodes = flagged
        is_seed = F.col("__s")
    base = (1.0 - damping) / n_seeds
    ranks = nodes.withColumn(
        out_col,
        F.when(is_seed, F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0)),
    ).select("node", out_col)
    share = (
        F.lit(1.0) if weight_col is None else F.col("__w")
    )  # fraction numerator: uniform vs weight-proportional
    # r14 (guide §2.4): the per-iteration rank refresh used to be a
    # second join (nodes LEFT JOIN contrib) after the contribution
    # aggregate; instead each node's row rides INTO the aggregate as a
    # null-contribution union branch carrying its seed flag, so one
    # join + one exchange per iteration disappear. The arithmetic is
    # unchanged bit for bit: in_mass still sums exactly the per-edge
    # rank*share/deg terms (the union row's NULL is ignored by sum),
    # and base + damping * in_mass is applied after the aggregate —
    # the same expression shape the DuckDB oracle replays.
    for _ in range(iterations):
        contrib = e_deg.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            (F.col(out_col) * share / F.col("deg")).alias("c"),
            F.lit(None).cast("boolean").alias("__seed"),
        )
        present = nodes.select(
            "node",
            F.lit(None).cast("double").alias("c"),
            is_seed.alias("__seed"),
        )
        ranks = (
            contrib.unionByName(present)
            .groupBy("node")
            .agg(
                F.sum("c").alias("in_mass"),
                F.max("__seed").alias("__s_any"),
            )
            .select(
                "node",
                (
                    F.when(F.col("__s_any"), F.lit(base)).otherwise(F.lit(0.0))
                    + F.lit(damping)
                    * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias(out_col),
            )
        )
    # same hygiene as the components Pregel loop (llmdata/dedup.py):
    # truncate lineage off the cached edge/node frames, then release
    # them — otherwise every call leaks two cached frames into a
    # long-lived session
    ranks = ranks.localCheckpoint(eager=True)
    e_deg.unpersist()
    nodes.unpersist()
    return ranks
