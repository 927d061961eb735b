"""k-core decomposition by iterative peeling.

The k-core is the maximal subgraph where every node keeps degree ≥ k —
the standard "dense backbone" extractor: in flow graphs it separates
infrastructure meshes from scan/leaf noise (a scanner with 10⁶ edges to
degree-1 victims peels out in round 1); in near-dup/citation graphs it
finds template clusters that pairwise thresholds miss.

Peeling is the textbook algorithm: drop every node with degree < k,
recompute degrees, repeat. Each round is ONE degree aggregate + two
semi-joins on (id, id) edges — no payloads, no driver data. Rounds
needed = peel depth, typically small; like connected_components the
loop carries only a changed-count to the driver and localCheckpoints
round state so lineage stays flat.

``fixed_rounds`` mode runs exactly R rounds with NO driver-side state
(one statically-composed plan) — the same device host_pagerank uses to
make an iterative pipeline oracle-replayable CTE-for-CTE: a DuckDB
query chains the identical R rounds and the driver hash-compares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark.operators.graph import degrees, und_edges


def _peel_once(e: DataFrame, k: int) -> DataFrame:
    keep = degrees(e).filter(F.col("deg") >= k).select("n")
    return (
        e.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
        .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
        .select("a", "b")
    )


def kcore(
    edges: DataFrame,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    fixed_rounds: int | None = None,
    max_rounds: int = 50,
) -> DataFrame:
    """(host, core_degree) for every node of the k-core (degree measured
    inside the surviving subgraph).

    ``fixed_rounds=R``: exactly R statically-composed peel rounds
    (oracle-replayable; pass R ≥ the graph's peel depth for the true
    core). Default: peel until no edge is removed, with localCheckpoint
    hygiene per round."""
    e = und_edges(edges, src_col, dst_col)
    if fixed_rounds is not None:
        # each round reads its edge frame 3× (degree union + two
        # semi-join probes), so a statically-composed chain re-derives
        # round i-1 three times per reference — 3^R scans of the base by
        # round R. Checkpointing every round keeps it linear; the result
        # is the identical deterministic arithmetic the oracle replays.
        e = e.localCheckpoint(eager=True)
        for _ in range(fixed_rounds):
            nxt = _peel_once(e, k).localCheckpoint(eager=True)
            e.unpersist()
            e = nxt
    else:
        e = e.localCheckpoint(eager=True)
        # the final frame stays checkpointed for the consumer. The
        # previous round's edge count is threaded through the loop (r15,
        # guide §1.2): re-counting the already-counted frame cost one
        # extra driver job per peel round for a value the last round
        # computed.
        n_prev = e.count()
        for _ in range(max_rounds):
            nxt = _peel_once(e, k).localCheckpoint(eager=True)
            n_now = nxt.count()
            e.unpersist()
            e = nxt
            if n_now == n_prev or n_now == 0:
                break
            n_prev = n_now
    return degrees(e).select(
        F.col("n").alias("host"), F.col("deg").alias("core_degree")
    )
