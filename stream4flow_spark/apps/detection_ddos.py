"""detection_ddos — packet-rate anomaly vs a long-horizon baseline.

Spark-first re-expression of reference
``applications/detection/ddos/spark/detection_ddos.py``: the reference
kept a 30 s activity window and a 7200 s baseline window over the same
DStream and joined them per victim (:122-152, W3/J3), flagging victims
whose incoming packet rate exceeds ratio × baseline with a packet floor
(:155-163, F10), and collecting the attacker-IP set (:126-141, A13).

Batch shape: per-victim per-window packet sums, a per-victim baseline =
mean windowed packet sum over the whole horizon (two-level aggregate),
then a window ⋈ baseline join. In streaming the baseline side becomes a
compacted aggregate table refreshed per batch via ``foreachBatch``
(SURVEY §7.2) — NOT a 2-hour sliding state window.

The attacker set is emitted as a sorted comma-joined string so results
are deterministic and hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.functions.net import ip_coalesce
from stream4flow_spark.operators.window_agg import with_window_start_ms


def detection_ddos(
    flows: DataFrame,
    window_duration: str = "30 seconds",
    min_ratio: float = 50.0,
    min_packets: int = 100_000,
) -> DataFrame:
    """Output: window_start_ms, dst_ip, packets, baseline (double),
    ratio (double), attackers (sorted ','-joined), attacker_count."""
    src = ip_coalesce(F.col(S.SRC_IP4), F.col(S.SRC_IP6))
    dst = ip_coalesce(F.col(S.DST_IP4), F.col(S.DST_IP6))

    windowed = (
        with_window_start_ms(
            flows.filter(
                F.col(S.PACKETS).isNotNull() & F.col(S.DST_IP4).isNotNull()
            ),
            S.T_START,
            window_duration,
        )
        .select(
            "window_start_ms",
            src.alias("src_ip"),
            dst.alias("dst_ip"),
            F.col(S.PACKETS).alias("packets"),
        )
        .groupBy("window_start_ms", "dst_ip")
        .agg(
            F.sum("packets").alias("packets"),
            # A13 attacker set (emitted deterministically); the distinct
            # count comes from the set itself — a separate countDistinct
            # would add an Expand (row-doubling) dedup pass to the shuffle
            F.sort_array(F.collect_set("src_ip")).alias("attacker_set"),
        )
        .select(
            "window_start_ms",
            "dst_ip",
            "packets",
            F.concat_ws(",", "attacker_set").alias("attackers"),
            F.size("attacker_set").cast("long").alias("attacker_count"),
        )
    )

    # W3/J3 — long-horizon baseline per victim: mean of its windowed sums.
    # An analytic avg over the dst_ip partition replaces the reference's
    # second windowed agg + per-victim join (:144-152): the windowed
    # subtree is scanned ONCE (no recompute / no join shuffle), and the
    # only added exchange is the hash partition by dst_ip.
    from pyspark.sql import Window as W

    baseline = F.avg(F.col("packets").cast("double")).over(
        W.partitionBy("dst_ip")
    )

    return (
        windowed.withColumn("baseline", baseline)
        .withColumn("ratio", F.col("packets").cast("double") / F.col("baseline"))
        # F10 thresholds (reference :155-163)
        .filter((F.col("ratio") > min_ratio) & (F.col("packets") >= min_packets))
        .select(
            "window_start_ms",
            "dst_ip",
            "packets",
            "baseline",
            "ratio",
            "attackers",
            "attacker_count",
        )
    )
