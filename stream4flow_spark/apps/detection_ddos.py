"""detection_ddos — in/out packet-ratio anomaly vs a long-window baseline.

Spark-first re-expression of reference
``applications/detection/ddos/spark/detection_ddos.py``: per monitored
host (dst or src matching the ``network_filter`` regex, :113-118 F6), a
short window sums incoming packets (host as destination, with the
attacker-source set, :123-128 A13), and outgoing packets (host as
source, :131-134), merged by key (:137-141 J6). A long sliding window
(:144-148 W3) accumulates the same in/out sums over the trailing
``long_window``; a host alerts when its short in/out ratio exceeds the
long in/out ratio × ``min_ratio`` with an incoming-packet floor and
nonzero outgoing traffic (:154-163 F10/J3).

Batch shape: ONE scan — each flow explodes into its (incoming, outgoing)
monitored-host contributions, one groupBy forms the short windows, and
the long window is an analytic RANGE frame over each host's ordered
short windows (no second windowed aggregate, no self-join; the only
exchange is the hash partition by host). In streaming the per-window
partials become a ``foreachBatch``-compacted baseline table
(``streaming/ddos.py``, SURVEY §7.2) — NOT a 2-hour sliding state
window.

The attacker set is emitted as a sorted comma-joined string so results
are deterministic and hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.operators.window_agg import duration_to_ms, with_window_start_ms


def _monitored_contribs(network_filter: str) -> Column:
    """Per-flow array of (host, inc, out, attacker) contributions for
    monitored hosts — the incoming leg when the destination matches the
    network regex, the outgoing leg when the source does (reference
    :120-134). Null legs are filtered out inside the array, so one
    explode replaces the reference's two filtered streams + union."""
    # The reference applies the network filter with ``re.match`` — anchored
    # at the start — while ``rlike`` searches anywhere; "210.0.1.5" must
    # NOT match the default r"10\.0\..*". Wrap to pin the anchor.
    network_filter = f"^(?:{network_filter})"
    src, dst = F.col("src_ip"), F.col("dst_ip")
    pk = F.col("packets")
    zero = F.lit(0).cast("long")
    incoming = F.when(
        dst.rlike(network_filter),
        F.struct(
            dst.alias("host"),
            pk.alias("inc"),
            zero.alias("out"),
            src.alias("attacker"),
        ),
    )
    outgoing = F.when(
        src.rlike(network_filter),
        F.struct(
            src.alias("host"),
            zero.alias("inc"),
            pk.alias("out"),
            F.lit(None).cast("string").alias("attacker"),
        ),
    )
    return F.filter(F.array(incoming, outgoing), lambda s: s.isNotNull())


def ddos_window_aggregate(
    flows: DataFrame,
    window_duration: str = "30 seconds",
    network_filter: str = r"10\.0\..*",
    skew_safe: bool = True,
    salt_buckets: int = 16,
) -> DataFrame:
    """Short-window per-host partials: window_start_ms, host, inc, out,
    attacker_set (array<string>). This is the merge-able unit the
    streaming twin compacts across batches (sums add, sets union).

    ``skew_safe`` (the DEFAULT) two-stages the aggregation with an
    attacker-derived salt: the victim of a large DDoS is BY DEFINITION
    the hot key — its millions of distinct attacker values otherwise
    funnel through one task's ``collect_set`` state. Stage 1 dedups
    within (window, host, xxhash64(attacker) % salt_buckets); stage 2
    concatenates the disjoint per-bucket sets. Sums are bucket-additive,
    so inc/out merge exactly. Same output (results sorted either way).
    ``skew_safe=False`` keeps the single-exchange plan for small
    deployments where no host fans past one task's memory.
    """
    exploded = (
        with_window_start_ms(
            flows.filter(
                F.col(S.PACKETS).isNotNull()
                & F.col(S.SRC_IP4).isNotNull()
                & F.col(S.DST_IP4).isNotNull()
            ),
            S.T_START,
            window_duration,
        )
        .select(
            "window_start_ms",
            F.col(S.SRC_IP4).alias("src_ip"),
            F.col(S.DST_IP4).alias("dst_ip"),
            F.col(S.PACKETS).alias("packets"),
        )
        .select(
            "window_start_ms",
            F.explode(_monitored_contribs(network_filter)).alias("c"),
        )
    )
    if not skew_safe:
        return exploded.groupBy(
            "window_start_ms", F.col("c.host").alias("host")
        ).agg(
            F.sum("c.inc").alias("inc"),
            F.sum("c.out").alias("out"),
            F.sort_array(F.collect_set("c.attacker")).alias("attacker_set"),
        )
    salt = F.pmod(F.xxhash64(F.col("c.attacker")), F.lit(salt_buckets))
    stage1 = exploded.groupBy(
        "window_start_ms", F.col("c.host").alias("host"), salt.alias("__salt")
    ).agg(
        F.sum("c.inc").alias("inc"),
        F.sum("c.out").alias("out"),
        F.collect_set("c.attacker").alias("__bucket_set"),
    )
    # repartition by host BEFORE the merge: hash(host) satisfies the
    # ClusteredDistribution of groupBy(window, host) (partitioning keys
    # are a subset of the grouping keys), and it is exactly the
    # partitioning ddos_score's host-keyed RANGE window needs — so the
    # merge aggregate and the window share ONE exchange instead of the
    # attacker sets crossing hashpartitioning(window, host) and then
    # hashpartitioning(host) back to back (guide §2.4; r15 before-plan
    # showed 3 exchanges, each carrying the attacker payload). Stage 1
    # keeps its own (window, host, salt) exchange so collect_set still
    # partial-aggregates map-side — shuffling raw contributions on host
    # alone would move strictly more bytes (guide §2.3).
    return stage1.repartition("host").groupBy("window_start_ms", "host").agg(
        F.sum("inc").alias("inc"),
        F.sum("out").alias("out"),
        # buckets are attacker-derived, hence disjoint: flatten, no re-dedup
        F.sort_array(F.flatten(F.collect_list("__bucket_set"))).alias(
            "attacker_set"
        ),
    )


def ddos_score(
    partials: DataFrame,
    window_duration: str = "30 seconds",
    long_window: str = "2 hours",
    min_ratio: float = 50.0,
    min_packets: int = 100_000,
) -> DataFrame:
    """Score compacted per-window host partials against the trailing
    ``long_window`` baseline and keep alerting windows.

    The long window is an analytic RANGE frame in event-time ms over each
    host's ordered short windows — sparse (absent windows contribute 0,
    exactly like the reference's window-over-aggregated-DStream), one
    pass, shuffle = hash partition by host only."""
    from pyspark.sql import Window as W

    long_ms = duration_to_ms(long_window)
    base_ms = duration_to_ms(window_duration)
    frame = (
        W.partitionBy("host")
        .orderBy("window_start_ms")
        .rangeBetween(-(long_ms - base_ms), 0)
    )
    return (
        partials.withColumn("long_inc", F.sum("inc").over(frame))
        .withColumn("long_out", F.sum("out").over(frame))
        # nonzero denominators (reference :154-156), packet floor and
        # ratio-vs-baseline comparison (:159-163)
        .filter(
            (F.col("out") != 0)
            & (F.col("long_out") != 0)
            & (F.col("inc") > min_packets)
            & (
                F.col("inc").cast("double") / F.col("out")
                > F.col("long_inc").cast("double") / F.col("long_out") * min_ratio
            )
        )
        .select(
            "window_start_ms",
            F.col("host").alias("dst_ip"),
            F.col("inc").alias("packets"),
            (F.col("inc").cast("double") / F.col("out")).alias("shortratio"),
            (F.col("long_inc").cast("double") / F.col("long_out")).alias(
                "longratio"
            ),
            F.concat_ws(",", "attacker_set").alias("attackers"),
            F.size("attacker_set").cast("long").alias("attacker_count"),
        )
    )


def detection_ddos(
    flows: DataFrame,
    window_duration: str = "30 seconds",
    long_window: str = "2 hours",
    network_filter: str = r"10\.0\..*",
    min_ratio: float = 50.0,
    min_packets: int = 100_000,
    skew_safe: bool = True,
    salt_buckets: int = 16,
) -> DataFrame:
    """Output: window_start_ms, dst_ip, packets, shortratio, longratio,
    attackers (sorted ','-joined), attacker_count."""
    return ddos_score(
        ddos_window_aggregate(
            flows,
            window_duration,
            network_filter,
            skew_safe=skew_safe,
            salt_buckets=salt_buckets,
        ),
        window_duration=window_duration,
        long_window=long_window,
        min_ratio=min_ratio,
        min_packets=min_packets,
    )
