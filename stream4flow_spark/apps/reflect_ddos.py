"""reflect_ddos — DNS reflection/amplification detection.

Spark-first re-expression of reference
``applications/detection/reflect_ddos/spark/reflectdos_main.py``: UDP/53
traffic involving a watched DNS-server set (:118-134, F2/F7), oriented
into queries (client→server) and replies (server→client), per
(server, client) byte/count sums (:143-147, A1), amplification HAVING
(reply_bytes / query_bytes > ratio AND replies ≥ floor, :151-153, F10).
The two directions are a tagged union before one aggregate (J6) instead
of two joined pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream4flow_spark import schema as S
from stream4flow_spark.operators.window_agg import with_window_start_ms


def reflect_ddos(
    flows: DataFrame,
    dns_servers: list[str],
    window_duration: str | None = "20 seconds",
    min_ratio: float = 3.0,
    min_replies: int = 10,
) -> DataFrame:
    """Output: window_start_ms, dns_ip, client_ip, data_received,
    data_sent, outgoing_connections, amplification (double)."""
    udp53 = with_window_start_ms(
        flows.filter(
            (F.col(S.PROTO) == 17)
            & ((F.col(S.DST_PORT) == 53) | (F.col(S.SRC_PORT) == 53))
        ),
        S.T_START,
        window_duration,
    ).select(
        "window_start_ms",
        F.col(S.SRC_IP4).alias("src_ip"),
        F.col(S.DST_IP4).alias("dst_ip"),
        F.col(S.BYTES).alias("bytes"),
    )

    # F7 set-membership against the watched server list (reference :127,134)
    queries = udp53.filter(F.col("dst_ip").isin(dns_servers)).select(
        "window_start_ms",
        F.col("dst_ip").alias("dns_ip"),
        F.col("src_ip").alias("client_ip"),
        F.col("bytes").alias("query_bytes"),
        F.lit(0).cast("long").alias("reply_bytes"),
        F.lit(0).cast("long").alias("replies"),
    )
    replies = udp53.filter(F.col("src_ip").isin(dns_servers)).select(
        "window_start_ms",
        F.col("src_ip").alias("dns_ip"),
        F.col("dst_ip").alias("client_ip"),
        F.lit(0).cast("long").alias("query_bytes"),
        F.col("bytes").alias("reply_bytes"),
        F.lit(1).cast("long").alias("replies"),
    )

    return (
        queries.unionByName(replies)  # J6
        .groupBy("window_start_ms", "dns_ip", "client_ip")
        .agg(
            F.sum("query_bytes").alias("data_received"),
            F.sum("reply_bytes").alias("data_sent"),
            F.sum("replies").alias("outgoing_connections"),
        )
        # F10 amplification thresholds (reference :151-153); nonzero-denominator
        # guard mirrors the reference's division safety
        .filter(
            (F.col("data_received") > 0)
            & (F.col("outgoing_connections") >= min_replies)
            & (
                F.col("data_sent").cast("double") / F.col("data_received")
                > min_ratio
            )
        )
        .withColumn(
            "amplification",
            F.col("data_sent").cast("double") / F.col("data_received"),
        )
    )
