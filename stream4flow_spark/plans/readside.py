"""Read-side query surface — SURVEY.md §2.9 Q1-Q9.

The reference answered these with elasticsearch-dsl aggregation trees from
web2py controllers over the ES result indexes; here each is a Spark
DataFrame/SQL shape over the engine's RESULT tables (app outputs), which in
production are date-partitioned parquet. Each function takes the result
DataFrame(s) — batch or the sink of a streaming query — so the dashboards
query the same tables the pipelines write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# Q1 — bool filter: time range + type/term filter
# (reference web-interface/Stream4Flow/controllers/protocols_statistics.py:53-57)
def q1_range_term(
    result: DataFrame, ts_col: str, t_lo: int, t_hi: int, term: tuple[str, str] | None = None
) -> DataFrame:
    out = result.filter(F.col(ts_col).between(t_lo, t_hi))
    if term is not None:
        col, val = term
        out = out.filter(F.col(col) == val)
    return out


# Q2 — date_histogram → terms → sum (reference …/protocols_statistics.py:59-61)
def q2_histogram_terms_sum(
    result: DataFrame,
    ts_col: str,
    bucket_ms: int,
    term_col: str,
    sum_cols: list[str],
) -> DataFrame:
    bucket = (F.col(ts_col) - F.col(ts_col) % bucket_ms).alias("bucket_ms")
    return result.groupBy(bucket, term_col).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


# Q3 — global sums over a recent range (reference …/controllers/default.py:129-137)
def q3_global_sums(
    result: DataFrame, ts_col: str, t_lo: int, sum_cols: list[str]
) -> DataFrame:
    return result.filter(F.col(ts_col) >= t_lo).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


# Q4 — terms(size=MAX) → per-host sum (heatmap)
# (reference hosts_statistics/web-interface/controllers/host_statistics.py:96-98)
def q4_per_key_sums(result: DataFrame, key_col: str, sum_cols: list[str]) -> DataFrame:
    return result.groupBy(key_col).agg(*[F.sum(c).alias(c) for c in sum_cols])


# Q5 — date_histogram + multi-metric (sum / avg / min / max)
# (reference host_statistics.py:157-160,214-221,280-283,341-344)
def q5_histogram_multimetric(
    result: DataFrame, ts_col: str, bucket_ms: int, metric_col: str
) -> DataFrame:
    bucket = (F.col(ts_col) - F.col(ts_col) % bucket_ms).alias("bucket_ms")
    m = F.col(metric_col)
    return result.groupBy(bucket).agg(
        F.sum(m).alias("total"),
        (F.sum(m).cast("double") / F.count("*")).alias("mean"),
        F.min(m).alias("mn"),
        F.max(m).alias("mx"),
    )


# Q6 — nested agg: per group, top-1 key by summed value
# (reference dns_statistics/web-interface/controllers/dns_statistics.py:64-74,146-149)
def q6_top1_key_by_value(
    result: DataFrame, group_col: str, key_col: str, value_col: str
) -> DataFrame:
    summed = result.groupBy(group_col, key_col).agg(
        F.sum(value_col).alias("total")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("total").desc(), F.col(key_col).asc()
    )
    return (
        summed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(group_col, key_col, "total")
    )


# Q7 — "latest row per group": terms → terms → top_hits(size=1, sort ts desc)
# (reference ssh_auth_simple/web-interface/controllers/ssh_auth_simple.py:141-143)
def q7_latest_per_group(
    result: DataFrame, group_cols: list[str], ts_col: str, tiebreak_cols: list[str] | None = None
) -> DataFrame:
    order: list[Column] = [F.col(ts_col).desc()]
    for c in tiebreak_cols or []:
        order.append(F.col(c).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return result.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    ).drop("rn")


# Q8 — should-filter: OR of src/dst term (reference ssh_auth_simple.py:133-134)
def q8_either_term(result: DataFrame, col_a: str, col_b: str, value: str) -> DataFrame:
    return result.filter((F.col(col_a) == value) | (F.col(col_b) == value))


# Q9 — sort by timestamp (reference protocols_statistics.py:62); emitted as
# an explicit rank column because result-set order is not part of the
# hash-compare contract. Uses the distributed global rank (range partition
# + prefix offsets), not a single-partition window.
def q9_ordered_rank(result: DataFrame, ts_col: str, tiebreak_cols: list[str]) -> DataFrame:
    from stream4flow_spark.operators.topk import global_order_rank

    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    return global_order_rank(result, order)
