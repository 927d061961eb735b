"""Relational gate queries over the TPC-H-ish driver tables.

These exercise the general-purpose relational surface (multi-way joins,
semi/anti joins, broadcast dimension chains, pivot, top-k) that the
read-side and ad-hoc analytics need, with Catalyst doing the optimization.

Money arithmetic runs in DECIMAL end-to-end and is emitted as a STRING:
double sums are order-dependent (shuffle order is nondeterministic), so
exact decimal + canonical string is the only representation that is both
deterministic in Spark and engine-portable for the DuckDB hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream4flow_spark.registry import register
from stream4flow_spark.sources.tables import load_table

# exact per-row decimal terms (prices have 2 decimals, rates 2 decimals)
_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC1 = "CAST(1 - l_discount AS DECIMAL(4,2))"
_TAX1 = "CAST(1 + l_tax AS DECIMAL(4,2))"


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem")


@register(
    "tpch_q1_pricing_summary",
    covers="rel:groupby-multi-agg rel:decimal-exact A1 A4",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(CAST(SUM({_PRICE}) AS DECIMAL(38,2)) AS STRING) AS sum_base_price,
               CAST(CAST(SUM({_PRICE} * {_DISC1}) AS DECIMAL(38,4)) AS STRING) AS sum_disc_price,
               CAST(CAST(SUM({_PRICE} * {_DISC1} * {_TAX1}) AS DECIMAL(38,6)) AS STRING) AS sum_charge,
               CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(l_discount) AS DOUBLE) / COUNT(*) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY 1, 2
        """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir).filter(F.col("l_shipdate") <= "1998-09-02")
    price = F.expr(_PRICE)
    disc1 = F.expr(_DISC1)
    tax1 = F.expr(_TAX1)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.sum(price).cast("decimal(38,2)").cast("string").alias("sum_base_price"),
        F.sum(price * disc1).cast("decimal(38,4)").cast("string").alias("sum_disc_price"),
        F.sum(price * disc1 * tax1).cast("decimal(38,6)").cast("string").alias("sum_charge"),
        (F.sum("l_quantity").cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum("l_discount").cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "tpch_q6_forecast_revenue",
    covers="rel:selective-filter-agg F2",
    oracle=f"""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                             * CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(38,4))
                    AS STRING) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
        """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir).filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.expr("CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))")
    return li.agg(
        F.sum(rev).cast("decimal(38,4)").cast("string").alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@register(
    "tpch_q3_top_revenue_orders",
    covers="rel:3way-join rel:topk A9 J1",
    oracle=f"""
        WITH rev AS (
            SELECT o.o_orderkey, o.o_orderdate,
                   CAST(SUM({_PRICE} * {_DISC1}) AS DECIMAL(38,4)) AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY 1, 2
        )
        SELECT o_orderkey, orderdate_ms, CAST(revenue AS STRING) AS revenue
        FROM (
            SELECT o_orderkey,
                   CAST(epoch_ms(o_orderdate) AS BIGINT) AS orderdate_ms,
                   revenue
            FROM rev
            ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
        )
        """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    li = _li(spark, sf_dir)
    rev = F.expr(f"{_PRICE} * {_DISC1}")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("decimal(38,4)").alias("revenue"))
    )
    return (
        joined.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            F.col("revenue").cast("string").alias("revenue"),
        )
    )


@register(
    "tpch_q5ish_revenue_per_region",
    covers="rel:star-join rel:broadcast-dims J1 S6",
    oracle=f"""
        SELECT r.r_name AS region,
               CAST(CAST(SUM({_PRICE} * {_DISC1}) AS DECIMAL(38,4)) AS STRING) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS line_count
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1
        """,
)
def q_tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = F.expr(f"{_PRICE} * {_DISC1}")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.sum(rev).cast("decimal(38,4)").cast("string").alias("revenue"),
            F.count("*").alias("line_count"),
        )
    )


@register(
    "rel_semi_anti_customers",
    covers="rel:semi-join rel:anti-join J1",
    oracle="""
        SELECT n.n_name AS nation,
               CAST(SUM(CASE WHEN ok.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS with_orders,
               CAST(SUM(CASE WHEN ok.o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS without_orders
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) ok
          ON ok.o_custkey = c.c_custkey
        GROUP BY 1
        """,
)
def q_rel_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("with_orders"))
    )
    without_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("without_orders"))
    )
    return (
        with_orders.join(without_orders, "nation", "full_outer")
        .select(
            "nation",
            F.coalesce("with_orders", F.lit(0)).alias("with_orders"),
            F.coalesce("without_orders", F.lit(0)).alias("without_orders"),
        )
    )


@register(
    "rel_pivot_order_priority",
    covers="rel:pivot O2",
    oracle="""
        SELECT o_orderpriority,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS status_f,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS status_o,
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS status_p
        FROM orders GROUP BY 1
        """,
)
def q_rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


@register(
    "rel_event_sessionization",
    covers="rel:sessionization rel:window-lag W2",
    oracle="""
        WITH gaps AS (
            SELECT user_id, epoch_ms(ts) AS t,
                   CASE WHEN epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                         > 1800000 THEN 1
                        WHEN LAG(epoch_ms(ts)) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                        ELSE 0 END AS new_session
            FROM events
        ),
        sess AS (
            SELECT user_id, t,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS session_id
            FROM gaps
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MIN(t) AS BIGINT) AS session_start_ms,
               CAST(MAX(t) - MIN(t) AS BIGINT) AS duration_ms
        FROM sess GROUP BY 1, 2
        """,
)
def q_rel_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_millis("ts").alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    gaps = ev.withColumn(
        "new_session",
        F.when(F.col("t") - F.lag("t").over(w) > 1_800_000, 1)
        .when(F.lag("t").over(w).isNull(), 1)
        .otherwise(0),
    )
    run = Window.partitionBy("user_id").orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = gaps.withColumn("session_id", F.sum("new_session").over(run))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("t").alias("session_start_ms"),
        (F.max("t") - F.min("t")).alias("duration_ms"),
    )


@register(
    "rel_rollup_revenue",
    covers="rel:rollup rel:grouping-sets",
    oracle="""
        SELECT COALESCE(n_name, '__ALL__') AS nation,
               COALESCE(CAST(year(o_orderdate) AS VARCHAR), '__ALL__') AS order_year,
               CAST(COUNT(*) AS BIGINT) AS orders,
               CAST(GROUPING(n_name) * 2 + GROUPING(year(o_orderdate)) AS INT)
                   AS grouping_level
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, year(o_orderdate))
        """,
)
def q_rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (nation -> year -> grand total) in one pass —
    Catalyst expands the grouping sets via a single Expand, no
    re-aggregation per level. Engine-generality check beyond the
    reference's surface."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select("n_name", F.year("o_orderdate").alias("yr"))
    )
    return (
        joined.rollup("n_name", "yr")
        .agg(
            F.count("*").alias("orders"),
            (F.grouping("n_name") * 2 + F.grouping("yr"))
            .cast("int")
            .alias("grouping_level"),
        )
        .select(
            F.coalesce(F.col("n_name"), F.lit("__ALL__")).alias("nation"),
            F.coalesce(F.col("yr").cast("string"), F.lit("__ALL__")).alias(
                "order_year"
            ),
            "orders",
            "grouping_level",
        )
    )


@register(
    "tpch_q4ish_priority_check",
    covers="rel:exists-semi-join",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate)
        GROUP BY 1
        """,
)
def q_tpch_q4ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped: EXISTS → left-semi join (no row multiplication, the
    build side streams), then a tiny groupBy. The ship-after-order
    predicate stands in for TPC-H's commit/receipt columns the testdata
    lacks."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    matched = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        & (l["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "tpch_q13ish_order_distribution",
    covers="rel:left-outer-join rel:two-level-agg",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY 1
        )
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM per_cust GROUP BY 1
        """,
)
def q_tpch_q13ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: customers-by-order-count histogram — left outer join (keeps
    zero-order customers), two-level aggregation; the second groupBy's
    key space is tiny so the re-shuffle is negligible."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q14ish_promo_share",
    covers="rel:conditional-agg-share",
    oracle="""
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
               / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        """,
)
def q_tpch_q14ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share — fact⋈dim join with a conditional
    aggregate; one pass, no shuffle beyond the final scalar. `part` is
    O(sf) (sf·200k rows) so it carries NO broadcast hint — AQE picks
    broadcast at small scale and shuffle-hash at 100 TB."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q7ish_nation_volume",
    covers="rel:5way-join rel:dual-dim-broadcast rel:year-rollup",
    oracle=f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               CAST(CAST(SUM({_PRICE} * {_DISC1}) AS DECIMAL(38,4)) AS STRING) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY 1, 2, 3
        """,
)
def q_tpch_q7ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: volume shipping between a nation pair, per direction per year.
    Fact table joins two independent dimension CHAINS (customer-side and
    supplier-side nation). Only the fixed-size nation projections carry
    broadcast hints; customer/supplier are O(sf) (sf·150k / sf·10k rows),
    so their join strategy is left to AQE — broadcast at small sf,
    shuffle-hash at cluster scale, never an executor-OOMing forced
    broadcast. The nation-pair filter lands pre-aggregation."""
    li = _li(spark, sf_dir).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    rev = F.expr(f"{_PRICE} * {_DISC1}")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(rev).cast("decimal(38,4)").cast("string").alias("revenue"))
    )


@register(
    "tpch_q8ish_market_share",
    covers="rel:conditional-share rel:region-filter",
    oracle=f"""
        SELECT CAST(year(l.l_shipdate) AS INT) AS l_year,
               CAST(SUM(CASE WHEN sn.n_name = 'NATION_1'
                             THEN {_PRICE} * {_DISC1} ELSE CAST(0 AS DECIMAL(12,2)) END)
                    AS DOUBLE)
               / CAST(SUM({_PRICE} * {_DISC1}) AS DOUBLE) AS mkt_share
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE r.r_name = 'ASIA'
        GROUP BY 1
        """,
)
def q_tpch_q8ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: one nation's market share inside a region, per year — a
    conditional-numerator / total-denominator ratio in ONE aggregate pass
    (no self-join). Decimal sums keep both engines bit-identical; the
    ratio divides the exact sums as doubles."""
    li = _li(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cn = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    rev = F.expr(f"{_PRICE} * {_DISC1}")
    zero = F.expr("CAST(0 AS DECIMAL(12,2))")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(zero)
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q10ish_returned_revenue",
    covers="rel:returned-items rel:top20 A9",
    oracle=f"""
        SELECT c.c_custkey, c.c_name, n.n_name AS nation,
               CAST(CAST(SUM({_PRICE} * {_DISC1}) AS DECIMAL(38,4)) AS STRING) AS revenue,
               CAST(CAST(SUM({_PRICE} * {_DISC1}) AS DECIMAL(38,4)) AS DOUBLE) AS revenue_d
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue_d DESC, c.c_custkey ASC
        LIMIT 20
        """,
)
def q_tpch_q10ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by returned-item revenue in a half-year.
    Global top-k over the aggregate = orderBy+limit, which Spark executes
    as TakeOrderedAndProject (per-partition heap + tiny driver merge),
    never a full sort. Ranking on the exact-decimal revenue (as double)
    keeps the order engine-portable; custkey breaks ties."""
    li = _li(spark, sf_dir).filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = F.expr(f"{_PRICE} * {_DISC1}")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("decimal(38,4)").alias("rev_dec"))
        .select(
            "c_custkey",
            "c_name",
            "nation",
            F.col("rev_dec").cast("string").alias("revenue"),
            F.col("rev_dec").cast("double").alias("revenue_d"),
        )
    )
    return agg.orderBy(F.col("revenue_d").desc(), F.col("c_custkey").asc()).limit(20)


@register(
    "tpch_q18ish_large_orders",
    covers="rel:having-semi-join rel:top100",
    oracle="""
        WITH big AS (
            SELECT l_orderkey, CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 200
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey, 
               CAST(strftime(o.o_orderdate, '%Y-%m-%d') AS STRING) AS orderdate,
               big.sum_qty
        FROM big
        JOIN orders o ON big.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        ORDER BY big.sum_qty DESC, o.o_orderkey ASC
        LIMIT 100
        """,
)
def q_tpch_q18ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: large-volume orders — the HAVING aggregate is computed FIRST
    and then drives the join (the classic plan inverts this and re-joins
    lineitem; aggregating first shrinks the probe side to the qualifying
    orders). `big` is lineitem-derived and selective but still O(sf), so
    no forced broadcast — AQE sees its post-filter size at runtime and
    picks the strategy. Top-100 is TakeOrderedAndProject."""
    li = _li(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "sum_qty",
        )
        .orderBy(F.col("sum_qty").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "tpch_q19ish_bracket_revenue",
    covers="rel:or-of-ands rel:dim-pushdown",
    oracle=f"""
        SELECT CAST(CAST(SUM({_PRICE} * {_DISC1}) AS DECIMAL(38,4)) AS STRING) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#11' AND l.l_quantity BETWEEN 1 AND 11
               AND p.p_size BETWEEN 1 AND 5)
           OR (p.p_brand = 'Brand#22' AND l.l_quantity BETWEEN 10 AND 20
               AND p.p_size BETWEEN 1 AND 10)
           OR (p.p_brand = 'Brand#33' AND l.l_quantity BETWEEN 20 AND 30
               AND p.p_size BETWEEN 1 AND 15)
        """,
)
def q_tpch_q19ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: OR-of-ANDs bracket predicate across fact and dimension
    columns; the disjunction is evaluated post-join in one pass (Catalyst
    extracts the common l_quantity/p_size bounds where it can). `part` is
    O(sf) so the join strategy is AQE's call, not a forced broadcast.
    Output is a single exact-decimal scalar."""
    li = _li(spark, sf_dir)
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    bracket = (
        ((F.col("p_brand") == "Brand#11") & F.col("l_quantity").between(1, 11)
         & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#22") & F.col("l_quantity").between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#33") & F.col("l_quantity").between(20, 30)
           & F.col("p_size").between(1, 15))
    )
    rev = F.expr(f"{_PRICE} * {_DISC1}")
    return joined.filter(bracket).agg(
        F.sum(rev).cast("decimal(38,4)").cast("string").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "tpch_q22ish_dormant_customers",
    covers="rel:anti-join rel:scalar-subquery",
    oracle="""
        WITH cutoff AS (
            SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
        )
        SELECT n.n_name AS nation,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2))
                    AS STRING) AS totacctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey, cutoff
        WHERE c.c_acctbal > cutoff.avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY 1
        """,
)
def q_tpch_q22ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22: dormant high-balance customers per nation — a scalar
    aggregate threshold (1-row cross join, Catalyst broadcasts it), an
    ANTI join against recent orders (no row materializes the miss), and
    an exact-decimal balance rollup. The anti join's build side is the
    filtered orders key set — orders-derived, so O(sf): no forced
    broadcast; AQE broadcasts it only when its runtime size allows. The
    1-row avg_bal keeps its hint (truly constant size)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("totacctbal"),
        )
    )


@register(
    "rel_asof_join",
    covers="rel:asof-join J4",
    oracle="""
        WITH c AS (SELECT event_id, user_id, epoch_ms(ts) AS click_ms
                   FROM events WHERE event_type = 'click'),
             p AS (SELECT user_id, epoch_ms(ts) AS purchase_ms,
                          MAX(value) AS purchase_value
                   FROM events WHERE event_type = 'purchase'
                   GROUP BY 1, 2)
        SELECT c.event_id, c.user_id, c.click_ms,
               p.purchase_ms, p.purchase_value
        FROM c ASOF JOIN p
          ON c.user_id = p.user_id AND c.click_ms >= p.purchase_ms
        """,
)
def q_rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event picks up the latest at-or-before
    purchase by the same user (operators/asof_join.py — union + one
    keyed sort + running last(ignorenulls), no range explosion; the
    oracle is DuckDB's native ASOF JOIN). The right side is
    pre-aggregated per (user, ts) so "latest" is well-defined. Reference
    analogue: the J4 time-proximity join of dns_external_resolvers
    (dns_external_resolvers.py:149-166), directional instead of |Δt|."""
    from stream4flow_spark.operators.asof_join import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_millis("ts").alias("click_ms")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.unix_millis("ts").alias("purchase_ms"))
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="click_ms",
        right_ts="purchase_ms",
    )


@register(
    "tpch_q17ish_small_quantity_revenue",
    covers="rel:correlated-scalar-subquery rel:decimal-exact J1 A4 F10",
    oracle=f"""
        WITH threshold AS (
            SELECT l_partkey, 0.5 * AVG(l_quantity) AS qty_cap
            FROM lineitem GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(CAST(SUM({_PRICE}) / 7 AS DECIMAL(38,6)) AS STRING)
                 AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN threshold t ON t.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#12' AND l.l_quantity < t.qty_cap
        """,
)
def q_tpch_q17ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue from unusually small orders of one brand's parts.
    The correlated scalar subquery (per-part average quantity) is
    decorrelated into a pre-aggregate + equi-join — the plan every
    engine should run: lineitem is scanned twice but shuffles only
    (partkey, sum, count) for the threshold side, and the brand filter
    prunes the probe side before the join. No broadcast hint on the
    threshold: it is O(|part|), scale-growing, so AQE decides."""
    li = _li(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    threshold = li.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_cap")
    )
    brand_parts = part.filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    return (
        li.join(brand_parts, li.l_partkey == brand_parts.p_partkey)
        .join(threshold, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.count("*").alias("n_lines"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
                / F.lit(7)
            )
            .cast("decimal(38,6)")
            .cast("string")
            .alias("avg_yearly"),
        )
    )


@register(
    "tpch_q15ish_top_supplier",
    covers="rel:scalar-subquery-max rel:decimal-exact J1 A1 F2",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM({_PRICE} * {_DISC1}) AS DECIMAL(38,4))
                     AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(r.total_revenue AS STRING) AS total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """,
)
def q_tpch_q15ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: the supplier(s) with the maximum quarterly revenue. The
    uncorrelated MAX subquery becomes a 1-row aggregate broadcast-joined
    back onto the revenue relation (truly constant size → explicit
    hint); revenue itself aggregates in exact DECIMAL so the max / the
    equality are deterministic across engines. The shipdate filter
    reaches the parquet scan on the fact table."""
    li = _li(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
            )
            .cast("decimal(38,4)")
            .alias("total_revenue")
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(sup, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("string").alias("total_revenue"),
        )
    )


@register(
    "tpch_q11ish_important_parts",
    covers="rel:global-share-filter rel:decimal-exact A1 F10",
    oracle=f"""
        WITH part_value AS (
            SELECT l_partkey,
                   CAST(SUM({_PRICE} * {_DISC1}) AS DECIMAL(38,4)) AS value
            FROM lineitem GROUP BY 1
        ),
        total AS (
            SELECT CAST(SUM(value) AS DECIMAL(38,4)) AS total_value
            FROM part_value
        )
        SELECT pv.l_partkey AS partkey, CAST(pv.value AS STRING) AS value
        FROM part_value pv, total
        WHERE pv.value > total.total_value * 0.001
        """,
)
def q_tpch_q11ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: parts representing a significant share of total revenue.
    One fact-side aggregate, re-aggregated to a single global total that
    broadcasts back as the HAVING threshold — the two-level "share of
    global sum" shape. Catalyst does not share the part_value subplan
    between the total and the probe, so the fact table is scanned twice;
    at interactive scale one would localCheckpoint/cache the O(|part|)
    aggregate first — the exchange-level cost (two narrow aggregates +
    one broadcast) is unchanged."""
    li = _li(spark, sf_dir)
    part_value = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
        )
        .cast("decimal(38,4)")
        .alias("value")
    )
    total = part_value.agg(
        F.sum("value").cast("decimal(38,4)").alias("total_value")
    )
    return (
        part_value.crossJoin(F.broadcast(total))
        .filter(
            F.col("value")
            > (F.col("total_value") * F.lit(0.001)).cast("decimal(38,6)")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value").cast("string").alias("value"),
        )
    )


@register(
    "tpch_q9ish_nation_year_profit",
    covers="rel:multiway-join rel:date-extract rel:decimal-exact J1 A1",
    oracle=f"""
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS INT) AS o_year,
               CAST(CAST(SUM({_PRICE} * {_DISC1}) AS DECIMAL(38,4)) AS STRING)
                 AS revenue
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_type = 'PROMO'
        GROUP BY 1, 2
        """,
)
def q_tpch_q9ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9: revenue by supplier nation and order year for one product
    line — the widest join tree in the relational tier (lineitem ⋈ part
    ⋈ supplier ⋈ nation ⋈ orders). The p_type filter prunes the part
    side BEFORE its join (semi-join-sized build), supplier/nation are
    O(1)-ish dims AQE broadcasts at runtime, and orders—the only
    scale-growing side—joins on the fact's own key so it shuffles
    hash-partitioned with the fact. No broadcast hints on scale-growing
    tables (tests/test_plan_quality.py guards that invariant)."""
    li = _li(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
            )
            .cast("decimal(38,4)")
            .cast("string")
            .alias("revenue")
        )
    )


@register(
    "rel_funnel_conversion",
    covers="rel:funnel rel:conditional-window W2",
    oracle="""
        WITH stage AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END)
                     AS t_signup
            FROM events GROUP BY 1
        ),
        c AS (
            SELECT e.user_id, s.t_signup,
                   MIN(CASE WHEN e.event_type = 'click'
                            AND epoch_ms(e.ts) > s.t_signup
                            THEN epoch_ms(e.ts) END) AS t_click
            FROM events e JOIN stage s USING (user_id)
            GROUP BY 1, 2
        ),
        p AS (
            SELECT e.user_id, c.t_signup, c.t_click,
                   MIN(CASE WHEN e.event_type = 'purchase'
                            AND epoch_ms(e.ts) > c.t_click
                            THEN epoch_ms(e.ts) END) AS t_purchase
            FROM events e JOIN c USING (user_id)
            GROUP BY 1, 2, 3
        )
        SELECT CAST(COUNT(t_signup) AS BIGINT) AS n_signup,
               CAST(COUNT(t_click) AS BIGINT) AS n_click_after_signup,
               CAST(COUNT(t_purchase) AS BIGINT) AS n_purchase_after_click
        FROM p
        """,
)
def q_rel_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who signed up, then clicked AFTER the
    signup, then purchased AFTER that click. The ordering constraint
    makes each stage's timestamp depend on the previous stage's — three
    chained conditional mins over the SAME user partition, which Spark
    plans as one exchange keyed by user plus window passes (no
    self-joins; the oracle's equivalent join-per-stage formulation is
    the portable SQL spelling). Output is one row of stage counts."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("t")
    )
    w = Window.partitionBy("user_id")
    t_signup = F.min(
        F.when(F.col("event_type") == "signup", F.col("t"))
    ).over(w)
    staged = ev.withColumn("t_signup", t_signup)
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("t") > F.col("t_signup")),
            F.col("t"),
        )
    ).over(w)
    staged = staged.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("t") > F.col("t_click")),
            F.col("t"),
        )
    ).over(w)
    staged = staged.withColumn("t_purchase", t_purchase)
    per_user = staged.groupBy("user_id").agg(
        F.first("t_signup").alias("t_signup"),
        F.first("t_click").alias("t_click"),
        F.first("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_signup").alias("n_signup"),
        F.count("t_click").alias("n_click_after_signup"),
        F.count("t_purchase").alias("n_purchase_after_click"),
    )


@register(
    "rel_retention_cohorts",
    covers="rel:cohort-retention rel:distinct-count A3",
    oracle="""
        WITH firsts AS (
            SELECT user_id, MIN(epoch_ms(ts)) AS t0 FROM events GROUP BY 1
        )
        SELECT CAST(f.t0 // 604800000 AS BIGINT) AS cohort_week,
               CAST((epoch_ms(e.ts) - f.t0) // 604800000 AS BIGINT)
                 AS weeks_since,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
        FROM events e JOIN firsts f USING (user_id)
        GROUP BY 1, 2
        """,
)
def q_rel_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by the week of their first event,
    counted as active in each subsequent week. First-touch timestamps
    come from a window min over the SAME user-keyed exchange the cohort
    aggregation needs (no join back); the distinct count dedups
    (cohort, week, user) map-side. Weeks are integer epoch-week indexes
    so every output column is exact."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_millis("ts").alias("t")
    )
    w = Window.partitionBy("user_id")
    week_ms = 604_800_000
    cohorted = ev.withColumn("t0", F.min("t").over(w)).select(
        "user_id",
        (F.col("t0") / week_ms).cast("long").alias("cohort_week"),
        ((F.col("t") - F.col("t0")) / week_ms).cast("long").alias("weeks_since"),
    )
    return cohorted.groupBy("cohort_week", "weeks_since").agg(
        F.countDistinct("user_id").alias("active_users")
    )


@register(
    "rel_json_props",
    covers="rel:semi-structured S2",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
               CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k,
               CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_high
        FROM (
            SELECT event_type,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        GROUP BY 1
        """,
)
def q_rel_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the JSON ``props`` payload with
    an explicit schema (``from_json`` — typed, vectorized, NULL on
    malformed input; the relational twin of the flow stream's S2 JSON
    parse) and aggregate the extracted field per event type. The parse
    is a scan-side Column expression — no UDF, no second pass — and the
    aggregate shuffles only (event_type, partial sums)."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    k = F.from_json(F.col("props"), schema)["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("n_distinct_k"),
            (F.sum("k").cast("double") / F.count("*")).alias("avg_k"),
            F.sum((F.col("k") >= 50).cast("long")).alias("n_high"),
        )
    )


@register(
    "rel_cube_mktsegment_year",
    covers="rel:cube rel:grouping-sets",
    oracle="""
        SELECT COALESCE(c_mktsegment, '__ALL__') AS segment,
               COALESCE(CAST(year(o_orderdate) AS VARCHAR), '__ALL__')
                 AS order_year,
               CAST(COUNT(*) AS BIGINT) AS orders,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    AS DECIMAL(38,2)) AS STRING) AS total_value,
               CAST(GROUPING(c_mktsegment) * 2
                    + GROUPING(year(o_orderdate)) AS INT) AS grouping_level
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        GROUP BY CUBE(c_mktsegment, year(o_orderdate))
        """,
)
def q_rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (market segment × order year): all four grouping sets in
    ONE pass via Catalyst's Expand — the cross-classified complement of
    the ROLLUP hierarchy (rel_rollup_revenue). Money stays DECIMAL."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment",
        F.year("o_orderdate").alias("yr"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
    )
    return (
        joined.cube("c_mktsegment", "yr")
        .agg(
            F.count("*").alias("orders"),
            F.sum("price").cast("decimal(38,2)").cast("string").alias(
                "total_value"
            ),
            (
                F.grouping("c_mktsegment") * 2 + F.grouping("yr")
            ).cast("int").alias("grouping_level"),
        )
        .select(
            F.coalesce(F.col("c_mktsegment"), F.lit("__ALL__")).alias("segment"),
            F.coalesce(F.col("yr").cast("string"), F.lit("__ALL__")).alias(
                "order_year"
            ),
            "orders",
            "total_value",
            "grouping_level",
        )
    )


@register(
    "rel_moving_order_value",
    covers="rel:rows-frame-window rel:decimal-exact W2",
    oracle="""
        SELECT o_orderkey,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS DECIMAL(38,2)) AS STRING) AS trailing3_value,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
               ) AS INT) AS order_seq
        FROM orders
        """,
)
def q_rel_moving_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-3-orders spend per customer — a ROWS frame over the
    customer partition (the RANGE-frame cousin lives in detection_ddos'
    baseline). One exchange keyed by customer; the deterministic
    (orderdate, orderkey) sort makes the frame engine-reproducible; money
    stays DECIMAL."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(frame)
        .cast("decimal(38,2)")
        .cast("string")
        .alias("trailing3_value"),
        F.row_number().over(w).cast("int").alias("order_seq"),
    )


@register(
    "tpch_q2ish_min_cost_supplier",
    covers="rel:window-argmin rel:agg-then-join J1 A9",
    oracle=f"""
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM({_PRICE}) AS DECIMAL(38,2)) AS total_cost
            FROM lineitem GROUP BY 1, 2
        ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY l_partkey
                       ORDER BY total_cost ASC, l_suppkey ASC) AS rk
            FROM cost
        )
        SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name AS nation,
               CAST(r.total_cost AS STRING) AS total_cost
        FROM ranked r
        JOIN part p ON r.l_partkey = p.p_partkey AND p.p_size <= 15
        JOIN supplier s ON r.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE r.rk = 1
        """,
)
def q_tpch_q2ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (ref has no relational tier; engine-generality query):
    per-part argmin supplier. The classic formulation is a correlated
    MIN subquery re-scanning partsupp; here the aggregate is computed
    once and the argmin is a rank-1 window over it — one exchange keyed
    by part for both the aggregate and the window (Catalyst reuses the
    partitioning), then dimension joins. Cost stays DECIMAL (double sums
    are shuffle-order-dependent); ties break on suppkey so the kept row
    is deterministic. `part` is O(sf): no forced broadcast, AQE picks."""
    from pyspark.sql import Window

    li = _li(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.expr(_PRICE)).cast("decimal(38,2)").alias("total_cost")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("total_cost").asc(), F.col("l_suppkey").asc()
    )
    best = cost.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(s, best.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("total_cost").cast("string").alias("total_cost"),
        )
    )


@register(
    "tpch_q16ish_supplier_variety",
    covers="rel:not-in-anti rel:distinct-agg A3 J1",
    oracle="""
        SELECT p.p_brand, p.p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#11'
          AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2
        """,
)
def q_tpch_q16ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: supplier variety per part attribute, excluding a
    NOT-IN set (reference Q16's complaint suppliers → negative-balance
    suppliers here, partsupp → lineitem as the bridge). The NOT IN is a
    left-anti join against the (selective, but O(sf)) supplier subset —
    no forced broadcast; the distinct count shuffles once on the group
    key after the anti-join prunes. Dim predicates sit on the part scan
    so parquet row groups prune."""
    li = _li(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20ish_excess_suppliers",
    covers="rel:nested-agg-semi-join rel:semi-join J1",
    oracle="""
        WITH ps AS (
            SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
            GROUP BY 1, 2
        ), pt AS (
            SELECT l_partkey, SUM(l_quantity) AS part_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
            GROUP BY 1
        )
        SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name AS nation
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_suppkey IN (
            SELECT ps.l_suppkey FROM ps
            JOIN pt ON ps.l_partkey = pt.l_partkey
            WHERE ps.supp_qty > 0.5 * pt.part_qty)
        """,
)
def q_tpch_q20ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers holding >50% of a part's 1995 volume — a
    nested aggregate (per part-supplier vs per part) compared within the
    same grouping, then a semi-join up to supplier. Both aggregates come
    from ONE filtered scan: the per-part total is a window sum over the
    per-(part,supplier) aggregate, so lineitem is read and shuffled once
    (keyed by part) instead of twice. Quantities are integral-valued so
    double sums are exact. The qualifying-supplier set drives a left-semi
    join (no row multiplication)."""
    from pyspark.sql import Window

    li = _li(spark, sf_dir).filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    part_tot = Window.partitionBy("l_partkey")
    excess = (
        ps.withColumn("part_qty", F.sum("supp_qty").over(part_tot))
        .filter(F.col("supp_qty") > 0.5 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .join(n, s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


@register(
    "tpch_q21ish_sole_supplier",
    covers="rel:self-anti-join rel:exists-not-exists A9",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT l.l_orderkey, l.l_suppkey
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        )
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM pairs p1
        JOIN supplier s ON p1.l_suppkey = s.s_suppkey
        WHERE NOT EXISTS (
            SELECT 1 FROM pairs p2
            WHERE p2.l_orderkey = p1.l_orderkey
              AND p2.l_suppkey <> p1.l_suppkey)
        GROUP BY 1
        ORDER BY numwait DESC, s.s_name ASC
        LIMIT 20
        """,
)
def q_tpch_q21ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (no commit/receipt dates in this schema, so 'kept
    waiting' becomes 'sole supplier on a failed order'): the signature
    NOT-EXISTS self-correlation survives — distinct (order, supplier)
    pairs anti-joined against themselves on same-order/other-supplier.
    The pair set is aggregated BEFORE the self-join (distinct shrinks
    the anti-join input to one row per order-supplier), both sides hash
    on l_orderkey so the anti-join co-partitions, and top-20 is
    TakeOrderedAndProject. Name ties can't occur (s_name is unique)."""
    li = _li(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = load_table(spark, sf_dir, "supplier")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    p2 = pairs.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_suppkey").alias("r_suppkey"),
    )
    sole = pairs.join(
        p2,
        (pairs.l_orderkey == p2.r_orderkey) & (pairs.l_suppkey != p2.r_suppkey),
        "left_anti",
    )
    return (
        sole.join(s, sole.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


@register(
    "rel_setops_customer_years",
    covers="rel:intersect rel:except rel:set-ops",
    oracle="""
        WITH y94 AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE year(o_orderdate) = 1994),
             y95 AS (SELECT DISTINCT o_custkey FROM orders
                     WHERE year(o_orderdate) = 1995)
        SELECT
            CAST((SELECT COUNT(*) FROM (SELECT * FROM y94 INTERSECT
                                        SELECT * FROM y95)) AS BIGINT)
              AS n_both,
            CAST((SELECT COUNT(*) FROM (SELECT * FROM y94 EXCEPT
                                        SELECT * FROM y95)) AS BIGINT)
              AS n_94_only,
            CAST((SELECT COUNT(*) FROM (SELECT * FROM y95 EXCEPT
                                        SELECT * FROM y94)) AS BIGINT)
              AS n_95_only
        """,
)
def q_rel_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over customer-activity key sets (1994 vs 1995
    buyers) — the set operators the join tier doesn't otherwise touch.
    Spark plans both as hash joins over pre-distinct inputs. The naive
    formulation (filter-then-distinct per year, per branch) scans the
    fact table SIX times — one per set-op input; instead ONE grouped
    pass computes per-customer year flags, and all six branch inputs are
    filters over that single aggregate, so the orders scan + custkey
    exchange deduplicate via ReusedExchange. Three 1-row aggregates
    cross-join (broadcast) into one row."""
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"), "o_custkey"
    ).filter(F.col("yr").isin(1994, 1995))
    keys = o.groupBy("o_custkey").agg(
        F.max(F.col("yr") == 1994).alias("h94"),
        F.max(F.col("yr") == 1995).alias("h95"),
    )
    y94 = keys.filter("h94").select("o_custkey")
    y95 = keys.filter("h95").select("o_custkey")
    n_both = y94.intersect(y95).agg(F.count("*").alias("n_both"))
    n_94 = y94.subtract(y95).agg(F.count("*").alias("n_94_only"))
    n_95 = y95.subtract(y94).agg(F.count("*").alias("n_95_only"))
    return n_both.crossJoin(n_94).crossJoin(n_95)


@register(
    "rel_spend_deciles",
    covers="rel:ntile rel:percent-rank rel:distribution-windows",
    oracle="""
        WITH spend AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                        AS DECIMAL(38,2)) AS total_spend
            FROM orders GROUP BY 1
        )
        SELECT o_custkey,
               CAST(total_spend AS STRING) AS total_spend,
               CAST(NTILE(10) OVER w AS INT) AS decile,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cume,
               CAST(RANK() OVER w AS BIGINT) AS rnk
        FROM spend
        WINDOW w AS (ORDER BY total_spend DESC, o_custkey ASC)
        """,
)
def q_rel_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (NTILE / PERCENT_RANK / CUME_DIST /
    RANK) over per-customer lifetime spend. The unpartitioned window is
    inherent to a global ranking — but it runs over the per-customer
    AGGREGATE (|customers| rows, not |orders|), which is the part that
    matters at scale; a truly giant customer dimension would switch to
    the range-partitioned global-rank composition in `operators/topk.py`.
    Ties in spend are broken by custkey so every engine emits identical
    rank columns."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(38,2)")
        .alias("total_spend")
    )
    w = Window.orderBy(F.col("total_spend").desc(), F.col("o_custkey").asc())
    return spend.select(
        "o_custkey",
        F.col("total_spend").cast("string").alias("total_spend"),
        F.ntile(10).over(w).cast("int").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.rank().over(w).alias("rnk"),
    )


@register(
    "rel_gapfill_events",
    covers="rel:gap-fill rel:forward-fill rel:time-grid",
    oracle="""
        WITH agg AS (
            SELECT user_id, date_trunc('hour', ts) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   SUM(value) AS value_sum
            FROM events WHERE user_id < 30 GROUP BY 1, 2
        ), bounds AS (
            SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx
            FROM agg GROUP BY 1
        ), grid AS (
            SELECT user_id,
                   unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
            FROM bounds
        )
        SELECT g.user_id,
               strftime(g.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
               COALESCE(a.n_events, 0) AS n_events,
               ROUND(COALESCE(a.value_sum, 0), 4) AS value_sum,
               ROUND(LAST_VALUE(a.value_sum IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                 AS last_seen_value
        FROM grid g
        LEFT JOIN agg a ON g.user_id = a.user_id AND g.bucket = a.bucket
        """,
)
def q_rel_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap fill + forward fill per user over the events stream
    (`operators/gapfill.py`): zero-filled additive measures, LOCF for
    the state-like one. The dense grid is a map-side sequence() explode
    of per-key bounds — grid size is time-range/step per key, never
    O(events)."""
    from stream4flow_spark.operators.gapfill import gap_fill_hourly

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    out = gap_fill_hourly(ev, "user_id", "ts", "value")
    return out.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "n_events",
        F.round("value_sum", 4).alias("value_sum"),
        F.round("last_seen_value", 4).alias("last_seen_value"),
    )


@register(
    "rel_unpivot_measures",
    covers="rel:unpivot rel:melt",
    oracle="""
        SELECT l_returnflag,
               m.measure,
               CAST(CAST(SUM(m.val) AS DECIMAL(38,2)) AS STRING) AS total
        FROM lineitem,
             LATERAL (VALUES
                 ('quantity', CAST(l_quantity AS DECIMAL(12,2))),
                 ('extendedprice', CAST(l_extendedprice AS DECIMAL(12,2))),
                 ('tax', CAST(l_tax AS DECIMAL(12,2)))
             ) AS m(measure, val)
        GROUP BY 1, 2
        """,
)
def q_rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse of rel_pivot_order_priority: wide
    measure columns become (measure, value) rows via `stack()` in ONE
    Expand pass (no per-measure scans, no union of three reads), then a
    grouped decimal sum. The Expand multiplies rows map-side; the only
    shuffle is the final (flag, measure) aggregate."""
    li = _li(spark, sf_dir)
    melted = li.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'quantity', CAST(l_quantity AS DECIMAL(12,2)), "
            "'extendedprice', CAST(l_extendedprice AS DECIMAL(12,2)), "
            "'tax', CAST(l_tax AS DECIMAL(12,2))) AS (measure, val)"
        ),
    )
    return melted.groupBy("l_returnflag", "measure").agg(
        F.sum("val").cast("decimal(38,2)").cast("string").alias("total")
    )


@register(
    "rel_lateral_top_orders",
    covers="rel:lateral-join rel:correlated-subquery A9",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS STRING)
                 AS totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 2) o
        WHERE c.c_custkey < 200
        """,
)
def q_rel_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY LIMIT — the SQL
    surface users reach for before they know rank windows; Catalyst
    decorrelates it into the same rank-window plan top_k_per_key emits,
    so the declarative form costs nothing at scale. Deterministic
    per-customer tiebreak; money as exact-decimal string."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "_lat_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey,
               CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS STRING)
                 AS totalprice
        FROM _lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM _lat_orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 2) o
        WHERE c.c_custkey < 200
        """
    )


@register(
    "rel_recursive_calendar",
    covers="rel:recursive-cte rel:gap-fill",
    oracle="""
        WITH RECURSIVE cal(m) AS (
            SELECT (SELECT date_trunc('year', MIN(CAST(o_orderdate AS DATE)))
                    FROM orders)
            UNION ALL
            SELECT m + INTERVAL 1 YEAR FROM cal
            WHERE m < (SELECT date_trunc('year',
                              MAX(CAST(o_orderdate AS DATE))) FROM orders)
        ),
        monthly AS (
            SELECT date_trunc('year', CAST(o_orderdate AS DATE)) AS m,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY 1
        )
        SELECT CAST(strftime(CAST(cal.m AS DATE), '%Y') AS STRING)
                 AS year,
               CAST(COALESCE(monthly.n, 0) AS BIGINT) AS orders
        FROM cal LEFT JOIN monthly ON CAST(cal.m AS DATE)
                                      = CAST(monthly.m AS DATE)
        """,
)
def q_rel_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE): the classic calendar
    spine — a linear, terminating recursion from the first to the last
    order year — left-joined to yearly order counts so silent years
    surface (the declarative cousin of operators/gapfill.py). Spark
    executes the recursion as an iterative union: each level is a
    separate job (~0.2 s of scheduling at ANY data size), so spine
    granularity is the cost knob — measured here: year spine ~7 levels
    ≈ 2 s, month ~84 ≈ 17 s, a day spine would be ~2500. Dense grids
    belong to sequence()/explode (gapfill); recursion to genuinely
    inductive definitions. DuckDB runs the same SQL minus the
    Spark-only MAX RECURSION LEVEL clause."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_rc_orders")
    return spark.sql(
        """
        WITH RECURSIVE cal(m) MAX RECURSION LEVEL 1000 AS (
            SELECT (SELECT date_trunc('YEAR', MIN(CAST(o_orderdate AS DATE)))
                    FROM _rc_orders)
            UNION ALL
            SELECT m + INTERVAL 1 YEAR FROM cal
            WHERE m < (SELECT date_trunc('YEAR',
                              MAX(CAST(o_orderdate AS DATE)))
                       FROM _rc_orders)
        ),
        monthly AS (
            SELECT date_trunc('YEAR', CAST(o_orderdate AS DATE)) AS m,
                   COUNT(*) AS n
            FROM _rc_orders GROUP BY 1
        )
        SELECT CAST(date_format(cal.m, 'yyyy') AS STRING) AS year,
               COALESCE(monthly.n, 0) AS orders
        FROM cal LEFT JOIN monthly ON CAST(cal.m AS DATE)
                                      = CAST(monthly.m AS DATE)
        """
    )


@register(
    "tpch_q12ish_shipmode_priority",
    covers="rel:conditional-two-way-count rel:selective-date-join",
    oracle="""
        SELECT CASE l_suppkey % 3 WHEN 0 THEN 'MAIL'
                                  WHEN 1 THEN 'SHIP'
                                  ELSE 'RAIL' END AS ship_mode,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT)
                 AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate <  DATE '1998-01-01'
        GROUP BY 1
        """,
)
def q_tpch_q12ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped: shipping-mode vs order-priority cross counts after a
    selective one-year date filter (TPC-H Q12; the testdata lacks
    l_shipmode/commit/receipt columns, so the mode derives
    deterministically from l_suppkey and the date filter stands alone).
    Scale shape: the year predicate pushes to the lineitem scan (it
    drops ~6/7 of the fact table BEFORE the join), the orders side
    prunes to (key, priority), and the conditional counts fold into one
    3-key hash aggregate with map-side partials — the classic
    filter -> join -> CASE-count reporting pipeline."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    filtered = l.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_suppkey")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        filtered.join(
            o.select("o_orderkey", "o_orderpriority"),
            filtered["l_orderkey"] == o["o_orderkey"],
        )
        .select(
            F.element_at(
                F.array(F.lit("MAIL"), F.lit("SHIP"), F.lit("RAIL")),
                (F.col("l_suppkey") % 3 + 1).cast("int"),
            ).alias("ship_mode"),
            high.cast("long").alias("is_high"),
        )
        .groupBy("ship_mode")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
    )


@register(
    "rel_grouping_sets_nation_year",
    covers="rel:grouping-sets",
    oracle="""
        SELECT COALESCE(n_name, '__ALL__') AS nation,
               COALESCE(CAST(year(o_orderdate) AS STRING), '__ALL__')
                 AS order_year,
               CAST(COUNT(*) AS BIGINT) AS orders,
               CAST(GROUPING(n_name) * 2 + GROUPING(year(o_orderdate))
                    AS INT) AS grouping_level
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (year(o_orderdate)))
        """,
)
def q_rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two INDEPENDENT dimension totals (per
    nation, per year) in one pass, the shape ROLLUP/CUBE can't express
    without computing unwanted combinations. Catalyst expands both sets
    via a single Expand over one scan+join; at 100 TB that's one fact
    pass instead of two union'd aggregates."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select("n_name", F.year("o_orderdate").alias("yr"))
    )
    joined.createOrReplaceTempView("_gs_joined")
    return joined.sparkSession.sql(
        """
        SELECT COALESCE(n_name, '__ALL__') AS nation,
               COALESCE(CAST(yr AS STRING), '__ALL__') AS order_year,
               COUNT(*) AS orders,
               CAST(GROUPING(n_name) * 2 + GROUPING(yr) AS INT)
                 AS grouping_level
        FROM _gs_joined
        GROUP BY GROUPING SETS ((n_name), (yr))
        """
    )


@register(
    "rel_trailing_week_revenue",
    covers="rel:range-interval-window rel:event-time-frame",
    oracle="""
        WITH daily AS (
            SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
            FROM orders WHERE o_custkey < 200 GROUP BY 1, 2
        )
        SELECT o_custkey,
               strftime(d, '%Y-%m-%d') AS order_date,
               CAST(CAST(SUM(rev) OVER (
                   PARTITION BY o_custkey ORDER BY d
                   RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
               ) AS DECIMAL(38,2)) AS STRING) AS trailing_7d_revenue
        FROM daily
        """,
)
def q_rel_trailing_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-DAY revenue per customer — an EVENT-TIME RANGE frame
    (value-based bounds over sparse dates), not a ROWS frame: a
    customer with three orders in one week and none for a month gets
    the calendar-correct trailing sum, which row-counted frames get
    wrong. Spark side orders by epoch-day and uses
    ``rangeBetween(-6, 0)`` — the numeric twin of SQL's RANGE INTERVAL;
    the frame scans each partition once (no self-join, the same shape
    as the DDoS baseline). Exact decimals, string-rendered (engine-
    portable compare)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    daily = (
        o.groupBy(
            "o_custkey", F.to_date("o_orderdate").alias("d")
        ).agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev")
        )
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.datediff(F.col("d"), F.lit("1970-01-01")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "o_custkey",
        F.date_format("d", "yyyy-MM-dd").alias("order_date"),
        F.sum("rev").over(w).cast("decimal(38,2)").cast("string").alias(
            "trailing_7d_revenue"
        ),
    )


@register(
    "rel_quality_audit",
    covers="rel:data-quality-audit rel:conditional-agg",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 45
                             THEN 0 ELSE 1 END) AS BIGINT)
                 AS qty_in_range_violations,
               CAST(SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.08
                             THEN 0 ELSE 1 END) AS BIGINT)
                 AS discount_band_violations,
               CAST(SUM(CASE WHEN l_extendedprice > 0
                             THEN 0 ELSE 1 END) AS BIGINT)
                 AS positive_price_violations,
               CAST(SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R')
                             THEN 0 ELSE 1 END) AS BIGINT)
                 AS returnflag_domain_violations,
               CAST(SUM(CASE WHEN l_shipdate IS NOT NULL
                             THEN 0 ELSE 1 END) AS BIGINT)
                 AS shipdate_present_violations
        FROM lineitem
        """,
)
def q_rel_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations audit over the fact table
    (operators/expect.py): five constraint rules compiled into ONE
    conditional-sum pass with map-side partials — rule count doesn't
    change the scan count. The quarantine() twin splits rows with the
    same Columns so counts and quarantined lanes can't drift."""
    from stream4flow_spark.operators.expect import audit

    l = load_table(spark, sf_dir, "lineitem")
    return audit(
        l,
        {
            # deliberately tight bands so the audit COUNTS something on
            # the gate data (an all-zeros audit row is a weak oracle)
            "qty_in_range": F.col("l_quantity").between(1, 45),
            "discount_band": F.col("l_discount").between(0.0, 0.08),
            "positive_price": F.col("l_extendedprice") > 0,
            "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
            "shipdate_present": F.col("l_shipdate").isNotNull(),
        },
    )


@register(
    "rel_snapshot_drift",
    covers="rel:snapshot-drift rel:single-pass-profile",
    oracle="""
        WITH prof AS (
            SELECT (user_id % 2 = 0) AS cohort_a,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   ROUND(AVG(value), 4) AS value_mean,
                   ROUND(STDDEV_SAMP(value), 4) AS value_std,
                   ROUND(CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                              AS DOUBLE) / COUNT(*), 6) AS value_null_rate,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT)
                     AS event_type_card
            FROM events GROUP BY 1
        )
        SELECT a.n_rows AS n_rows_a, b.n_rows AS n_rows_b,
               a.value_mean AS value_mean_a, b.value_mean AS value_mean_b,
               ROUND(ABS(a.value_mean - b.value_mean), 4) AS value_mean_drift,
               a.value_std AS value_std_a, b.value_std AS value_std_b,
               a.value_null_rate AS value_null_rate_a,
               b.value_null_rate AS value_null_rate_b,
               a.event_type_card AS event_type_card_a,
               b.event_type_card AS event_type_card_b
        FROM (SELECT * FROM prof WHERE cohort_a)     a
        CROSS JOIN (SELECT * FROM prof WHERE NOT cohort_a) b
        """,
)
def q_rel_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics drift between two data snapshots (here: the two
    user-parity cohorts play old/new) — the tabular data-ops check that
    catches a broken upstream export before it trains: row count, mean,
    stddev, null rate, and categorical cardinality, compared side by
    side. Scale shape: BOTH profiles come from ONE scan (aggregate
    keyed by the 2-value cohort tag, map-side partials); the compare
    joins two 1-row profiles. Complements llm_split_drift (token-level
    KL) with schema-level statistics."""
    e = load_table(spark, sf_dir, "events")
    prof = (
        e.groupBy((F.col("user_id") % 2 == 0).alias("cohort_a"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg("value"), 4).alias("value_mean"),
            F.round(F.stddev_samp("value"), 4).alias("value_std"),
            F.round(
                F.sum(F.col("value").isNull().cast("double"))
                / F.count(F.lit(1)),
                6,
            ).alias("value_null_rate"),
            F.countDistinct("event_type").alias("event_type_card"),
        )
    )
    a = prof.filter("cohort_a").drop("cohort_a")
    b = prof.filter("NOT cohort_a").drop("cohort_a")
    sel_a = a.select(*[F.col(c).alias(f"{c}_a") for c in a.columns])
    sel_b = b.select(*[F.col(c).alias(f"{c}_b") for c in b.columns])
    return sel_a.crossJoin(sel_b).select(
        "n_rows_a", "n_rows_b",
        "value_mean_a", "value_mean_b",
        F.round(F.abs(F.col("value_mean_a") - F.col("value_mean_b")), 4)
        .alias("value_mean_drift"),
        "value_std_a", "value_std_b",
        "value_null_rate_a", "value_null_rate_b",
        "event_type_card_a", "event_type_card_b",
    )


@register(
    "rel_part_cooccurrence",
    covers="rel:market-basket rel:self-join-bounded",
    oracle="""
        WITH li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
        )
        SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM pairs GROUP BY 1, 2
        HAVING COUNT(*) >= 2
        """,
)
def q_rel_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs ordered together in >= 2
    orders (the association-mining primitive behind 'frequently bought
    together'). Scale shape: the self-join keys on the ORDER (pair
    fan-out is lines²-per-order, bounded by basket size — TPC-H baskets
    are <= 7 lines; a retail-scale variant caps giant baskets exactly
    like the LSH hot-bucket guard), and the pair counts partial-
    aggregate before the exchange. Distinct (order, part) first so
    multi-line same-part orders don't inflate pair counts."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@register(
    "rel_scd2_user_state",
    covers="rel:scd2-versioning rel:window-lag rel:change-compression",
    oracle="""
        WITH o AS (
            SELECT user_id, event_id, event_type, epoch_ms(ts) AS t,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev
            FROM events
        ),
        chg AS (
            SELECT user_id, event_id, event_type, t
            FROM o WHERE prev IS NULL OR prev <> event_type
        )
        SELECT user_id, event_type,
               t AS valid_from_ms,
               COALESCE(LEAD(t) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
               ), -1) AS valid_to_ms,
               CASE WHEN LEAD(t) OVER (
                        PARTITION BY user_id ORDER BY t, event_id
                    ) IS NULL THEN 1 ELSE 0 END AS is_current
        FROM chg
        """,
)
def q_rel_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from an event log: collapse each
    user's event stream into versioned state rows — change-points only,
    with [valid_from, valid_to) validity intervals and an is_current
    flag (the warehouse staple for "what was this user's state at time
    T"; the reference stores only latest-value dashboards). Two window
    passes over the SAME (user_id, time) partitioning: a lag()
    change-point filter, then lead() to close each interval — Catalyst
    reuses the one exchange+sort for both (no second shuffle; the
    change-point filter shrinks rows between them). valid_to_ms = -1
    encodes the open current row (NULL would stringify differently per
    engine)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis("ts").alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    chg = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .drop("prev")
    )
    nxt = F.lead("t").over(w)
    return chg.select(
        "user_id",
        "event_type",
        F.col("t").alias("valid_from_ms"),
        F.coalesce(nxt, F.lit(-1)).alias("valid_to_ms"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@register(
    "rel_time_to_convert",
    covers="rel:funnel rel:bounded-percentile rel:conditional-window",
    oracle="""
        WITH s AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'signup'
                            THEN epoch_ms(ts) END) AS t_signup
            FROM events GROUP BY 1
        ),
        conv AS (
            SELECT e.user_id, s.t_signup,
                   MIN(CASE WHEN e.event_type = 'purchase'
                            AND epoch_ms(e.ts) > s.t_signup
                            THEN epoch_ms(e.ts) END) AS t_conv
            FROM events e JOIN s USING (user_id)
            WHERE s.t_signup IS NOT NULL
            GROUP BY 1, 2
        ),
        lagged AS (
            SELECT CAST(FLOOR(t_signup / 86400000.0 / 7) AS BIGINT)
                     AS cohort_7d,
                   t_conv - t_signup AS lag_ms
            FROM conv
        )
        SELECT cohort_7d,
               CAST(COUNT(*) AS BIGINT) AS n_signups,
               CAST(COUNT(lag_ms) AS BIGINT) AS n_converted,
               ROUND(quantile_cont(lag_ms, 0.5) / 3600000.0, 4) + 0.0
                 AS p50_hours,
               ROUND(quantile_cont(lag_ms, 0.9) / 3600000.0, 4) + 0.0
                 AS p90_hours
        FROM lagged GROUP BY 1
        """,
)
def q_rel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert per signup cohort: for every user who signed up,
    the lag to their first purchase AFTER the signup, rolled up per
    7-day cohort (pure ms arithmetic — no calendar/timezone
    dependence, so every engine buckets identically) with exact
    interpolated p50/p90 lag hours. The product-analytics question
    behind the funnel counts: not just HOW MANY convert, but HOW FAST.

    Plan: the two conditional mins share ONE user-keyed aggregation
    pass each (funnel pattern); percentiles come from
    operators/percentiles.grouped_exact_percentiles — aggregate state
    bounded by DISTINCT lag values per cohort, not rows, the same
    bounded-state exactness the length profile uses."""
    from stream4flow_spark.operators.percentiles import (
        grouped_exact_percentiles,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("t")
    )
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("t"))).alias(
            "t_signup"
        )
    ).filter(F.col("t_signup").isNotNull())
    conv = (
        ev.join(s, "user_id")
        .groupBy("user_id", "t_signup")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("t") > F.col("t_signup")),
                    F.col("t"),
                )
            ).alias("t_conv")
        )
    )
    lagged = conv.select(
        F.floor(F.col("t_signup") / 86400000.0 / 7)
        .cast("long")
        .alias("cohort_7d"),
        (F.col("t_conv") - F.col("t_signup")).alias("lag_ms"),
    )
    stats = grouped_exact_percentiles(
        lagged.filter(F.col("lag_ms").isNotNull()),
        group_cols=["cohort_7d"],
        value_col="lag_ms",
        percentiles={"p50_ms": 0.5, "p90_ms": 0.9},
        extra_aggs={"n_converted": F.sum("cnt").cast("long")},
    )
    counts = lagged.groupBy("cohort_7d").agg(
        F.count("*").alias("n_signups")
    )
    return counts.join(stats, "cohort_7d", "left").select(
        "cohort_7d",
        "n_signups",
        F.coalesce("n_converted", F.lit(0)).alias("n_converted"),
        (F.round(F.col("p50_ms") / 3600000.0, 4) + 0.0).alias("p50_hours"),
        (F.round(F.col("p90_ms") / 3600000.0, 4) + 0.0).alias("p90_hours"),
    )


@register(
    "rel_distinct_sketch_rollup",
    covers="rel:sketch-rollup A3",
    # rows-only by design: DataSketches HLL bytes are engine-specific —
    # no DuckDB replay exists. Correctness is carried by the property
    # tests (error <5% vs exact, daily-rollup merge == direct sketch,
    # partitioning independence) in tests/test_operators.py.
)
def q_rel_distinct_sketch_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable distinct-count sketch rollup (operators/sketches.py):
    one HLL sketch of distinct user_ids per (event_type, day),
    materialized once, then UNIONED per event_type to answer the
    arbitrary-range question from the rollup table instead of the raw
    corpus — the Druid/BigQuery sketch-column pattern on Spark's
    built-in hll_sketch_agg/hll_union_agg. At 100 TB the range query
    aggregates |groups| ~4 KB sketches, not the event stream."""
    from stream4flow_spark.operators.sketches import (
        sketch_merge,
        sketch_rollup,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    rollup = sketch_rollup(ev, ["event_type", "day"], "user_id")
    return sketch_merge(rollup, ["event_type"]).select(
        "event_type", F.col("n_distinct").cast("long").alias("n_users_est")
    )


@register(
    "rel_rolling_active_users",
    covers="rel:rolling-distinct W2 A3",
    oracle="""
        WITH pairs AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                            user_id
            FROM events
        ),
        days AS (SELECT DISTINCT day FROM pairs)
        SELECT strftime(d.day, '%Y-%m-%d') AS day,
               CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_active_7d
        FROM days d
        JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
        GROUP BY 1
        """,
)
def q_rel_rolling_active_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rolling 7-day active users per day (operators/window_agg.py
    rolling_distinct) — the DAU→WAU product metric, in the shape that
    survives 100 TB: ONE distinct collapses events to (day, user)
    pairs, each pair fans out IN-TASK to the ≤7 window days it serves
    (sequence+explode, zero join), one distinct-count per day. Shuffle
    is O(7 · active pairs), independent of raw event count — the oracle
    brute-forces the day×pairs range join instead. The HLL twin
    (operators/sketches.rolling_distinct_sketch, property-tested within
    5% of this exact result) replaces the pair fan-out with 7 daily
    sketch unions when key cardinality itself is the problem."""
    from stream4flow_spark.operators.window_agg import rolling_distinct

    ev = load_table(spark, sf_dir, "events")
    out = rolling_distinct(
        ev, "ts", "user_id", window_days=7, out_col="n_active_7d"
    )
    # DATE dtypes stringify differently across engines (date vs
    # midnight timestamp) — emit the canonical string on both sides
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_active_7d"
    )


@register(
    "rel_attribution",
    covers="rel:attribution rel:forward-fill A1",
    oracle="""
        WITH tl AS (
            SELECT user_id, event_type, value,
                   FIRST_VALUE(CASE WHEN event_type IN ('view', 'click')
                                    THEN event_type END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS ft,
                   LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                                   THEN event_type END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS lt
            FROM events
        ),
        conv AS (
            SELECT COALESCE(ft, 'none') AS ft, COALESCE(lt, 'none') AS lt,
                   CAST(value AS DECIMAL(10,2)) AS v
            FROM tl WHERE event_type = 'purchase'
        ),
        unioned AS (
            SELECT 'first_touch' AS model, ft AS touch_type, v FROM conv
            UNION ALL
            SELECT 'last_touch', lt, v FROM conv
        )
        SELECT model, touch_type,
               CAST(COUNT(*) AS BIGINT) AS n_conversions,
               CAST(CAST(SUM(v) AS DECIMAL(38,2)) AS STRING) AS revenue
        FROM unioned GROUP BY 1, 2
        """,
)
def q_rel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch conversion attribution: every purchase
    credits its revenue to the user's FIRST and MOST RECENT preceding
    touch event (view/click) — the product-analytics question behind
    every funnel. ONE per-user forward-fill window (ordered by ts with
    an event_id tiebreak) carries both the first and latest touch;
    purchases then fan out in-task to the two attribution models
    (explode of a 2-struct array, no second scan). Revenue sums in
    per-row-cast DECIMAL so the result is shuffle-order independent and
    emitted as the canonical string both engines agree on."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    touch = F.when(
        F.col("event_type").isin("view", "click"), F.col("event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tl = ev.select(
        "event_type",
        F.col("value").cast("decimal(10,2)").alias("v"),
        F.first(touch, ignorenulls=True).over(w).alias("ft"),
        F.last(touch, ignorenulls=True).over(w).alias("lt"),
    )
    conv = tl.filter(F.col("event_type") == "purchase").select(
        F.coalesce("ft", F.lit("none")).alias("ft"),
        F.coalesce("lt", F.lit("none")).alias("lt"),
        "v",
    )
    unioned = conv.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.col("ft").alias("touch_type"),
                ),
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.col("lt").alias("touch_type"),
                ),
            )
        ).alias("m"),
        "v",
    ).select("m.model", "m.touch_type", "v")
    return unioned.groupBy("model", "touch_type").agg(
        F.count("*").alias("n_conversions"),
        F.sum("v").cast("decimal(38,2)").cast("string").alias("revenue"),
    )
