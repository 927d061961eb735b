"""Bucketed-table plan guarantees: the write-once/join-free contract."""

from __future__ import annotations

import pytest

from stream4flow_spark.sources.bucketing import read_bucketed, write_bucketed
from stream4flow_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketed-warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{loc}'")
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    write_bucketed(
        li, "bktest.lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    write_bucketed(
        o, "bktest.orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    yield "bktest.lineitem_b", "bktest.orders_b"
    spark.sql("DROP DATABASE bktest CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Equi-join of two tables bucketed on the join key with equal bucket
    counts must read co-located buckets — no Exchange on either side.
    Broadcast is disabled for the assertion: at test scale the planner
    prefers broadcasting the tiny side (also exchange-free, but that path
    proves nothing about the bucket layout); at the scale bucketing is
    FOR, neither fact side is broadcastable and the shuffle-free
    sort-merge below is the plan that matters."""
    li_t, o_t = bucketed_tables
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = read_bucketed(spark, li_t)
        o = read_bucketed(spark, o_t)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_orderdate", "l_extendedprice"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        # (the SMJ keeps its in-task Sort: a bucket spanning several
        # files has no global order guarantee, so Spark re-sorts within
        # the task — cheap and exchange-free, unlike the shuffle)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key aggregates within buckets — no shuffle."""
    from pyspark.sql import functions as F

    li_t, _ = bucketed_tables
    li = read_bucketed(spark, li_t)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_unbucketed_join_does_exchange(spark):
    """Control: the same join from plain parquet shuffles both sides —
    the bucket layout, not AQE luck, is what removed the exchanges."""
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "o_orderdate"
    )
    plan = joined._jdf.queryExecution().toString()
    assert "Exchange" in plan
