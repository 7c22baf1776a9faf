"""Bucketed-join test: joining two tables bucketed on the join key must
produce a plan with NO shuffle (Exchange) — the co-location evidence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.sources.bucketed import read_table, write_bucketed
from airbnb_pyspark_jobs_spark.sources.registry import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, "lineitem", SF_DIR)
    orders = load_table(spark, "orders", SF_DIR)
    write_bucketed(
        li.select("l_orderkey", "l_extendedprice"), "b_lineitem",
        ["l_orderkey"], 8, sort_cols=["l_orderkey"],
    )
    write_bucketed(
        orders.select("o_orderkey", "o_custkey"), "b_orders",
        ["o_orderkey"], 8, sort_cols=["o_orderkey"],
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, ot = bucketed_tables
    li, orders = read_table(spark, lt), read_table(spark, ot)
    # disable auto-broadcast so the join would OTHERWISE shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        joined.write.format("noop").mode("overwrite").save()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        # and it's correct
        n = joined.count()
        plain = load_table(spark, "lineitem", SF_DIR).join(
            load_table(spark, "orders", SF_DIR),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert n == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(50 * 1024 * 1024))
