"""Salted join: result-equivalence with the plain join + salt spreading."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.skew import add_salt, salted_join
from airbnb_pyspark_jobs_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, "lineitem", SF_DIR)
    orders = load_table(spark, "orders", SF_DIR).select("o_orderkey", "o_orderpriority")
    big = li.select(F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice")

    plain = big.join(orders, on=["o_orderkey"]).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("s")
    ).first()
    salted = salted_join(big, orders, on=["o_orderkey"], salt_factor=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("s")
    ).first()
    assert plain.n == salted.n
    assert abs(plain.s - salted.s) < 1e-6


def test_left_join_preserves_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], "k long, v string")
    small = spark.createDataFrame([(1, "x")], "k long, w string")
    out = salted_join(big, small, on=["k"], salt_factor=4, how="left").collect()
    assert len(out) == 2
    assert {r.k: r.w for r in out} == {1: "x", 99: None}


def test_stable_salt_spreads_hot_key(spark):
    # one hot key, salt derived from a distinct column -> many salts
    hot = spark.range(1000).select(
        F.lit(7).alias("k"), F.col("id").alias("row_id")
    )
    salted = add_salt(hot, 8, stable_cols=["row_id"])
    n_salts = salted.select("__salt").distinct().count()
    assert n_salts == 8
    # deterministic across runs
    a = sorted(r["__salt"] for r in salted.collect())
    b = sorted(r["__salt"] for r in add_salt(hot, 8, stable_cols=["row_id"]).collect())
    assert a == b


def test_outer_joins_rejected(spark):
    import pytest

    big = spark.createDataFrame([(1, "a")], "k long, v string")
    small = spark.createDataFrame([(1, "x")], "k long, w string")
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(big, small, on=["k"], salt_factor=4, how=how)
