"""As-of join semantics: at-or-before matching, null when no prior row,
per-key isolation — and the one-shuffle plan invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.asof import asof_join


def _ts(s):
    return f"2026-01-01 {s}"


def test_asof_matches_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts("10:00:00"), "L1"), (1, _ts("12:00:00"), "L2"), (2, _ts("09:00:00"), "L3")],
        "k long, ts string, lv string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, _ts("09:00:00"), "A"),
            (1, _ts("10:00:00"), "B"),  # equal ts -> matches L1
            (1, _ts("11:30:00"), "C"),
            (1, _ts("12:30:00"), "D"),  # after L2 -> never matched
            (2, _ts("09:30:00"), "E"),  # after L3 -> k=2 has no prior
        ],
        "k long, ts string, rv string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.lv: (r.rv_asof, r.ts_asof) for r in asof_join(left, right, on="k").collect()}
    assert out["L1"][0] == "B"  # at-or-before includes equal ts
    assert out["L2"][0] == "C"  # latest prior, not just any prior
    assert out["L3"] == (None, None)  # no prior right row -> nulls
    assert len(out) == 3  # every left row survives (left semantics)


def test_asof_plan_has_single_shuffle(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("lv"),
    )
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        F.col("id").alias("rv"),
    )
    df = asof_join(left, right, on="k")
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one Exchange for the window partitioning; the union must not add
    # per-side shuffles (hashpartitioning appears once)
    assert plan.count("Exchange hashpartitioning") == 1
    assert df.count() == 100
