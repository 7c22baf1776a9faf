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


def test_asof_forward_nearest_and_tolerance(spark):
    """merge_asof parity (round 7): forward = earliest at-or-after,
    nearest = smaller |dt| with exact ties going backward, tolerance
    nulls matches beyond the bound without dropping left rows."""
    left = spark.createDataFrame(
        [(1, _ts("10:00:00"), "L1"), (1, _ts("12:00:00"), "L2")],
        "k long, ts string, lv string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, _ts("09:00:00"), "A"),   # 1h before L1
            (1, _ts("10:30:00"), "B"),   # 30min after L1
            (1, _ts("11:30:00"), "C"),   # 30min before L2
            (1, _ts("12:30:00"), "D"),   # 30min after L2 (tie with C)
        ],
        "k long, ts string, rv string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    fwd = {
        r.lv: r.rv_asof
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert fwd == {"L1": "B", "L2": "D"}

    near = {
        r.lv: r.rv_asof
        for r in asof_join(left, right, on="k", direction="nearest").collect()
    }
    assert near["L1"] == "B"  # 30min after beats 1h before
    assert near["L2"] == "C"  # exact tie (30min both sides) -> backward

    tol = {
        r.lv: r.rv_asof
        for r in asof_join(
            left, right, on="k", direction="backward", tolerance_seconds=1800
        ).collect()
    }
    assert tol == {"L1": None, "L2": "C"}  # A is 1h back -> beyond tolerance

    tolf = {
        r.lv: r.rv_asof
        for r in asof_join(
            left, right, on="k", direction="nearest", tolerance_seconds=900
        ).collect()
    }
    assert tolf == {"L1": None, "L2": None}  # nothing within 15min

    import pytest

    with pytest.raises(ValueError):
        asof_join(left, right, on="k", direction="sideways")


def test_asof_tolerance_exact_boundary_micros(spark):
    """dt compares in exact BIGINT microseconds: a match EXACTLY at the
    tolerance boundary (with sub-second micros on both rows) must match
    — a double epoch-seconds cast loses ~2.4e-7 s and can flip it
    (ADVICE r7)."""
    left = spark.createDataFrame(
        [(1, "2026-01-01 10:00:00.000123", "L1")], "k long, ts string, lv string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, "2026-01-01 09:45:00.000123", "EXACT"),   # exactly 900 s back
            (1, "2026-01-01 09:45:00.000122", "BEYOND"),  # 900 s + 1 µs back
        ],
        "k long, ts string, rv string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.lv: r.rv_asof
        for r in asof_join(
            left, right, on="k", direction="backward", tolerance_seconds=900
        ).collect()
    }
    assert got == {"L1": "EXACT"}
    # forward symmetric: exactly at the boundary matches
    rightf = spark.createDataFrame(
        [(1, "2026-01-01 10:15:00.000123", "FEXACT")], "k long, ts string, rv string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    gotf = {
        r.lv: r.rv_asof
        for r in asof_join(
            left, rightf, on="k", direction="forward", tolerance_seconds=900
        ).collect()
    }
    assert gotf == {"L1": "FEXACT"}
    # nearest tie at ±1 µs resolution: backward wins only on EXACT ties
    rightn = spark.createDataFrame(
        [
            (1, "2026-01-01 09:59:59.999999", "B"),  # 124 µs back
            (1, "2026-01-01 10:00:00.000246", "FWD"),  # 123 µs forward
        ],
        "k long, ts string, rv string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    gotn = {
        r.lv: r.rv_asof
        for r in asof_join(left, rightn, on="k", direction="nearest").collect()
    }
    assert gotn == {"L1": "FWD"}  # 123 µs forward beats 124 µs back


def test_asof_nearest_duplicate_left_rows_safe(spark):
    """Identical left rows must each match once (the nearest path runs
    both carries over ONE frame — no self-join fan-out)."""
    left = spark.createDataFrame(
        [(1, _ts("10:00:00"), "X"), (1, _ts("10:00:00"), "X")],
        "k long, ts string, lv string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, _ts("09:00:00"), "A")], "k long, ts string, rv string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = asof_join(left, right, on="k", direction="nearest").collect()
    assert len(rows) == 2 and all(r.rv_asof == "A" for r in rows)


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


def _mk_points(spark, rows):
    return spark.createDataFrame(rows, "pid long, pts string").withColumn(
        "pts", F.col("pts").cast("timestamp")
    )


def _mk_intervals(spark, rows):
    df = spark.createDataFrame(rows, "iid long, s string, e string")
    return df.withColumn("s", F.col("s").cast("timestamp")).withColumn(
        "e", F.col("e").cast("timestamp")
    )


def test_range_join_matches_naive_cross_filter(spark):
    from airbnb_pyspark_jobs_spark.operators.asof import bucketed_range_join

    points = _mk_points(
        spark,
        [(i, f"2026-01-01 {h:02d}:{m:02d}:00") for i, (h, m) in enumerate(
            [(0, 0), (0, 30), (1, 0), (1, 59), (2, 0), (5, 17), (23, 59)]
        )],
    )
    intervals = _mk_intervals(
        spark,
        [
            (1, "2026-01-01 00:00:00", "2026-01-01 01:00:00"),  # [0,1h)
            (2, "2026-01-01 00:45:00", "2026-01-01 02:00:00"),  # crosses buckets
            (3, "2026-01-01 05:00:00", "2026-01-01 06:00:00"),
            (4, "2026-01-01 22:00:00", "2026-01-02 00:30:00"),  # multi-bucket
        ],
    )
    got = {
        (r.pid, r.iid)
        for r in bucketed_range_join(points, intervals, "pts", "s", "e").collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.crossJoin(intervals)
        .filter((F.col("pts") >= F.col("s")) & (F.col("pts") < F.col("e")))
        .collect()
    }
    assert got == naive
    # boundary semantics baked in: start inclusive, end exclusive
    assert (0, 1) in got and (2, 1) not in got and (2, 2) in got


def test_range_join_left_keeps_unmatched_points_once(spark):
    from airbnb_pyspark_jobs_spark.operators.asof import bucketed_range_join

    points = _mk_points(spark, [(1, "2026-01-01 00:10:00"), (2, "2026-01-01 09:00:00")])
    intervals = _mk_intervals(spark, [(7, "2026-01-01 00:00:00", "2026-01-01 01:00:00")])
    rows = bucketed_range_join(points, intervals, "pts", "s", "e", how="left").collect()
    assert sorted((r.pid, r.iid) for r in rows) == [(1, 7), (2, None)]


def test_range_join_extra_equi_and_validation(spark):
    import pytest

    from airbnb_pyspark_jobs_spark.operators.asof import bucketed_range_join

    points = spark.createDataFrame(
        [(1, 10, "2026-01-01 00:10:00"), (2, 99, "2026-01-01 00:20:00")],
        "pid long, pu long, pts string",
    ).withColumn("pts", F.col("pts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(7, 10, "2026-01-01 00:00:00", "2026-01-01 01:00:00")],
        "iid long, iu long, s string, e string",
    ).withColumn("s", F.col("s").cast("timestamp")).withColumn("e", F.col("e").cast("timestamp"))
    rows = bucketed_range_join(
        points, intervals, "pts", "s", "e", extra_equi=[("pu", "iu")]
    ).collect()
    assert [(r.pid, r.iid) for r in rows] == [(1, 7)]
    with pytest.raises(ValueError):
        bucketed_range_join(points, intervals, "pts", "s", "e", how="full")
    with pytest.raises(ValueError):
        bucketed_range_join(points, points, "pts", "pts", "pts")  # overlapping cols


def test_range_join_plan_is_equi_not_nested_loop(spark):
    from airbnb_pyspark_jobs_spark.operators.asof import bucketed_range_join

    points = spark.range(1000).select(
        F.col("id").alias("pid"), F.timestamp_seconds(F.col("id") * 97).alias("pts")
    )
    intervals = spark.range(200).select(
        F.col("id").alias("iid"),
        F.timestamp_seconds(F.col("id") * 450).alias("s"),
        F.timestamp_seconds(F.col("id") * 450 + 3600).alias("e"),
    )
    df = bucketed_range_join(points, intervals, "pts", "s", "e", bucket_seconds=3600)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
