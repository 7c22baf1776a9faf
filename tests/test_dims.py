"""Dimension builders: ranged (distributed) date spine must equal the
explode-based one; location dim key format."""

from __future__ import annotations

from airbnb_pyspark_jobs_spark.operators.dims import (
    date_dimension,
    date_dimension_ranged,
)


def test_ranged_spine_equals_exploded_spine(spark):
    a = date_dimension(spark, "2019-12-25", "2020-03-05")
    b = date_dimension_ranged(spark, "2019-12-25", "2020-03-05")
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    assert len(ra) == 72  # inclusive span incl. leap day 2020-02-29
    # distributed generation really is multi-partition
    assert b.rdd.getNumPartitions() > 1


def test_spine_attributes(spark):
    rows = {str(r.date_id): r for r in date_dimension(spark, "2024-02-28", "2024-03-02").collect()}
    assert rows["2024-02-29"].day_name == "Thursday"  # leap day exists
    assert rows["2024-03-02"].is_weekend  # Saturday
    assert rows["2024-02-29"].quarter == 1
