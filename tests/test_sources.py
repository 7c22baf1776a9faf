"""Source/sink operator tests: typed CSV errors, parquet file sizing,
overwrite barrier on self-referencing lineage."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.sources import (
    overwrite_with_barrier,
    read_csv_typed,
    write_parquet,
)
from airbnb_pyspark_jobs_spark.sources.parquet import overwrite_partitions


def test_read_csv_typed_rejects_missing_columns(spark, tmp_path):
    p = str(tmp_path / "x.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,2\n")
    with pytest.raises(ValueError, match="absent from CSV"):
        read_csv_typed(spark, p, {"a": "int", "nope": "int"})


def test_read_csv_typed_single_project(spark, tmp_path):
    """All casts land in ONE Project over the scan (not a 48-deep chain)."""
    p = str(tmp_path / "x.csv")
    with open(p, "w") as f:
        f.write("a,b,c\n1,$2,t\n")
    df = read_csv_typed(spark, p, {"a": "int", "b": "money", "c": "bool"})
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Project") == 1
    row = df.first()
    assert (row.a, float(row.b), row.c) == (1, 2.0, True)


def test_write_parquet_max_records_per_file(spark, tmp_path):
    p = str(tmp_path / "sized")
    df = spark.range(1000).coalesce(1)
    write_parquet(df, p, max_records_per_file=100)
    files = glob.glob(os.path.join(p, "*.parquet"))
    assert len(files) == 10
    assert spark.read.parquet(p).count() == 1000


def test_overwrite_partitions_is_incremental(spark, tmp_path):
    """Dynamic partition overwrite replaces only the partitions present
    in the incoming frame — the daily-backfill primitive."""
    p = str(tmp_path / "fact")
    full = spark.createDataFrame(
        [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30), (4, "d3", 40)],
        "id long, day string, v int",
    )
    overwrite_partitions(full, p, ["day"])
    # backfill: replace ONLY day=d2 with corrected rows
    fix = spark.createDataFrame([(3, "d2", 99), (5, "d2", 100)], "id long, day string, v int")
    overwrite_partitions(fix, p, ["day"])
    got = {(r.id, r.day): r.v for r in spark.read.parquet(p).collect()}
    assert got == {(1, "d1"): 10, (2, "d1"): 20, (3, "d2"): 99, (5, "d2"): 100, (4, "d3"): 40}
    # conf restored (scoped override)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"


def test_overwrite_with_barrier_self_referencing_lineage(spark, tmp_path):
    """The read-transform-overwrite-same-path cycle the reference works
    around manually (jobs/final_dim_load.py:453-456) must be safe."""
    p = str(tmp_path / "dim")
    spark.range(10).withColumn("v", F.lit(1)).write.parquet(p)
    existing = spark.read.parquet(p)
    updated = existing.withColumn("v", F.col("v") + 1)
    result = overwrite_with_barrier(updated, p)
    assert result.count() == 10
    assert {r.v for r in result.collect()} == {2}
    # and the path really was replaced (fresh scan agrees)
    assert {r.v for r in spark.read.parquet(p).collect()} == {2}
