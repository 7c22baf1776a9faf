"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact⨝fact or fact⨝big-dim join is the
shuffle. Writing both sides bucketed BY THE JOIN KEY with the same
bucket count lets Spark's sort-merge join read matching buckets
directly — zero Exchange in the plan (verified in tests).

Usage pattern (ETL-side): bucket the big tables once at ingestion; every
downstream join on the bucket key is then shuffle-free. This is the
format-free equivalent of the reference's manual
``repartition(100, "listing_id")`` (jobs/final_fact_load.py:44), made
durable across jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
