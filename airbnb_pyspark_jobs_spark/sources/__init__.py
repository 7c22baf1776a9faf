"""Sources & sinks: typed CSV ingestion, parquet scan/sink, table registry."""

from airbnb_pyspark_jobs_spark.sources.csv import read_csv_typed
from airbnb_pyspark_jobs_spark.sources.parquet import (
    read_parquet,
    write_parquet,
    overwrite_with_barrier,
)
from airbnb_pyspark_jobs_spark.sources.registry import TABLES, load_table, load_tables

__all__ = [
    "read_csv_typed",
    "read_parquet",
    "write_parquet",
    "overwrite_with_barrier",
    "TABLES",
    "load_table",
    "load_tables",
]
