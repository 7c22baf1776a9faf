"""Table registry for the driver-generated testdata star schema.

Tables (one parquet file per table, see TESTDATA.md):
``region nation customer supplier part orders lineitem events documents
embeddings``.

Scale note: on a cluster these would be directories of many parquet
files (possibly partitioned); ``spark.read.parquet`` handles both. We
never infer schemas from CSV in production paths — parquet carries its
own schema and Catalyst prunes columns/pushes filters into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``events.ts`` is stored as parquet INT64 TIMESTAMP(NANOS), which
    Spark cannot read natively — we read it as long
    (``spark.sql.legacy.parquet.nanosAsLong``, runtime-settable) and
    convert to a microsecond timestamp (truncating, which matches
    DuckDB's nanos→micros read behavior).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load several testdata tables keyed by name."""
    return {n: load_table(spark, n, sf_dir) for n in names}
