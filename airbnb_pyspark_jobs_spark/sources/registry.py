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

    ``events.ts`` is stored as parquet INT64 TIMESTAMP(NANOS). How Spark
    reads that is version-dependent, so we branch on the ACTUAL dtype
    after the read rather than assuming one Spark behavior:

    - Spark <= 4.0: nanos timestamps are unreadable unless
      ``spark.sql.legacy.parquet.nanosAsLong=true`` (runtime-settable) —
      we set it, read ``ts`` as long nanos, and truncate to a
      microsecond timestamp.
    - Spark >= 4.1: the legacy conf is ignored and nanos read natively
      as ``TimestampNTZType`` (already truncated to micros) — cast to
      ``TimestampType``; with the session timezone pinned to UTC that
      cast is an identity on the wall-clock value.

    Both branches yield ``TimestampType`` microseconds, matching
    DuckDB's nanos->micros read behavior (truncation), so oracle SQL
    needs no version awareness.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        try:  # harmless no-op on Spark >= 4.1 (conf ignored there)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if isinstance(ts_type, T.TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df  # already TimestampType
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load several testdata tables keyed by name."""
    return {n: load_table(spark, n, sf_dir) for n in names}
