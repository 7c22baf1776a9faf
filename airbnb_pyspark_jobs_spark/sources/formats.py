"""Additional columnar/row formats: ORC and JSON-lines.

The reference reads CSV and writes Parquet/BigQuery only; these round
out the I/O surface with Spark's other built-in formats. Design rules
match the staging layer (sources/csv.py):

- **Schemas are always explicit on read.** Inference means an extra
  full pass over the data (JSON) and types that drift with the sample —
  both wrong at 100 TB. ``read_jsonl`` therefore REQUIRES a schema.
- **ORC is a first-class columnar alternative**: predicate pushdown and
  column pruning reach the ORC scan exactly like Parquet (asserted in
  tests); use it when the surrounding warehouse is ORC-native (Hive).
- **JSON-lines is an interchange format, not a warehouse format**: no
  column pruning at the byte level (every row is parsed whole) — stage
  JSONL into Parquet/ORC before heavy querying; ``jsonl_to_parquet``
  is that one-hop staging step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    timestamp_format: str | None = None,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Newline-delimited JSON with an EXPLICIT schema (required: schema
    inference is a full extra pass and drifts with sampling at scale).
    ``mode`` defaults to FAILFAST — silent PERMISSIVE null-filling hides
    corrupt rows; pass 'PERMISSIVE' plus a ``_corrupt_record`` column in
    the schema to quarantine instead."""
    reader = spark.read.schema(schema).option("mode", mode)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
) -> None:
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def jsonl_to_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    schema: T.StructType,
    mode: str = "overwrite",
) -> None:
    """One-hop staging: parse JSONL once (explicit schema), land
    columnar. The same shape as the reference's csv_to_parquet staging
    jobs — downstream queries then get pruning + pushdown for free."""
    read_jsonl(spark, src, schema).write.mode(mode).parquet(dest)
