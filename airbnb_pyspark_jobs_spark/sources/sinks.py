"""Pluggable warehouse sinks (SURVEY §2.1 S5).

The reference exports every dim/fact to BigQuery through the
spark-bigquery connector with a temp GCS bucket
(``jobs/final_dim_load.py:211-215``, ``jobs/final_fact_load.py:153-161``
in /root/reference). This module abstracts "write the final table to the
warehouse" behind one interface so pipelines are sink-agnostic:

- :class:`ParquetWarehouseSink` — local/object-store parquet layout
  (the default in this environment);
- :class:`BigQueryWarehouseSink` — the connector path, import-gated: it
  raises a clear error unless the spark-bigquery connector jar is on the
  classpath (not available in this container), with the exact options
  the reference uses (table, temporaryGcsBucket, maxParallelism).

Every sink takes the same (df, table) call; writes are overwrite-mode to
match the reference's full-refresh semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol

from pyspark.sql import DataFrame

from airbnb_pyspark_jobs_spark.sources.parquet import write_parquet


class WarehouseSink(Protocol):
    def write(self, df: DataFrame, table: str) -> None: ...


@dataclass(frozen=True)
class ParquetWarehouseSink:
    """Parquet warehouse: one directory per table under ``root``."""

    root: str
    max_records_per_file: int | None = 100_000  # reference fact sizing
    partition_by: tuple[str, ...] = ()

    def write(self, df: DataFrame, table: str) -> None:
        write_parquet(
            df,
            f"{self.root.rstrip('/')}/{table}",
            mode="overwrite",
            max_records_per_file=self.max_records_per_file,
            partition_by=list(self.partition_by) or None,
        )


@dataclass(frozen=True)
class BigQueryWarehouseSink:
    """BigQuery via the spark-bigquery connector (reference S5 options).

    Requires the connector jar (``--packages
    com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:...``);
    raises a clear error when absent so pipelines fail fast, not deep in
    a py4j stack.
    """

    dataset: str
    temporary_gcs_bucket: str
    max_parallelism: int | None = 10

    def write(self, df: DataFrame, table: str) -> None:
        jvm_has_connector = True
        try:
            writer = df.write.format("bigquery")
            writer = writer.option("table", f"{self.dataset}.{table}")
            writer = writer.option("temporaryGcsBucket", self.temporary_gcs_bucket)
            if self.max_parallelism is not None:
                writer = writer.option("maxParallelism", self.max_parallelism)
            writer.mode("overwrite").save()
        except Exception as e:  # connector missing → actionable message
            if "bigquery" in str(e).lower() or "ClassNotFound" in str(e):
                jvm_has_connector = False
            if not jvm_has_connector:
                raise RuntimeError(
                    "spark-bigquery connector not on the classpath; add the "
                    "connector package or use ParquetWarehouseSink"
                ) from e
            raise
