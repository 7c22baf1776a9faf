"""Parquet scan/sink operators with the reference's write semantics.

Covers SURVEY §2.1 S2-S4 and S7:
- overwrite-mode parquet sink (``jobs/csv_to_parquet.py:79`` et al.)
- output-file sizing via ``maxRecordsPerFile`` (``jobs/final_fact_load.py:149``)
- the write→clearCache→re-read barrier the reference uses before
  exporting a freshly overwritten table (``jobs/final_dim_load.py:453-456``),
  formalized here as :func:`overwrite_with_barrier` using a temp-path swap
  so the read-overwrite-same-path hazard (reading a half-overwritten
  input) cannot occur.

Scale notes:
- ``maxRecordsPerFile`` bounds file sizes under AQE-coalesced writes.
- ``partition_by`` exposes hive-style partitioned layout for partition
  pruning on 100 TB tables (e.g. fact tables by date).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Lazy parquet scan (filters/projections push into the scan)."""
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink with optional file sizing and hive partitioning."""
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    max_records_per_file: int | None = None,
) -> None:
    """Dynamic partition overwrite: replace ONLY the hive partitions
    present in ``df``, leaving all others untouched.

    This is the incremental-maintenance primitive for date-partitioned
    fact tables at 100 TB: a daily backfill rewrites yesterday's
    partition(s) instead of the whole table (the reference's
    ``mode("overwrite")`` full-refresh would). Static overwrite mode
    (Spark's default) would DELETE every other partition — the conf is
    scoped to this write and restored after.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        writer = df.write.mode("overwrite")
        if max_records_per_file is not None:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        writer.partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def overwrite_with_barrier(
    df: DataFrame,
    path: str,
    max_records_per_file: int | None = None,
) -> DataFrame:
    """Safely overwrite ``path`` even when ``df``'s lineage READS ``path``.

    The reference reads an existing dimension, transforms it, and
    overwrites the same location (``jobs/final_dim_load.py:95,208``) —
    which only works because Spark materializes before deleting, and it
    still needs a manual ``clearCache`` + re-read (``:453-456``). We make
    the barrier explicit: write to a temp sibling path (full
    materialization), atomically swap directories, then return a fresh
    scan of the final path (new lineage, no stale cache).

    On a real deployment this is the job of a table format (Delta/Iceberg
    snapshot isolation); the temp-swap is the format-free equivalent.
    """
    spark = df.sparkSession
    tmp = f"{path.rstrip('/')}__tmp_{uuid.uuid4().hex[:8]}"
    write_parquet(df, tmp, mode="overwrite", max_records_per_file=max_records_per_file)
    spark.catalog.clearCache()
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)
    return spark.read.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_records_per_file: int = 1_000_000,
) -> DataFrame:
    """Small-file compaction — the maintenance pass every long-lived
    parquet table needs: streaming sinks, per-batch upserts and
    incremental loads accrete thousands of tiny files, and at 100 TB
    the scan's task-scheduling + footer-read overhead starts to
    dominate actual I/O. Rewrites ``path`` into
    ``ceil(rows / target_records_per_file)`` files via the same
    temp-path swap barrier the SCD2 overwrite uses (safe against
    readers of the old listing; a table format's OPTIMIZE is the
    transactional equivalent).

    The row count is ONE metadata-only action (parquet footer counts —
    no data scan); `coalesce` (not repartition) then avoids a shuffle:
    tasks just concatenate input files into fewer outputs.
    """
    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_records_per_file))
    return overwrite_with_barrier(df.coalesce(n_files), path)


def upsert_parquet(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key_cols: list[str],
    max_records_per_file: int | None = None,
) -> DataFrame:
    """Keyed UPSERT (MERGE: update matched, insert new) on a plain
    parquet table — the non-versioned sibling of the SCD2 merge (which
    keeps history; this keeps only the latest row per key).

    Cold start writes the source as-is. Otherwise: anti-join the target
    against the source's keys (keep unmatched), union the source, and
    rewrite through the temp-path barrier (the lineage READS ``path``).
    The rewrite-the-table cost is the honest price of format-free
    parquet; on Delta/Iceberg the same call becomes MERGE INTO. For
    hot-path upserts prefer the streaming partial-aggregate pattern
    (streaming/aggregates.py) or SCD2's partitioned joins.

    Idempotent: re-upserting the same source leaves the table
    row-identical. Returns the post-merge table (re-read from disk).
    """
    import os

    if not os.path.exists(path):
        writer = source.write.mode("overwrite")
        if max_records_per_file:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        writer.parquet(path)
        return spark.read.parquet(path)
    target = spark.read.parquet(path)
    merged = target.join(
        source.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    ).unionByName(source)
    return overwrite_with_barrier(merged, path, max_records_per_file)
