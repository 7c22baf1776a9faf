"""Streaming SCD2 dimension maintenance — the reference's batch
dimension load (``/root/reference/jobs/final_dim_load.py``, cron-driven
full reloads) reframed as a continuously-updating pipeline: snapshot
records arrive on a stream, each micro-batch is collapsed to
latest-per-key and merged into the parquet dimension with the SAME
``scd2_merge`` operator the batch path uses (one code path, two
triggers).

foreachBatch is the right primitive: SCD2 merge needs to read the
existing dimension and rewrite it — batch DataFrame semantics —
while the streaming engine supplies incremental input, checkpointed
progress and retries. Retried batches are harmless: re-merging an
identical snapshot detects zero row-hash changes, so the dimension is
rewritten byte-stable (idempotent upsert).

Scale: per micro-batch cost is one scd2_merge (natural-key-partitioned
joins, no global windows) plus a full dimension rewrite. The rewrite is
the honest cost of format-free parquet (`overwrite_with_barrier`); on a
real deployment the same ``merge_batch`` body targets Delta/Iceberg
``MERGE INTO`` and becomes an incremental write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airbnb_pyspark_jobs_spark.operators.scd2 import (
    Scd2Spec,
    scd2_initial,
    scd2_merge,
)
from airbnb_pyspark_jobs_spark.sources.parquet import overwrite_with_barrier


def latest_snapshot_per_key(
    batch: DataFrame, spec: Scd2Spec, as_of_col: str
) -> DataFrame:
    """Collapse a micro-batch to one snapshot row per natural key (the
    latest by event time, id-tie-broken) — a batch may carry several
    updates for the same key and SCD2 versions are per-merge, not
    per-event. Partitioned window on the natural key: no global sort."""
    w = Window.partitionBy(*spec.natural_key).orderBy(
        F.col(as_of_col).desc(), *[F.col(c).desc() for c in spec.tracked_cols]
    )
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_upsert_batch(
    snapshot: DataFrame, dim_path: str, spec: Scd2Spec, as_of
) -> None:
    """Merge ONE collapsed snapshot into the parquet dimension at
    ``dim_path``: cold-start ``scd2_initial`` if the dimension doesn't
    exist yet, else ``scd2_merge``, then an atomic temp-path swap.
    Idempotent under replay: re-merging an identical snapshot detects
    zero row-hash changes and rewrites the dimension byte-stable.
    Shared by :func:`scd2_stream_upsert` and the composed corpus
    pipeline (streaming/pipeline.py).

    Dimension existence is probed through the read itself (catching the
    path-not-found ``AnalysisException``), NOT ``os.path.exists`` — the
    driver's local filesystem never sees an hdfs:// or s3a:// warehouse,
    so a local-path check on a remote warehouse is always false and
    every batch would silently re-run ``scd2_initial``, discarding
    dimension history (ADVICE r8). Any other read error propagates: a
    transiently unreachable store must fail the batch, not truncate the
    dimension."""
    from pyspark.errors import AnalysisException

    spark = snapshot.sparkSession
    try:
        existing = spark.read.parquet(dim_path)
        dim = scd2_merge(existing, snapshot, spec, as_of)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
        dim = scd2_initial(snapshot, spec, as_of)
    overwrite_with_barrier(dim, dim_path)


def scd2_stream_upsert(
    snapshots: DataFrame,
    dim_path: str,
    spec: Scd2Spec,
    checkpoint: str,
    as_of_col: str = "ts",
    available_now: bool = True,
):
    """Maintain an SCD2 dimension at ``dim_path`` from a stream of
    snapshot records. Returns the started StreamingQuery.

    Each micro-batch: latest-per-key collapse → cold-start
    ``scd2_initial`` if the dimension doesn't exist yet, else
    ``scd2_merge`` (as-of = the batch's max event time) → atomic
    temp-path swap of the dimension directory.
    """

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        snap = latest_snapshot_per_key(batch_df, spec, as_of_col)
        # one tiny batch-scoped action to stamp the merge's as-of time
        as_of = snap.agg(F.max(as_of_col)).first()[0]
        scd2_upsert_batch(snap, dim_path, spec, F.lit(as_of).cast("timestamp"))

    writer = (
        snapshots.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
