"""Structured Streaming operators for the events table.

The reference is batch-only (SURVEY §2.9); this module adds the
streaming surface the north star asks for, built ENTIRELY on native
Structured Streaming primitives (no custom state stores):

- :func:`read_event_stream` — file-source stream with explicit schema
  (file streams cannot infer), rate-limited via ``maxFilesPerTrigger``;
- :func:`streaming_tumbling_agg` — watermarked tumbling windows,
  REUSING the batch ``tumbling_agg`` operator (batch/stream parity is
  a test invariant);
- :func:`streaming_dedupe` — ``dropDuplicatesWithinWatermark`` keyed
  dedup (state auto-expires past the watermark — bounded memory at
  100 TB/day event volumes);
- :func:`streaming_session_agg` — native ``session_window`` gap
  sessions.

Scale notes: state size is bounded by (watermark horizon × key
cardinality); shuffle partitioning of stateful ops is fixed at the
first run by ``spark.sql.shuffle.partitions`` — size it to the
expected executor count before the first checkpoint is written.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENT_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream (parquet directory) with explicit schema."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_tumbling_agg(
    stream: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (append-mode eligible)."""
    from airbnb_pyspark_jobs_spark.operators.windows import tumbling_agg

    group_cols = group_cols if group_cols is not None else ["event_type"]
    aggs = aggs if aggs is not None else [F.count(F.lit(1)).alias("n_events")]
    return tumbling_agg(
        stream.withWatermark(ts_col, watermark), duration, group_cols, aggs, ts_col
    )


def streaming_dedupe(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Keyed dedup with watermark-bounded state."""
    keys = keys if keys is not None else ["event_id"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a stream with a (small) static
    dimension. The static side is broadcast per micro-batch — no
    stateful join, no watermark needed; the canonical pattern for
    dimension lookups in a pipeline (stream-STREAM joins need watermarks
    on both sides instead)."""
    return stream.join(F.broadcast(dim), on=on, how=how)


def write_stream_foreach_batch(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
):
    """foreachBatch parquet sink: gives each micro-batch a deterministic
    batch_id and full batch-level DataFrame API (dedup, merge, multi-
    sink) — the escape hatch when the built-in file sink's append-only
    contract isn't enough. Returns the started StreamingQuery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("__batch_id", F.lit(batch_id)).write.mode(mode).parquet(path)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_session_agg(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Native session windows (gap-based) per user."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    within: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    ts_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Stream-STREAM equi-join with an event-time interval bound —
    the missing half of the join surface next to stream_static_enrich.

    Both sides are watermarked and the join condition carries a time
    range (right.ts in [left.ts, left.ts + within]), which is what lets
    Spark EXPIRE join state: without the interval, both sides' state
    grows forever. State per side ≈ watermark horizon × arrival rate.
    Columns are disambiguated with `l_`/`r_` prefixes (both sides carry
    event columns). Inner joins emit as matches arrive; outer variants
    emit nulls only after the watermark passes.
    """
    lp = left.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (on, ts_col)],
    ).withWatermark("l_ts", left_watermark)
    rp = right.select(
        F.col(on).alias("__k2"),
        F.col(ts_col).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (on, ts_col)],
    ).withWatermark("r_ts", right_watermark)
    cond = (
        (F.col("__k") == F.col("__k2"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}"))
    )
    return (
        lp.join(rp, on=cond, how=how)
        .withColumnRenamed("__k", on)
        .drop("__k2")
    )
