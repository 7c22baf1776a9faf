"""Exactly-once streaming rollups: partials accumulate across
micro-batches, merge to batch ground truth, and batch retries are
idempotent (overwrite, not double-count)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.sources.registry import load_table
from airbnb_pyspark_jobs_spark.streaming.aggregates import (
    materialize_rollup_stream,
    read_rollup,
    write_partial_aggregate,
)
from airbnb_pyspark_jobs_spark.streaming.events import read_event_stream
from tests.conftest import SF_DIR


def test_rollup_converges_to_batch_ground_truth(spark, tmp_path):
    events = load_table(spark, "events", SF_DIR)
    src = str(tmp_path / "src")
    events.repartition(2).write.mode("overwrite").parquet(src)

    rollup = str(tmp_path / "rollup")
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        materialize_rollup_stream(
            stream, rollup, ["event_type"], "value", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.event_type: (r.n_events, round(r.total_value, 2))
        for r in read_rollup(spark, rollup, ["event_type"]).collect()
    }
    want = {
        r.event_type: (r.n, round(r.total, 2))
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want
    # really incremental: one partial dir per micro-batch
    import os

    parts = [d for d in os.listdir(rollup) if d.startswith("batch_id=")]
    assert len(parts) == 2


def test_partial_rewrite_is_idempotent(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "k string, value double"
    )
    path = str(tmp_path / "rollup")
    write_partial_aggregate(df, 0, path, ["k"], "value")
    write_partial_aggregate(df, 0, path, ["k"], "value")  # the retry
    got = {
        r.k: (r.n_events, r.total_value)
        for r in read_rollup(spark, path, ["k"]).collect()
    }
    assert got == {"a": (2, 3.0), "b": (1, 10.0)}
