"""Streaming surface tests: batch/stream parity for windowed aggs, keyed
dedup with bounded state, session windows. All via availableNow trigger
to a memory sink (deterministic, finite)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.windows import tumbling_agg
from airbnb_pyspark_jobs_spark.sources.registry import load_table
from airbnb_pyspark_jobs_spark.streaming.events import (
    read_event_stream,
    streaming_dedupe,
    streaming_session_agg,
    streaming_tumbling_agg,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events re-staged as a parquet DIRECTORY (file streams need dirs),
    with ts already converted from nanos."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, "events", SF_DIR).write.mode("overwrite").parquet(path)
    return path


def _run_to_memory(stream_df, name, tmp_path, output_mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_tumbling_matches_batch(spark, events_dir, tmp_path):
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    agg = streaming_tumbling_agg(stream, "1 hour", watermark="2 hours")
    _run_to_memory(agg, "tumbling", tmp_path, output_mode="append")
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM tumbling").collect()
    }

    batch = tumbling_agg(
        spark.read.parquet(events_dir),
        "1 hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events")],
    )
    want = {
        (r.window_start, r.event_type): r.n_events for r in batch.collect()
    }
    # append mode with availableNow emits only windows closed by the final
    # watermark; every emitted window must match the batch result, and
    # the vast majority of windows must have been emitted.
    assert got, "no windows emitted"
    for k, v in got.items():
        assert want.get(k) == v, f"window {k}: stream={v} batch={want.get(k)}"
    assert len(got) >= len(want) * 0.9


def test_streaming_dedupe_matches_batch_keyed_dedupe(spark, events_dir, tmp_path):
    from airbnb_pyspark_jobs_spark.operators.windows import keyed_dedupe

    stream = read_event_stream(spark, events_dir)
    # replay the same file content by unioning the stream with itself —
    # every event_id arrives (at least) twice within the watermark.
    doubled = stream.union(stream)
    dedup = streaming_dedupe(doubled, keys=["event_id"], watermark="10 minutes")
    _run_to_memory(dedup, "dedup", tmp_path, output_mode="append")
    got = {
        tuple(r) for r in spark.sql(
            "SELECT event_id, ts, user_id, event_type, value FROM dedup"
        ).collect()
    }
    # batch twin (q64's operator) over the same doubled input: with exact
    # replays, first-arrived == first-by-event-time, so the FULL ROW SETS
    # must be identical, not just the counts.
    batch_src = spark.read.parquet(events_dir)
    want = {
        tuple(r)
        for r in keyed_dedupe(
            batch_src.union(batch_src), keys=["event_id"], order_by=["ts"]
        ).select("event_id", "ts", "user_id", "event_type", "value").collect()
    }
    assert len(got) == batch_src.count()
    assert got == want


def test_streaming_session_window_runs(spark, events_dir, tmp_path):
    stream = read_event_stream(spark, events_dir)
    sess = streaming_session_agg(stream, gap="30 minutes", watermark="2 hours")
    _run_to_memory(sess, "sessions", tmp_path, output_mode="append")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert rows, "no sessions emitted"
    assert all(r.session_end > r.session_start for r in rows)
    assert all(r.n_events >= 1 for r in rows)
