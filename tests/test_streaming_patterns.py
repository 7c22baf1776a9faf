"""Stream-static enrichment and foreachBatch sink patterns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.sources.registry import load_table
from airbnb_pyspark_jobs_spark.streaming.events import (
    read_event_stream,
    stream_static_enrich,
    write_stream_foreach_batch,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("patterns") / "events")
    load_table(spark, "events", SF_DIR).write.mode("overwrite").parquet(path)
    return path


def test_stream_static_enrich(spark, events_dir, tmp_path):
    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("signup", 3.0), ("view", 0.5), ("error", 0.0)],
        "event_type string, weight double",
    )
    stream = read_event_stream(spark, events_dir)
    enriched = stream_static_enrich(stream, dim, on="event_type")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_e"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT count(*) n, count(weight) w FROM enriched").first()
    src_n = spark.read.parquet(events_dir).count()
    assert out.n == src_n
    assert out.w == src_n  # every event type matched the dim


def test_foreach_batch_sink(spark, events_dir, tmp_path):
    out_path = str(tmp_path / "out")
    stream = read_event_stream(spark, events_dir, max_files_per_trigger=1)
    q = write_stream_foreach_batch(
        stream, out_path, checkpoint=str(tmp_path / "ckpt_fb")
    )
    q.awaitTermination(120)
    written = spark.read.parquet(out_path)
    assert written.count() == spark.read.parquet(events_dir).count()
    # micro-batch provenance captured
    n_batches = written.select("__batch_id").distinct().count()
    assert n_batches >= 1
