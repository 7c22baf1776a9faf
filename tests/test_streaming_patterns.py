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


def test_stream_stream_interval_join_matches_batch(spark, events_dir, tmp_path):
    """view->purchase correlation per user within 30 minutes: the
    stream-stream interval join must produce exactly the batch join's
    row set (bounded source, watermarks far past the data)."""
    from airbnb_pyspark_jobs_spark.streaming.events import (
        read_event_stream,
        stream_stream_join,
    )

    views_s = read_event_stream(spark, events_dir).filter(F.col("event_type") == "view")
    buys_s = read_event_stream(spark, events_dir).filter(
        F.col("event_type") == "purchase"
    )
    joined = stream_stream_join(
        views_s, buys_s, on="user_id", within="30 minutes"
    ).select("user_id", "l_ts", "r_ts", "l_event_id", "r_event_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM ssj").collect()}

    batch = spark.read.parquet(events_dir)
    v = batch.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_event_id")
    )
    b = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("r_ts"), F.col("event_id").alias("r_event_id")
    )
    want = {
        tuple(r)
        for r in v.join(
            b,
            (F.col("user_id") == F.col("u2"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 30 minutes")),
        ).select("user_id", "l_ts", "r_ts", "l_event_id", "r_event_id").collect()
    }
    assert got, "stream-stream join emitted nothing"
    assert got == want


def test_scd2_stream_upsert_builds_versioned_dimension(spark, tmp_path):
    """Two snapshot files processed as separate micro-batches: the
    changed key gains a second version, the unchanged key keeps one
    current row — same semantics as the batch scd2_merge (q22)."""
    import os
    import time

    from airbnb_pyspark_jobs_spark.operators.scd2 import Scd2Spec
    from airbnb_pyspark_jobs_spark.streaming.dimensions import scd2_stream_upsert

    src = tmp_path / "snapshots"
    src.mkdir()
    schema = "c_custkey long, c_name string, c_acctbal double, ts timestamp"
    raw_schema = "c_custkey long, c_name string, c_acctbal double, ts string"
    snap1 = spark.createDataFrame(
        [(1, "alice", 100.0, "2026-01-01 00:00:00"), (2, "bob", 50.0, "2026-01-01 00:00:00")],
        raw_schema,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    snap1.coalesce(1).write.parquet(str(src / "f1"))
    # second snapshot: alice's balance changes, bob unchanged; arrange
    # mtimes so the file source orders f1 before f2
    snap2 = spark.createDataFrame(
        [(1, "alice", 175.0, "2026-01-02 00:00:00"), (2, "bob", 50.0, "2026-01-02 00:00:00")],
        raw_schema,
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    snap2.coalesce(1).write.parquet(str(src / "f2"))
    now = time.time()
    for root, _dirs, files in os.walk(src):
        for f in files:
            p = os.path.join(root, f)
            os.utime(p, (now - 60, now - 60) if "f1" in root else (now, now))

    spec = Scd2Spec(
        natural_key=["c_custkey"],
        tracked_cols=["c_name", "c_acctbal"],
        portable_hash=True,
        audit_col=None,
    )
    dim_path = str(tmp_path / "dim")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = scd2_stream_upsert(stream, dim_path, spec, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    dim = spark.read.parquet(dim_path)
    rows = sorted(
        (r.c_custkey, r.c_acctbal, r.is_valid) for r in dim.collect()
    )
    # alice: expired 100.0 + current 175.0; bob: single current version
    assert rows == [(1, 100.0, False), (1, 175.0, True), (2, 50.0, True)]
    cur = {r.c_custkey: r.c_acctbal for r in dim.filter("is_valid").collect()}
    assert cur == {1: 175.0, 2: 50.0}
