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


def test_compact_partials_preserves_totals(spark, tmp_path):
    import os

    df1 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, value double")
    df2 = spark.createDataFrame([("a", 3.0), ("c", 4.0)], "k string, value double")
    path = str(tmp_path / "rollup")
    write_partial_aggregate(df1, 0, path, ["k"], "value")
    write_partial_aggregate(df2, 1, path, ["k"], "value")

    from airbnb_pyspark_jobs_spark.streaming.aggregates import compact_partials

    before = {
        r.k: (r.n_events, r.total_value)
        for r in read_rollup(spark, path, ["k"]).collect()
    }
    assert compact_partials(spark, path, ["k"]) == 2
    dirs = [d for d in os.listdir(path) if d.startswith("batch_id=")]
    assert dirs == ["batch_id=-1"]  # one base partial left
    after = {
        r.k: (r.n_events, r.total_value)
        for r in read_rollup(spark, path, ["k"]).collect()
    }
    assert after == before == {"a": (2, 4.0), "b": (1, 2.0), "c": (1, 4.0)}

    # idempotent / no-op on an already-compacted rollup
    assert compact_partials(spark, path, ["k"]) == 0
    # and a NEW batch after compaction still merges in
    write_partial_aggregate(df1, 2, path, ["k"], "value")
    got = {
        r.k: (r.n_events, r.total_value)
        for r in read_rollup(spark, path, ["k"]).collect()
    }
    assert got["a"] == (3, 5.0)


def test_recompaction_folds_previous_base(spark, tmp_path):
    # compaction of an already-compacted rollup must FOLD the base in,
    # not clobber it (regression: history loss on second compaction)
    from airbnb_pyspark_jobs_spark.streaming.aggregates import compact_partials

    path = str(tmp_path / "rollup")
    df1 = spark.createDataFrame([("a", 1.0)], "k string, value double")
    df2 = spark.createDataFrame([("a", 2.0)], "k string, value double")
    df3 = spark.createDataFrame([("a", 4.0)], "k string, value double")
    write_partial_aggregate(df1, 0, path, ["k"], "value")
    write_partial_aggregate(df2, 1, path, ["k"], "value")
    assert compact_partials(spark, path, ["k"]) == 2
    write_partial_aggregate(df3, 2, path, ["k"], "value")
    assert compact_partials(spark, path, ["k"]) == 2  # base + batch 2
    got = read_rollup(spark, path, ["k"]).collect()[0]
    assert (got.n_events, got.total_value) == (3, 7.0)


def test_compaction_crash_recovery_from_manifest(spark, tmp_path):
    # simulate a crash AFTER the fold completed (manifest written,
    # inputs partially deleted): a re-run must finish, not refold
    import json
    import os
    import shutil

    from airbnb_pyspark_jobs_spark.streaming.aggregates import compact_partials

    path = str(tmp_path / "rollup")
    df1 = spark.createDataFrame([("a", 1.0)], "k string, value double")
    df2 = spark.createDataFrame([("a", 2.0)], "k string, value double")
    write_partial_aggregate(df1, 0, path, ["k"], "value")
    write_partial_aggregate(df2, 1, path, ["k"], "value")

    # hand-build the crashed state: complete fold in tmp + manifest,
    # one input already deleted
    merged = spark.createDataFrame([("a", 2, 3.0)], "k string, n long, total double")
    tmp = os.path.join(path, "__compact_tmp")
    merged.write.parquet(tmp)
    json.dump(["batch_id=0", "batch_id=1"], open(os.path.join(tmp, "_FOLDED.json"), "w"))
    shutil.rmtree(os.path.join(path, "batch_id=0"))

    assert compact_partials(spark, path, ["k"]) == 2  # finishes the swap
    assert sorted(d for d in os.listdir(path) if d.startswith("batch_id=")) == [
        "batch_id=-1"
    ]
    got = read_rollup(spark, path, ["k"]).collect()[0]
    assert (got.n_events, got.total_value) == (2, 3.0)


def test_kmv_stream_converges_to_batch_sketch(spark, tmp_path):
    """Per-day KMV maintained incrementally across micro-batches must
    equal the one-pass batch sketch exactly (merge closure), and a
    batch replay (simulated retry writing the same partial twice) must
    change nothing — set-union merge is idempotent where sums would
    double-count."""
    from airbnb_pyspark_jobs_spark.operators.sketches import (
        kmv_daily_sketches,
        kmv_estimate,
    )
    from airbnb_pyspark_jobs_spark.streaming.aggregates import (
        materialize_kmv_stream,
        read_kmv_rollup,
        write_partial_kmv,
    )

    k = 16
    events = load_table(spark, "events", SF_DIR)
    src = str(tmp_path / "src")
    events.repartition(2).write.mode("overwrite").parquet(src)

    rollup = str(tmp_path / "kmv")
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        materialize_kmv_stream(
            stream, rollup, "ts", "user_id", str(tmp_path / "ckpt"), k=k
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        str(r.day): (r.n_kept, r.est_distinct)
        for r in read_kmv_rollup(spark, rollup, k=k).collect()
    }
    want = {
        str(r.day): (min(r.n_distinct_hashes, k), r.est)
        for r in kmv_daily_sketches(events, "ts", "user_id", k=k)
        .withColumn("est", kmv_estimate(F.col("kmv"), k))
        .collect()
    }
    assert got == want
    # retry idempotence: re-write batch 0's partial from the FULL data
    # superset (worst-case at-least-once replay) — merge must not move
    write_partial_kmv(events, 0, rollup, "ts", "user_id", k=k)
    again = {
        str(r.day): (r.n_kept, r.est_distinct)
        for r in read_kmv_rollup(spark, rollup, k=k).collect()
    }
    assert again == got


def test_bottomk_quantile_stream_converges_to_batch_sketch(spark, tmp_path):
    """Quantile sample maintained incrementally across micro-batches
    must equal the one-pass batch sample exactly (set-union merge
    closure), estimates included; a worst-case at-least-once replay
    (full-data superset rewritten as one partial) must change
    nothing."""
    from airbnb_pyspark_jobs_spark.operators.sketches import (
        bottomk_sample_merge,
        bottomk_sample_sketches,
        sample_quantiles,
    )
    from airbnb_pyspark_jobs_spark.streaming.aggregates import (
        materialize_bottomk_stream,
        read_bottomk_sample,
        write_partial_bottomk,
    )

    k = 32
    probs = [0.25, 0.5, 0.9]
    events = load_table(spark, "events", SF_DIR)
    src = str(tmp_path / "src")
    events.repartition(2).write.mode("overwrite").parquet(src)

    rollup = str(tmp_path / "bk")
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        materialize_bottomk_stream(
            stream, rollup, "ts", "value", "event_id", str(tmp_path / "ckpt"), k=k
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = read_bottomk_sample(spark, rollup, k=k)
    got_sample = sorted((r.h, r.v) for r in streamed.collect())
    want_sample = sorted(
        (r.h, r.v)
        for r in bottomk_sample_merge(
            bottomk_sample_sketches(events, "ts", "value", "event_id", k=k), k=k
        ).collect()
    )
    assert got_sample == want_sample and len(got_sample) == k

    got_est = {r.p: r.est_value for r in sample_quantiles(streamed, probs).collect()}
    want_est = {
        r.p: r.est_value
        for r in sample_quantiles(
            bottomk_sample_merge(
                bottomk_sample_sketches(events, "ts", "value", "event_id", k=k), k=k
            ),
            probs,
        ).collect()
    }
    assert got_est == want_est

    # retry idempotence: batch 0's partial rewritten from the FULL data
    write_partial_bottomk(events, 0, rollup, "ts", "value", "event_id", k=k)
    again = sorted(
        (r.h, r.v) for r in read_bottomk_sample(spark, rollup, k=k).collect()
    )
    assert again == got_sample


def test_cms_stream_converges_to_batch_sketch(spark, tmp_path):
    """CMS counters maintained incrementally across micro-batches must
    equal the one-pass batch sketch exactly (counter addition IS the
    merge), and a RETRIED batch (same batch_id, same data) must change
    nothing — the batch-id overwrite is the idempotency mechanism for
    additive partials."""
    from airbnb_pyspark_jobs_spark.operators.sketches import (
        cms_counters,
        cms_estimates,
    )
    from airbnb_pyspark_jobs_spark.streaming.aggregates import (
        materialize_cms_stream,
        read_cms_counters,
        write_partial_cms,
    )

    d, w = 4, 32
    events = load_table(spark, "events", SF_DIR).withColumn(
        "one", F.lit(1).cast("bigint")
    )
    src = str(tmp_path / "src")
    events.repartition(2).write.mode("overwrite").parquet(src)

    sink = str(tmp_path / "cms")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        materialize_cms_stream(
            stream, sink, "event_type", "one", str(tmp_path / "ckpt"), d=d, w=w
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    merged = read_cms_counters(spark, sink)
    want = {
        (r.r, r.b): r.cnt
        for r in cms_counters(events, "event_type", "one", d=d, w=w).collect()
    }
    got = {(r.r, r.b): r.cnt for r in merged.collect()}
    assert got == want
    # estimates over the merged counters match the batch-built sketch
    keys = events.select("event_type").distinct()
    est_stream = {
        r.event_type: r.cms_est
        for r in cms_estimates(keys, merged, "event_type", d=d, w=w).collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(est_stream[k] >= exact[k] for k in exact)  # one-sided error
    # retry idempotence: re-derive ONE batch's partial from its source
    # file and overwrite the same batch_id — the merge must not move.
    # (inputFiles() order is NOT the streaming batch order, so find the
    # file->batch mapping by matching partial content.)
    import os

    batch_dirs = sorted(x for x in os.listdir(sink) if x.startswith("batch_id="))
    stored0 = {
        (r.r, r.b): r.cnt
        for r in spark.read.parquet(os.path.join(sink, batch_dirs[0])).collect()
    }
    match = None
    for f in spark.read.parquet(src).inputFiles():
        fd = spark.read.parquet(f).withColumn("one", F.lit(1).cast("bigint"))
        counts = {
            (r.r, r.b): r.cnt
            for r in cms_counters(fd, "event_type", "one", d=d, w=w).collect()
        }
        if counts == stored0:
            match = fd
            break
    assert match is not None, "no source file reproduces batch 0's partial"
    write_partial_cms(
        match, int(batch_dirs[0].split("=")[1]), sink, "event_type", "one", d=d, w=w
    )
    again = {(r.r, r.b): r.cnt for r in read_cms_counters(spark, sink).collect()}
    assert again == got


def test_cusum_stream_converges_to_batch_monitor(spark, tmp_path):
    """CUSUM monitor maintained from per-batch count partials must equal
    the batch q195 output row-for-row: daily counts are algebraic (sum
    of per-batch counts == one-pass counts regardless of batch split or
    arrival order), and everything downstream is integer arithmetic.
    A same-content partial rewrite (at-least-once retry) changes
    nothing because the partial overwrites its own directory."""
    from airbnb_pyspark_jobs_spark.plans import QUERIES
    from airbnb_pyspark_jobs_spark.streaming.aggregates import (
        materialize_cusum_stream,
        read_cusum_rollup,
        write_partial_event_counts,
    )

    events = load_table(spark, "events", SF_DIR)
    src = str(tmp_path / "src")
    events.repartition(3).write.mode("overwrite").parquet(src)

    rollup = str(tmp_path / "cusum")
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        materialize_cusum_stream(stream, rollup, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def key(df):
        return sorted(
            (r.event_type, str(r.day), r.n_events, r.target_daily, r.cusum, r.alert)
            for r in df.collect()
        )

    got = key(read_cusum_rollup(spark, rollup))
    want = key(QUERIES["q195_cusum_event_volumes"](spark, SF_DIR))
    assert got == want
    # retry idempotence: rewrite batch 0's partial from the source file
    # that PRODUCED it (identified by matching derived content — file
    # order is not batch order) — the rollup must not move
    import glob

    want0 = sorted(
        (r["event_type"], str(r["__day"]), r["n_events"])
        for r in spark.read.parquet(rollup + "/batch_id=0").collect()
    )
    for f in glob.glob(src + "/part-*.parquet"):
        batch = spark.read.parquet(f)
        counts = sorted(
            (r.event_type, str(r.d), r.n)
            for r in batch.groupBy(
                "event_type", F.to_date("ts").alias("d")
            ).agg(F.count(F.lit(1)).cast("bigint").alias("n")).collect()
        )
        if counts == want0:
            write_partial_event_counts(batch, 0, rollup)
            break
    else:
        raise AssertionError("no source file matches batch 0's partial")
    assert key(read_cusum_rollup(spark, rollup)) == got


def test_hll_stream_converges_to_batch_sketch(spark, tmp_path):
    """Per-day HLL registers maintained from per-batch partials must
    equal the one-pass batch registers exactly (max-merge closure),
    and a WORST-CASE at-least-once replay — rewriting batch 0's
    partial from the FULL data superset — must change nothing, because
    registers merge by MAX (counts would double, sets would not; this
    is the property that makes HLL the ingest-side sketch)."""
    from airbnb_pyspark_jobs_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )
    from airbnb_pyspark_jobs_spark.streaming.aggregates import (
        materialize_hll_stream,
        read_hll_rollup,
        write_partial_hll,
    )

    events = load_table(spark, "events", SF_DIR)
    src = str(tmp_path / "src")
    events.repartition(3).write.mode("overwrite").parquet(src)

    rollup = str(tmp_path / "hll")
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        materialize_hll_stream(stream, rollup, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def key(df):
        return sorted(
            (r.scope, r.n_zero_registers, r.est_distinct) for r in df.collect()
        )

    got = key(read_hll_rollup(spark, rollup))
    days = events.select(
        F.to_date("ts").cast("string").alias("scope"), "user_id"
    )
    want = key(
        hll_estimate_from_registers(
            hll_registers(days, ["scope"], "user_id", p=4), ["scope"], p=4
        )
    )
    assert got == want
    # superset replay: re-write batch 0's partial from ALL events
    write_partial_hll(events, 0, rollup)
    assert key(read_hll_rollup(spark, rollup)) == got


def test_streaming_psi_matches_batch_q251(spark, tmp_path):
    """Incremental PSI parity: freeze the reference histogram on the
    first half-window, stream the second half through TWO micro-batches
    of partial histograms, and the merged read-side PSI must equal the
    batch q251 values exactly (same edges, same numeric path)."""
    import os

    from pyspark.sql import functions as F

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from airbnb_pyspark_jobs_spark.streaming.aggregates import (
        materialize_psi_stream,
        psi_bucket_counts,
        read_psi_drift,
    )
    from airbnb_pyspark_jobs_spark.streaming.events import read_event_stream
    from tests.conftest import SF_DIR

    events = load_table(spark, "events", SF_DIR).filter(
        F.col("value").isNotNull()
    )
    st = events.agg(
        (
            F.min(F.unix_micros("ts"))
            + F.expr("(max(unix_micros(ts)) - min(unix_micros(ts))) div 2")
        ).alias("mid"),
        F.min(F.round(F.col("value") * 100).cast("bigint")).alias("mn"),
        (
            F.max(F.round(F.col("value") * 100).cast("bigint"))
            - F.min(F.round(F.col("value") * 100).cast("bigint"))
            + 1
        ).alias("ext"),
    ).collect()[0]

    ref = psi_bucket_counts(
        events.filter(F.unix_micros("ts") <= st.mid), int(st.mn), int(st.ext)
    ).select("event_type", "bucket", F.col("n"))

    src = str(tmp_path / "cur_src")
    events.filter(F.unix_micros("ts") > st.mid).repartition(2).write.parquet(src)
    part_dir = str(tmp_path / "psi_partials")
    q = (
        materialize_psi_stream(
            read_event_stream(spark, src, max_files_per_trigger=1),
            part_dir,
            str(tmp_path / "ckpt_psi"),
            int(st.mn),
            int(st.ext),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(os.listdir(part_dir)) >= 2, "expected >= 2 partial dirs"

    got = {
        r.event_type: (r.n_ref, r.n_cur, r.psi)
        for r in read_psi_drift(spark, part_dir, ref).collect()
    }
    want = {
        r.event_type: (r.n_ref, r.n_cur, r.psi)
        for r in QUERIES["q251_psi_drift"](spark, SF_DIR).collect()
    }
    assert got == want


def test_streaming_psi_counts_below_range_values(spark, tmp_path):
    """Downward drift must be VISIBLE: values below the frozen mn_cents
    clamp into bucket 0 (mirroring the least(B-1) top clamp), so they
    survive read_psi_drift's 0..B-1 grid join — n_cur counts every row
    and the PSI moves. A negative bucket would silently vanish."""
    import os

    from pyspark.sql import functions as F

    from airbnb_pyspark_jobs_spark.streaming.aggregates import (
        PARTIAL_DIRNAME,
        psi_bucket_counts,
        read_psi_drift,
    )

    # frozen range [mn, mn+ext) = cents [100, 200), 10 buckets of 10c
    mn, ext = 100, 100
    ref = spark.createDataFrame(
        [("a", b, 10) for b in range(10)], "event_type string, bucket bigint, n long"
    )
    # current window: ALL values below the frozen range (downward shift)
    cur = spark.createDataFrame(
        [("a", 0.05 * i) for i in range(1, 9)], "event_type string, value double"
    )
    hist = psi_bucket_counts(cur, mn, ext).collect()
    assert all(0 <= r.bucket <= 9 for r in hist), hist
    # 0.05..0.40 -> cents 5..40, all < mn -> every row clamps to bucket 0
    assert {(r.bucket, r.n) for r in hist} == {(0, 8)}
    part_dir = str(tmp_path / "psi_low")
    psi_bucket_counts(cur, mn, ext).write.mode("overwrite").parquet(
        os.path.join(part_dir, PARTIAL_DIRNAME.format(n=0))
    )
    out = read_psi_drift(spark, part_dir, ref).collect()
    assert len(out) == 1 and out[0].n_cur == 8  # nothing dropped
    assert out[0].psi > 0.25  # well past the standard major-shift bar


def test_streaming_fingerprint_spectrum_equals_batch(spark, tmp_path):
    """Merged per-batch fingerprint partials == the one-shot q322
    spectrum over the same corpus (fingerprinting is per-row, counts
    are additive)."""
    import os

    from pyspark.sql import functions as F

    from airbnb_pyspark_jobs_spark.operators.multimodal import audio_fingerprints
    from airbnb_pyspark_jobs_spark.streaming.aggregates import (
        materialize_fingerprint_spectrum,
        read_rollup,
    )

    rows = [
        (i, ("the quick brown fox %d " % i) * (3 + i % 4)) for i in range(30)
    ]
    src = str(tmp_path / "src")
    for lo in (0, 10, 20):  # three source files -> three micro-batches
        spark.createDataFrame(
            rows[lo : lo + 10], "media_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("media_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("media_id", F.encode("text", "UTF-8").alias("payload"))
    )
    path, ckpt = str(tmp_path / "spec"), str(tmp_path / "ckpt")
    q = (
        materialize_fingerprint_spectrum(stream, path, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert len([d for d in os.listdir(path) if d.startswith("batch_id=")]) == 3

    merged = {
        r.fingerprint: (r.n_events, r.total_value)
        for r in read_rollup(spark, path, ["fingerprint"]).collect()
    }
    whole = spark.createDataFrame(rows, "media_id long, text string").select(
        "media_id", F.encode("text", "UTF-8").alias("payload")
    )
    expected = {
        r.fingerprint: (r.n, float(r.tb))
        for r in audio_fingerprints(whole)
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_bytes").cast("double")).alias("tb"),
        )
        .collect()
    }
    assert merged == expected


def test_compact_partials_before_batch_excludes_running_batch(spark, tmp_path):
    """before_batch restricts the fold to committed batches: inside
    foreachBatch(N) only batch_id < N may fold, else a crash-replay of
    batch N would see its own output through the base (VERDICT r8 #2)."""
    import os

    from airbnb_pyspark_jobs_spark.streaming.aggregates import compact_partials

    path = str(tmp_path / "rollup")
    for bid, v in ((0, 1.0), (1, 2.0), (2, 4.0)):
        write_partial_aggregate(
            spark.createDataFrame([("a", v)], "k string, value double"),
            bid,
            path,
            ["k"],
            "value",
        )
    assert compact_partials(spark, path, ["k"], before_batch=2) == 2
    assert sorted(
        d for d in os.listdir(path) if d.startswith("batch_id=")
    ) == ["batch_id=-1", "batch_id=2"]
    got = read_rollup(spark, path, ["k"]).collect()[0]
    assert (got.n_events, got.total_value) == (3, 7.0)
    # a reader pruning to batch_id < 2 (batch 2's own replay view) sees
    # exactly the committed history
    import pyspark.sql.functions as F

    seen = (
        spark.read.option("basePath", path)
        .parquet(path)
        .filter(F.col("batch_id") < 2)
        .agg(F.sum("total").alias("t"))
        .first()["t"]
    )
    assert seen == 3.0


def test_streaming_good_turing_equals_batch(spark, tmp_path):
    """q327's streaming twin: bigram-count partials written per batch
    (idempotent batch_id dirs), read-side GT equals the batch operator
    over the union — before AND after compaction, and after a replay."""
    import os

    from airbnb_pyspark_jobs_spark.operators.corpus import good_turing_bigram_mass
    from airbnb_pyspark_jobs_spark.streaming.aggregates import (
        compact_bigram_partials,
        read_good_turing,
        write_bigram_partial,
    )

    path = str(tmp_path / "gt")
    batches = [
        [(1, "a b c a b", "s1"), (2, "x y", "s2")],
        [(3, "a b c", "s1"), (4, "x y x y z", "s2")],
        [(5, "c a b c", "s1")],
    ]
    schema = "doc_id long, text string, source string"
    for bid, rows in enumerate(batches):
        write_bigram_partial(spark.createDataFrame(rows, schema), bid, path)

    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], schema
    )
    want = sorted(
        tuple(r) for r in good_turing_bigram_mass(all_docs).collect()
    )
    got = lambda: sorted(  # noqa: E731
        tuple(r) for r in read_good_turing(spark, path).collect()
    )
    assert got() == want

    # replay batch 1 (foreachBatch retry): byte-stable, still equal
    write_bigram_partial(spark.createDataFrame(batches[1], schema), 1, path)
    assert got() == want

    # compact: one base dir, identical read
    assert compact_bigram_partials(spark, path) == 3
    dirs = [d for d in os.listdir(path) if d.startswith("batch_id=")]
    assert dirs == ["batch_id=-1"]
    assert got() == want

    # the stream continues after compaction; new hapax shifts N1
    write_bigram_partial(
        spark.createDataFrame([(6, "q r", "s2")], schema), 3, path
    )
    all2 = spark.createDataFrame(
        [r for b in batches for r in b] + [(6, "q r", "s2")], schema
    )
    want2 = sorted(tuple(r) for r in good_turing_bigram_mass(all2).collect())
    assert got() == want2
