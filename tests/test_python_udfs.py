"""UDTF and grouped-agg Pandas UDF surfaces."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pii_spans_udtf_offsets_and_lateral_join(spark):
    from airbnb_pyspark_jobs_spark.functions.python_udfs import PiiSpansUDTF

    text = "mail a@b.com or call +1 (555) 123-4567 from 10.0.0.1"
    # direct table-function call
    rows = PiiSpansUDTF(F.lit(text)).collect()
    got = {(r.span_type, r.excerpt) for r in rows}
    assert ("email", "a@b.com") in got
    assert any(t == "phone" for t, _ in got)
    assert ("ip", "10.0.0.1") in got
    # offsets point at the real spans
    for r in rows:
        assert text[r.start : r.end] == r.excerpt
    # per-row expansion over a DataFrame via lateralJoin
    docs = spark.createDataFrame(
        [(1, "x@y.io wrote"), (2, "no pii here"), (3, None)], "id long, text string"
    )
    out = docs.lateralJoin(PiiSpansUDTF(F.col("text").outer())).collect()
    assert [(r.id, r.span_type, r.excerpt) for r in out] == [(1, "email", "x@y.io")]


def test_weighted_mean_udaf_matches_builtin(spark):
    from airbnb_pyspark_jobs_spark.functions.python_udfs import weighted_mean_udaf

    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0)],
        "g string, v double, w double",
    )
    got = {
        r.g: r.wm
        for r in df.groupBy("g").agg(weighted_mean_udaf("v", "w").alias("wm")).collect()
    }
    want = {
        r.g: r.wm
        for r in df.groupBy("g")
        .agg((F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("wm"))
        .collect()
    }
    assert got == want == {"a": 17.5, "b": 5.0}
