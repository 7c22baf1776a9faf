"""ORC + JSON-lines round trips, explicit-schema JSON parsing, and the
ORC pushdown/pruning invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbnb_pyspark_jobs_spark.sources.formats import (
    jsonl_to_parquet,
    read_jsonl,
    read_orc,
    write_jsonl,
    write_orc,
)
from airbnb_pyspark_jobs_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_orc_round_trip_preserves_schema_and_rows(spark, tmp_path):
    src = load_table(spark, "customer", SF_DIR)
    path = str(tmp_path / "customer_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    path = str(tmp_path / "orders_orc")
    write_orc(load_table(spark, "orders", SF_DIR), path)
    df = read_orc(spark, path).filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_totalprice"
    )
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderpriority" in plan.split("PushedFilters")[1][:200]
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "o_orderkey" in read_schema and "o_comment" not in read_schema


def test_jsonl_round_trip_with_explicit_schema(spark, tmp_path):
    src = load_table(spark, "nation", SF_DIR)
    path = str(tmp_path / "nation_jsonl")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, src.schema)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_jsonl_failfast_on_corrupt_rows(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text('{"a": 1}\n{"a": "not-an-int"}\n')
    schema = T.StructType([T.StructField("a", T.LongType())])
    with pytest.raises(Exception):
        read_jsonl(spark, str(p), schema).collect()
    # PERMISSIVE + corrupt-record column quarantines instead
    qschema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("_corrupt_record", T.StringType())]
    )
    rows = read_jsonl(spark, str(p), qschema, mode="PERMISSIVE").collect()
    assert len(rows) == 2
    assert sum(1 for r in rows if r._corrupt_record is not None) == 1


def test_jsonl_to_parquet_staging(spark, tmp_path):
    src = load_table(spark, "region", SF_DIR)
    jsrc = str(tmp_path / "region_jsonl")
    dest = str(tmp_path / "region_parquet")
    write_jsonl(src, jsrc)
    jsonl_to_parquet(spark, jsrc, dest, src.schema)
    back = spark.read.parquet(dest)
    assert _rows(back) == _rows(src)


def test_synthetic_docs_stream_matches_batch(spark, tmp_path):
    """The streamed corpus must be byte-identical to the batch one:
    contiguous ids, no gaps/dups across micro-batches, same text."""
    import time

    from airbnb_pyspark_jobs_spark.sources.synthetic import register

    register(spark)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("rows_per_batch", 80)
        .option("max_rows", 200)
        .option("partitions", 3)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("syn_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 90
    while time.time() < deadline:
        if spark.sql("SELECT COUNT(*) AS n FROM syn_stream").first().n >= 200:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)

    got = {
        r.doc_id: r.text
        for r in spark.sql("SELECT doc_id, text FROM syn_stream").collect()
    }
    want = {
        r.doc_id: r.text
        for r in spark.read.format("synthetic_docs").option("n", 200).load().collect()
    }
    assert got == want  # 200 contiguous ids, identical texts


def test_synthetic_zipf_option_is_deterministic_and_skewed(spark):
    from airbnb_pyspark_jobs_spark.sources.synthetic import register

    register(spark)

    def load():
        return (
            spark.read.format("synthetic_docs")
            .option("n", 500)
            .option("vocab_size", 200)
            .option("zipf_s", 1.1)
            .load()
        )

    a = {r.doc_id: r.text for r in load().collect()}
    b = {r.doc_id: r.text for r in load().collect()}
    assert a == b  # pure function of (doc_id, options)
    # Zipf skew: the top word dominates; uniform draw would put the
    # max near mean (~1/200 of tokens)
    from collections import Counter

    counts = Counter(w for t in a.values() for w in t.split())
    total = sum(counts.values())
    assert counts.most_common(1)[0][1] / total > 0.05
    # zipf_s=0 stays byte-identical to the classic uniform corpus
    u = (
        spark.read.format("synthetic_docs")
        .option("n", 50)
        .load()
        .collect()
    )
    u2 = (
        spark.read.format("synthetic_docs")
        .option("n", 50)
        .option("zipf_s", 0.0)
        .load()
        .collect()
    )
    assert sorted(map(tuple, u)) == sorted(map(tuple, u2))
