"""Warehouse sink tests: parquet layout + BigQuery fail-fast."""

from __future__ import annotations

import os

import pytest

from airbnb_pyspark_jobs_spark.sources.sinks import (
    BigQueryWarehouseSink,
    ParquetWarehouseSink,
)


def test_parquet_warehouse_layout(spark, tmp_path):
    sink = ParquetWarehouseSink(root=str(tmp_path / "wh"))
    df = spark.range(10).withColumnRenamed("id", "k")
    sink.write(df, "dim_demo")
    out = spark.read.parquet(str(tmp_path / "wh" / "dim_demo"))
    assert out.count() == 10


def test_parquet_warehouse_partitioned(spark, tmp_path):
    sink = ParquetWarehouseSink(root=str(tmp_path / "wh"), partition_by=("p",))
    df = spark.range(20).selectExpr("id AS k", "CAST(id % 2 AS INT) AS p")
    sink.write(df, "fact_demo")
    base = str(tmp_path / "wh" / "fact_demo")
    assert sorted(d for d in os.listdir(base) if d.startswith("p=")) == ["p=0", "p=1"]


def test_bigquery_sink_fails_fast_without_connector(spark):
    sink = BigQueryWarehouseSink(dataset="d", temporary_gcs_bucket="b")
    df = spark.range(1)
    with pytest.raises(Exception) as e:
        sink.write(df, "t")
    assert "bigquery" in str(e.value).lower() or "connector" in str(e.value).lower()


def test_compact_parquet_merges_small_files(spark, tmp_path):
    import glob

    from airbnb_pyspark_jobs_spark.sources.parquet import compact_parquet

    path = str(tmp_path / "frag")
    # 40 tiny files from a fragmented append history
    spark.range(4000).repartition(40).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 40
    before = set(r.id for r in spark.read.parquet(path).collect())
    out = compact_parquet(spark, path, target_records_per_file=2000)
    assert len(glob.glob(f"{path}/*.parquet")) == 2
    assert set(r.id for r in out.collect()) == before


def test_upsert_parquet_update_insert_idempotent(spark, tmp_path):
    from airbnb_pyspark_jobs_spark.sources.parquet import upsert_parquet

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, name string, v long"
    )
    upsert_parquet(spark, path, base, ["k"])
    upd = spark.createDataFrame(
        [(2, "b2", 21), (3, "c", 30)], "k long, name string, v long"
    )
    got = {
        r.k: (r.name, r.v)
        for r in upsert_parquet(spark, path, upd, ["k"]).collect()
    }
    assert got == {1: ("a", 10), 2: ("b2", 21), 3: ("c", 30)}
    # idempotent re-merge
    again = {
        r.k: (r.name, r.v)
        for r in upsert_parquet(spark, path, upd, ["k"]).collect()
    }
    assert again == got


class _FakeWriter:
    """DataFrameWriter test double capturing the option assembly."""

    def __init__(self, fail_save: Exception | None = None):
        self.fmt = None
        self.options: dict = {}
        self.mode_ = None
        self.saved = False
        self._fail = fail_save

    def format(self, f):
        self.fmt = f
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def mode(self, m):
        self.mode_ = m
        return self

    def save(self):
        if self._fail is not None:
            raise self._fail
        self.saved = True


def test_bigquery_sink_option_assembly(spark, monkeypatch):
    """The writer must receive EXACTLY the reference's connector options
    (/root/reference jobs/final_dim_load.py:211-215,
    jobs/final_fact_load.py:153-161): format=bigquery,
    table=<dataset>.<table>, temporaryGcsBucket, maxParallelism,
    mode=overwrite — asserted against a DataFrameWriter double so the
    assembly is EXECUTED, not just import-gated."""
    df = spark.range(3)
    fake = _FakeWriter()
    monkeypatch.setattr(type(df), "write", property(lambda self: fake))
    BigQueryWarehouseSink(
        dataset="analytics", temporary_gcs_bucket="tmp-bkt", max_parallelism=10
    ).write(df, "dim_listing")
    assert fake.fmt == "bigquery"
    assert fake.options == {
        "table": "analytics.dim_listing",
        "temporaryGcsBucket": "tmp-bkt",
        "maxParallelism": 10,
    }
    assert fake.mode_ == "overwrite" and fake.saved


def test_bigquery_sink_omits_unset_parallelism(spark, monkeypatch):
    df = spark.range(1)
    fake = _FakeWriter()
    monkeypatch.setattr(type(df), "write", property(lambda self: fake))
    BigQueryWarehouseSink(
        dataset="d", temporary_gcs_bucket="b", max_parallelism=None
    ).write(df, "t")
    assert "maxParallelism" not in fake.options and fake.saved


def test_bigquery_sink_maps_missing_connector_to_clear_error(spark, monkeypatch):
    df = spark.range(1)
    fake = _FakeWriter(
        fail_save=Exception("Failed to find data source: bigquery")
    )
    monkeypatch.setattr(type(df), "write", property(lambda self: fake))
    with pytest.raises(RuntimeError, match="connector not on the classpath"):
        BigQueryWarehouseSink(dataset="d", temporary_gcs_bucket="b").write(df, "t")
