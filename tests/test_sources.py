"""Source/sink operator tests: typed CSV errors, parquet file sizing,
overwrite barrier on self-referencing lineage."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.sources import (
    overwrite_with_barrier,
    read_csv_typed,
    write_parquet,
)
from airbnb_pyspark_jobs_spark.sources.parquet import overwrite_partitions


def test_read_csv_typed_rejects_missing_columns(spark, tmp_path):
    p = str(tmp_path / "x.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,2\n")
    with pytest.raises(ValueError, match="absent from CSV"):
        read_csv_typed(spark, p, {"a": "int", "nope": "int"})


def test_read_csv_typed_single_project(spark, tmp_path):
    """All casts land in ONE Project over the scan (not a 48-deep chain)."""
    p = str(tmp_path / "x.csv")
    with open(p, "w") as f:
        f.write("a,b,c\n1,$2,t\n")
    df = read_csv_typed(spark, p, {"a": "int", "b": "money", "c": "bool"})
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Project") == 1
    row = df.first()
    assert (row.a, float(row.b), row.c) == (1, 2.0, True)


def test_write_parquet_max_records_per_file(spark, tmp_path):
    p = str(tmp_path / "sized")
    df = spark.range(1000).coalesce(1)
    write_parquet(df, p, max_records_per_file=100)
    files = glob.glob(os.path.join(p, "*.parquet"))
    assert len(files) == 10
    assert spark.read.parquet(p).count() == 1000


def test_overwrite_partitions_is_incremental(spark, tmp_path):
    """Dynamic partition overwrite replaces only the partitions present
    in the incoming frame — the daily-backfill primitive."""
    p = str(tmp_path / "fact")
    full = spark.createDataFrame(
        [(1, "d1", 10), (2, "d1", 20), (3, "d2", 30), (4, "d3", 40)],
        "id long, day string, v int",
    )
    overwrite_partitions(full, p, ["day"])
    # backfill: replace ONLY day=d2 with corrected rows
    fix = spark.createDataFrame([(3, "d2", 99), (5, "d2", 100)], "id long, day string, v int")
    overwrite_partitions(fix, p, ["day"])
    got = {(r.id, r.day): r.v for r in spark.read.parquet(p).collect()}
    assert got == {(1, "d1"): 10, (2, "d1"): 20, (3, "d2"): 99, (5, "d2"): 100, (4, "d3"): 40}
    # conf restored (scoped override)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"


def test_overwrite_with_barrier_self_referencing_lineage(spark, tmp_path):
    """The read-transform-overwrite-same-path cycle the reference works
    around manually (jobs/final_dim_load.py:453-456) must be safe."""
    p = str(tmp_path / "dim")
    spark.range(10).withColumn("v", F.lit(1)).write.parquet(p)
    existing = spark.read.parquet(p)
    updated = existing.withColumn("v", F.col("v") + 1)
    result = overwrite_with_barrier(updated, p)
    assert result.count() == 10
    assert {r.v for r in result.collect()} == {2}
    # and the path really was replaced (fresh scan agrees)
    assert {r.v for r in spark.read.parquet(p).collect()} == {2}


def test_range_clustered_layout_has_disjoint_file_ranges(spark, tmp_path):
    """write_sorted_for_skipping must produce parquet files whose
    footer min/max on the cluster column are tight and pairwise
    disjoint (the property pushdown skipping depends on); a plain
    shuffled write spans the whole domain in every file."""
    import glob

    import pyarrow.parquet as pq

    from airbnb_pyspark_jobs_spark.sources.layout import write_sorted_for_skipping

    df = spark.range(50_000).selectExpr(
        "pmod(hash(id), 100000) AS k", "id AS payload"
    )

    def file_ranges(path):
        out = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)  # k is written first
                assert col.path_in_schema == "k"
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            out.append((min(mins), max(maxs)))
        return out

    clustered = str(tmp_path / "clustered")
    write_sorted_for_skipping(df, clustered, ["k"], num_files=8)
    ranges = sorted(file_ranges(clustered))
    assert len(ranges) == 8
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1, hi1)} vs {(lo2, hi2)}"

    # control: hash-shuffled write -> every file spans ~the whole domain
    plain = str(tmp_path / "plain")
    df.repartition(8).write.parquet(plain)
    full_lo = min(lo for lo, _ in file_ranges(plain))
    full_hi = max(hi for _, hi in file_ranges(plain))
    for lo, hi in file_ranges(plain):
        assert (hi - lo) > 0.5 * (full_hi - full_lo)

    # round-trip + a range predicate still returns exactly the right rows
    got = spark.read.parquet(clustered).filter("k BETWEEN 1000 AND 2000").count()
    want = df.filter("k BETWEEN 1000 AND 2000").count()
    assert got == want


def test_synthetic_docs_python_datasource(spark):
    """Spark 4 Python Data Source: deterministic, partition-parallel,
    schema-stable — and compatible with the dedup operator stack."""
    from pyspark.sql import functions as F

    from airbnb_pyspark_jobs_spark.sources.synthetic import register

    register(spark)
    df = spark.read.format("synthetic_docs").option("n", 200).option("partitions", 4).load()
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 200
    # generation is spread over the requested partitions
    assert df.select(F.spark_partition_id()).distinct().count() == 4
    # byte-deterministic across reads
    a = sorted((r.doc_id, r.text) for r in df.collect())
    b = sorted(
        (r.doc_id, r.text)
        for r in spark.read.format("synthetic_docs")
        .option("n", 200).option("partitions", 7).load().collect()
    )
    assert a == b
    # planted duplicates at the documented rate: doc 10 copies doc 9
    texts = dict(a)
    assert texts[10] == texts[9] and texts[20] == texts[19]
    assert texts[11] != texts[10]
    # n_chars is consistent with text
    assert all(len(t) == dict((r.doc_id, r.n_chars) for r in df.collect())[i] for i, t in list(texts.items())[:5])
    # the dedup stack runs directly on the source
    from airbnb_pyspark_jobs_spark.operators.dedupe import exact_dedup_keepers

    keepers = exact_dedup_keepers(df)
    n_copies = {r.keeper_id: r.n_copies for r in keepers.collect()}
    assert n_copies.get(9) == 2  # 9 and its planted copy 10


def test_zorder_layout_tightens_both_dimensions(spark, tmp_path):
    """Z-order clustering must give (moderately) tight per-file footer
    ranges on BOTH columns; single-column range clustering leaves the
    second column spanning ~the whole domain in every file."""
    import glob

    import pyarrow.parquet as pq

    from airbnb_pyspark_jobs_spark.sources.layout import (
        write_sorted_for_skipping,
        write_zordered,
    )

    # two independent uniform dims
    df = spark.range(60_000).selectExpr(
        "pmod(hash(id), 10000) AS x",
        "pmod(hash(id + 1000000), 10000) AS y",
        "id AS payload",
    )

    def avg_span(path, col_idx, col_name):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(col_idx)
                assert col.path_in_schema == col_name
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            spans.append(max(maxs) - min(mins))
        return sum(spans) / len(spans)

    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, ["x", "y"], num_files=16)
    spath = str(tmp_path / "single")
    write_sorted_for_skipping(df, spath, ["x"], num_files=16)

    domain = 10000.0
    # single-col clustering: x tight, y spans ~full domain
    assert avg_span(spath, 0, "x") < 0.15 * domain
    assert avg_span(spath, 1, "y") > 0.9 * domain
    # z-order: BOTH dims noticeably tighter than the full domain
    zx, zy = avg_span(zpath, 0, "x"), avg_span(zpath, 1, "y")
    assert zx < 0.6 * domain and zy < 0.6 * domain, (zx, zy)

    # round-trip: a 2-D range predicate returns exactly the right rows
    pred = "x BETWEEN 100 AND 900 AND y BETWEEN 100 AND 900"
    assert (
        spark.read.parquet(zpath).filter(pred).count()
        == df.filter(pred).count()
    )


def test_events_loader_yields_micros_timestamp(spark, duck):
    """Pin the events-loader contract on WHATEVER Spark is installed.

    events.parquet stores ts as parquet TIMESTAMP(NANOS); Spark's read
    behavior for that type changed between 4.0 (long via legacy conf)
    and 4.1 (native TimestampNTZ). The loader must always yield
    TimestampType at microsecond precision, value-matching DuckDB's
    nanos->micros truncation — so a Spark upgrade fails THIS test, not
    thirty downstream ones.
    """
    from pyspark.sql import types as T

    from airbnb_pyspark_jobs_spark.sources.registry import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    events = load_table(spark, "events", sf_dir)
    assert isinstance(events.schema["ts"].dataType, T.TimestampType)

    got = {
        r["event_id"]: r["ts"]
        for r in events.orderBy("event_id").limit(50).collect()
    }
    want = {
        eid: ts
        for eid, ts in duck.execute(
            "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts "
            "FROM events ORDER BY event_id LIMIT 50"
        ).fetchall()
    }
    assert got == want
