"""Shared fixtures: one local SparkSession per test run + oracle compare."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from airbnb_pyspark_jobs_spark.session import get_spark  # noqa: E402
from airbnb_pyspark_jobs_spark.sources.registry import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    wh = tempfile.mkdtemp(prefix="spark_wh_")
    spark = get_spark(
        app_name="tests",
        profile="local",
        shuffle_partitions=8,
        extra_conf={
            # keep saveAsTable/derby artifacts out of the repo
            "spark.sql.warehouse.dir": wh,
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={wh}",
        },
    )
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata tables registered as views,
    mirroring the driver's oracle environment."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    """Normalize datetime-likes / nulls so pandas dtype differences
    (datetime64 vs object date) don't cause false mismatches."""
    import datetime as _dt

    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return v


def assert_matches_oracle(spark_df, duck_con, sql, check_schema=True):
    """Order-insensitive compare of a Spark DataFrame vs a DuckDB result,
    columns sorted by name — mimics the driver's correctness gate."""
    sdf = spark_df.toPandas()
    ddf = duck_con.execute(sql).fetchdf()
    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duck={d_cols}"
    assert len(sdf) == len(ddf), f"row count: spark={len(sdf)} duck={len(ddf)}"
    srows = sorted(
        [tuple(_norm_cell(v) for v in row) for row in sdf[s_cols].itertuples(index=False)],
        key=repr,
    )
    drows = sorted(
        [tuple(_norm_cell(v) for v in row) for row in ddf[d_cols].itertuples(index=False)],
        key=repr,
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if repr(a) != repr(b)
    ]
    assert not mismatches, f"value mismatch (first 3): {mismatches[:3]}"
