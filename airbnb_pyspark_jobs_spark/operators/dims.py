"""Static dimension builders: date dimension, location dimension.

Reference: ``dim_date`` is generated from a SQL literal
``explode(sequence(to_date('2010-01-01'), to_date('2030-12-31'), interval
1 day))`` plus calendar attribute columns
(``jobs/final_dim_load.py:464-485`` in /root/reference); ``dim_location``
is a projection+dedup over coordinates (``:217-249``).

Scale: ``sequence`` generates on a single row then explodes — fine for a
date spine (~7.7k rows for 21 years); attributes are pure Catalyst
expressions. For spines of billions of rows use ``spark.range`` +
``date_add`` instead (parallel generation); provided as
``date_dimension_ranged``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _with_date_attributes(df: DataFrame, date_col: str = "date_id") -> DataFrame:
    """Calendar attribute columns per the reference's dim_date
    (jobs/final_dim_load.py:468-485): year/quarter/month/week/day fields,
    day name, weekend flag (Sunday=1, Saturday=7)."""
    d = F.col(date_col)
    dow = F.dayofweek(d)
    return df.select(
        d.alias(date_col),
        F.year(d).alias("year"),
        F.quarter(d).alias("quarter"),
        F.month(d).alias("month"),
        F.weekofyear(d).alias("week_of_year"),
        F.dayofmonth(d).alias("day_of_month"),
        dow.alias("day_of_week"),
        F.date_format(d, "EEEE").alias("day_name"),
        dow.isin(1, 7).alias("is_weekend"),
    )


def date_dimension(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Date spine [start, end] with calendar attributes (explode+sequence)."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("date_id")
    )
    return _with_date_attributes(spine)


def date_dimension_ranged(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Parallel date spine via spark.range + date_add — for very long
    spines where a single exploded row would bottleneck one task."""
    import datetime as _dt

    d0 = _dt.date.fromisoformat(start)
    d1 = _dt.date.fromisoformat(end)
    n = (d1 - d0).days + 1
    spine = spark.range(0, n).select(
        F.date_add(F.lit(start).cast("date"), F.col("id").cast("int")).alias("date_id")
    )
    return _with_date_attributes(spine)


def location_dimension(
    listings: DataFrame,
    lat_col: str = "latitude",
    long_col: str = "longitude",
) -> DataFrame:
    """dim_location per the reference (jobs/final_dim_load.py:217-249):
    distinct non-null coordinate pairs with a string natural key
    ``lat_long`` — here delimiter-joined (the reference concatenates with
    '_') so keys cannot collide."""
    return (
        listings.select(
            F.col(lat_col).cast("decimal(10,6)").alias("latitude"),
            F.col(long_col).cast("decimal(10,6)").alias("longitude"),
        )
        .filter(F.col("latitude").isNotNull() & F.col("longitude").isNotNull())
        .dropDuplicates()
        .select(
            F.concat_ws(
                "_",
                F.col("latitude").cast("string"),
                F.col("longitude").cast("string"),
            ).alias("location_src_id"),
            "latitude",
            "longitude",
        )
    )
