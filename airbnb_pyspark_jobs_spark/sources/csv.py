"""Typed CSV ingestion: raw headered CSV → explicitly-cast DataFrame.

Reference semantics (``jobs/csv_to_parquet.py:22-77`` in /root/reference):
read all-string CSV with ``header=True, multiLine=True, quote='"',
escape='"'``, then cast column-by-column into a fixed target schema with
cleansing (boolean coercion from "t"/"true", money-string stripping).

Our version takes a declarative ``cast_map`` instead of 48 chained
``withColumn`` calls, and applies all casts in ONE ``select`` so the
logical plan stays a single Project over the scan (column pruning +
whole-stage codegen friendly; no 48-deep Project chain for the analyzer
to collapse).

Scale notes:
- ``multiLine=True`` makes CSV files non-splittable (a quoted newline can
  span block boundaries) — at 100 TB, ingest once into parquet and never
  re-scan the CSV; that is exactly the staging pattern here.
- Explicit schema for the raw read (all strings) avoids the two-pass
  inference scan.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbnb_pyspark_jobs_spark.functions.cleansing import clean_money, coerce_boolean

# Casting rules: type name -> Column builder. "bool" and "money" carry
# the reference's cleansing semantics; everything else is a plain cast.
_SPECIAL = {"bool", "money"}


def _cast_column(name: str, spec: str | T.DataType) -> Column:
    c = F.col(name)
    if isinstance(spec, T.DataType):
        return c.cast(spec).alias(name)
    if spec == "bool":
        # "t"/"true" any case -> True, else False (null-safe: null -> False)
        # per jobs/csv_to_parquet.py:35-37.
        return coerce_boolean(c).alias(name)
    if spec == "money":
        # "$1,234.56" -> 1234.56 as decimal(10,2) per jobs/csv_to_parquet.py:44.
        return clean_money(c).alias(name)
    return c.cast(spec).alias(name)


def read_csv_typed(
    spark: SparkSession,
    path: str,
    cast_map: Mapping[str, str | T.DataType],
    keep_untyped: bool = True,
    strict: bool = True,
    header: bool = True,
    multi_line: bool = True,
    quote: str = '"',
    escape: str = '"',
) -> DataFrame:
    """Read a headered CSV and cast into the target schema in one Project.

    ``cast_map`` maps column name -> Spark type string (``"int"``,
    ``"date"``, ``"decimal(10,6)"``, ...), a ``DataType``, or the special
    cleansing casts ``"bool"`` / ``"money"``. Columns not in ``cast_map``
    are kept as raw strings when ``keep_untyped`` (the reference keeps
    e.g. ``host_name`` untouched) or dropped otherwise.

    ``strict=True`` raises when a cast_map column is absent from the CSV;
    ``strict=False`` casts whatever subset is present (feeds that pass a
    superset cast map for partial extracts).
    """
    raw = (
        spark.read.option("header", header)
        .option("multiLine", multi_line)
        .option("quote", quote)
        .option("escape", escape)
        .csv(path)
    )
    cols: list[Column] = []
    for name in raw.columns:
        if name in cast_map:
            cols.append(_cast_column(name, cast_map[name]))
        elif keep_untyped:
            cols.append(F.col(name))
    missing = set(cast_map) - set(raw.columns)
    if missing and strict:
        raise ValueError(f"cast_map columns absent from CSV {path}: {sorted(missing)}")
    return raw.select(*cols)
