"""Cleansing / conformance column builders (SURVEY §2.2, §2.8).

Reference semantics reproduced exactly, but standardized:

- :func:`coerce_boolean` — the reference has TWO inconsistent boolean
  coercions: staging uses ``lower(x).isin("t","true")`` with null→False
  (``jobs/csv_to_parquet.py:35-37``) while the fact job uses
  ``=="t"/=="f"`` with default-True (``jobs/final_fact_load.py:33-36``).
  We expose one function with an explicit ``null_as`` / ``other_as``
  policy covering both.
- :func:`clean_money` — strip ``[$,]`` then cast decimal(10,2)
  (``jobs/csv_to_parquet.py:44``, ``jobs/final_dim_load.py:258-259``).
- :func:`clamp_non_negative` — ``when(col<0, 0)`` loop replaced by
  vectorized ``greatest(col, 0)`` (``jobs/final_dim_load.py:44-47``).
- :func:`fill_defaults` — per-column null defaults (``na.fill`` maps at
  ``jobs/final_dim_load.py:75-92,230-234,302-326``).
- :func:`impute` — constant-or-fallback-column null imputation
  (``jobs/final_fact_load.py:37-42``).

All pure Column expressions → whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRUTHY = ("t", "true")
FALSY = ("f", "false")


def coerce_boolean(
    c: Column | str,
    null_as: bool | None = False,
    other_as: bool = False,
) -> Column:
    """Coerce a "t"/"true"/"f"/"false" string column to boolean.

    ``null_as`` is the value for NULL input (None keeps NULL); ``other_as``
    is the value for any other non-null string. Defaults reproduce the
    staging behavior (case-insensitive truthy match, everything else
    False). ``other_as=True`` with ``null_as=True`` reproduces the fact
    job's default-True re-coercion.
    """
    c = F.col(c) if isinstance(c, str) else c
    lowered = F.lower(c)
    result = (
        F.when(lowered.isin(*TRUTHY), F.lit(True))
        .when(lowered.isin(*FALSY), F.lit(False))
        .otherwise(F.lit(other_as))
    )
    if null_as is None:
        return F.when(c.isNull(), F.lit(None).cast("boolean")).otherwise(result)
    return F.when(c.isNull(), F.lit(null_as)).otherwise(result)


def clean_money(c: Column | str, precision: int = 10, scale: int = 2) -> Column:
    """``"$1,234.56"`` → ``1234.56`` as decimal(precision, scale)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(c, r"[$,]", "").cast(f"decimal({precision},{scale})")


def clamp_non_negative(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Clamp negative values to 0 across ``cols``, PRESERVING nulls
    (null policy belongs to ``fill_defaults``, not the clamp — and the
    reference's ``when(col<0, 0).otherwise(col)`` keeps nulls too;
    ``greatest(col, 0)`` would silently coerce null→0).

    One ``withColumns`` call → a single Project node regardless of column
    count (the reference loops ``withColumn`` per column).
    """
    return df.withColumns(
        {
            name: F.when(F.col(name) < 0, F.lit(0).cast(df.schema[name].dataType)).otherwise(
                F.col(name)
            )
            for name in cols
        }
    )


def fill_defaults(df: DataFrame, defaults: Mapping[str, object]) -> DataFrame:
    """Per-column null replacement (typed ``na.fill``)."""
    return df.na.fill(dict(defaults))


def impute(c: Column | str, *fallbacks: Column | str | object) -> Column:
    """Null imputation with column or literal fallbacks, in order.

    ``impute("adjusted_price", "price", 100.00)`` ≡ the fact job's
    price-imputation chain. Strings name columns; other values are
    literals.
    """
    c = F.col(c) if isinstance(c, str) else c
    chain = [c]
    for fb in fallbacks:
        if isinstance(fb, Column):
            chain.append(fb)
        elif isinstance(fb, str):
            chain.append(F.col(fb))
        else:
            chain.append(F.lit(fb))
    return F.coalesce(*chain)
