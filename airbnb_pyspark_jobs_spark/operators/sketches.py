"""Approximate sketches: HLL distinct counting and approximate
quantiles — the sub-linear answers a 100 TB engine needs when exact
ones would shuffle the world.

Why sketches at scale:
- ``approx_count_distinct`` (HyperLogLog++) carries a fixed-size sketch
  per group through the partial aggregation instead of the full key
  set — a COUNT(DISTINCT) over 100 TB becomes one scan + tiny shuffle.
- ``hll_sketch_agg`` (Apache DataSketches HLL) goes further: the
  binary sketches are MERGEABLE, so per-partition/per-day sketches can
  be stored and any rollup (week, month, all-time) answered by
  ``hll_union_agg`` + estimate WITHOUT rescanning the raw data — the
  canonical pre-aggregation pattern for distinct-user dashboards.
- ``percentile_approx`` (KLL-style) bounds memory for quantiles the
  same way; exact ``percentile`` materializes every value per group.

These are Spark-internal estimators — their exact outputs are not
reproducible in another engine, so the sketch queries register WITHOUT
a value oracle (the driver's rows-only check); accuracy is asserted
against exact answers within the configured error in unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, group_cols: list[str], count_col: str, rsd: float = 0.05
) -> DataFrame:
    """Per-group approximate distinct count (HLL++, relative standard
    deviation ``rsd``). One shuffle; sketch-sized partial aggregates."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(count_col, rsd=rsd).alias("approx_distinct")
    )


def hll_daily_sketches(
    df: DataFrame, ts_col: str, key_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-day DataSketches-HLL sketches of ``key_col`` — the mergeable
    pre-aggregate. Store this; roll up any date range later with
    :func:`hll_merge_estimate` instead of rescanning events."""
    return (
        df.select(F.to_date(ts_col).alias("day"), F.col(key_col))
        .groupBy("day")
        .agg(F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"))
    )


def hll_merge_estimate(sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge stored HLL sketches (optionally regrouped) and estimate:
    the rollup-without-rescan step."""
    grouped = sketches.groupBy(*group_cols) if group_cols else sketches.groupBy()
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct")
    )


def approx_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probabilities: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles (bounded-memory estimator;
    1/accuracy relative rank error). Returns one array column
    ``approx_quantiles`` aligned with ``probabilities``."""
    probs = F.array(*[F.lit(p) for p in probabilities])
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(value_col, probs, F.lit(accuracy)).alias("approx_quantiles")
    )


def frequent_items(
    df: DataFrame,
    cols: list[str],
    support: float = 0.01,
) -> dict[str, list]:
    """Heavy hitters per column via Spark's `stat.freqItems`
    (Karp/Misra-Gries family): one pass, bounded memory ~1/support per
    column, mergeable across partitions — the sketch answer to "which
    values dominate this 100 TB column" without a full groupBy.
    False positives possible (items below support may appear), no
    false negatives: every item above support is returned — callers
    needing exact counts verify the shortlist with one cheap filtered
    aggregate (shortlist-sized, not domain-sized).
    Driver-side result (a dict) by design: the output is at most
    ~1/support items per column.
    """
    row = df.stat.freqItems(cols, support).first()
    return {c: sorted(row[f"{c}_freqItems"]) for c in cols}
