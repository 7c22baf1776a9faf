"""Physical parquet layout for data skipping — the write-side half of
predicate pushdown.

Pushdown prunes row groups/files using parquet footer min/max
statistics, but the stats only help if the writer made them NARROW: a
randomly-distributed column's (min, max) spans the whole domain in
every file and nothing is ever skipped. Range-repartitioning on the
filter columns and sorting within partitions gives each output file a
tight, (near-)disjoint value range — a `WHERE col BETWEEN ...` then
touches only the files whose range intersects, turning a 100 TB scan
into a few-file read. This is the format-free version of what
Delta/Iceberg call clustering/Z-ordering (single-column case; true
multi-column Z-order interleaves bits, which parquet min/max can't
express per-file anyway — for a second independent filter column,
partition the TABLE by one and range-sort the other).

Cost: one range shuffle of the data (with a sampling pass for the
range boundaries — Spark's RangePartitioner). Skew: boundary sampling
splits hot ranges across files; the sort inside each file additionally
enables row-group-level pruning within files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sorted_for_skipping(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-clustered on ``cols``: one range
    shuffle into ``num_files`` partitions + an in-partition sort, so
    every file's footer min/max on ``cols`` is tight and files are
    mutually (near-)disjoint — the layout that makes reader-side
    predicate pushdown actually skip I/O."""
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_value(
    df: DataFrame, cols: list[str], bits_per_col: int = 6
) -> tuple[DataFrame, str]:
    """Append a Morton (Z-curve) key column interleaving equal-frequency
    bucket ranks of ``cols``; returns (df, zcol_name).

    Why this beats single-column range clustering for multi-predicate
    workloads: sorting by (a, b) gives tight file ranges on `a` but
    full-domain ranges on `b`; the Z-curve's locality bounds EVERY
    coordinate within a contiguous key range, so each file's footer
    min/max is moderately tight on ALL dims and pushdown skips on any
    of them (what Delta/Iceberg Z-order clustering does, format-free).

    Mechanics, all JVM-side after one planning action:
    - per column, approxQuantile computes 2^bits - 1 equal-frequency
      boundaries (a bounded driver-side planning step, like range
      partitioning's sampling pass); a CASE chain ranks each value into
      its bucket — equal-frequency (not width_bucket's equal-width), so
      skewed columns still spread across the curve;
    - bucket ranks are bit-interleaved with shift/and/or expressions
      into one long (2 cols × 6 bits = 12-bit key) — no UDFs.
    """
    if len(cols) != 2:
        raise ValueError("zorder_value currently interleaves exactly 2 columns")
    n_buckets = 1 << bits_per_col
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # STAGE the rank when-chains into real columns before interleaving:
    # the bit extraction below references each rank 2×bits times, and
    # inlining a 2^bits-deep CASE there re-evaluates it per bit (the
    # SCALE_NOTES lambda-inlining trap, here as expression blow-up).
    rank_cols = {}
    all_cuts = df.stat.approxQuantile(cols, probs, 0.001)  # ONE planning scan
    for idx, (c, cuts) in enumerate(zip(cols, all_cuts)):
        rank = F.lit(0)
        for b, cut in enumerate(cuts):
            rank = F.when(F.col(c) > F.lit(cut), F.lit(b + 1)).otherwise(rank)
        rank_cols[f"__zrank{idx}"] = rank.cast("long")
    staged = df.withColumns(rank_cols)
    z = F.lit(0).cast("long")
    for i in range(bits_per_col):
        for j in range(len(cols)):
            bit = F.shiftright(F.col(f"__zrank{j}"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, 2 * i + j))
    zcol = "__zorder"
    return staged.withColumn(zcol, z).drop(*rank_cols), zcol


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 32,
    bits_per_col: int = 6,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write: range-partition + sort on the
    Morton key, drop it, write. Each output file covers a contiguous
    Z-range = a small rectangle-union in (colA, colB) space, so footer
    stats are tight on both columns."""
    zdf, zcol = zorder_value(df, cols, bits_per_col)
    (
        zdf.repartitionByRange(num_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode(mode)
        .parquet(path)
    )


def metadata_stats(
    spark, path: str, cols: list[str]
) -> dict[str, dict[str, object]]:
    """Footer-only MIN/MAX/COUNT per column — Spark's parquet AGGREGATE
    pushdown (`PushedAggregation` in the scan): the answer comes from
    row-group statistics in the file footers, zero data pages read. At
    100 TB this is the difference between a metadata operation and a
    full scan for "how many rows / what's the value range" questions
    (partition pruning's aggregate sibling).

    Pushdown requires the V2 parquet reader and kicks in only for
    filter-less MIN/MAX/COUNT, so both confs are flipped for the scope
    of this call and restored after (V1 remains the repo default: V2
    changes plan shapes repo-wide and buys nothing else here). The
    helper VERIFIES `PushedAggregation` appears in the executed plan —
    callers get footer semantics or an assertion, never a silent full
    scan. Returns ``{col: {"min": .., "max": .., "count": ..}}``.

    NOTE footer semantics: parquet stats are exact for these tables'
    types; for floating NaN columns or pre-2.4 writers, stats can be
    absent — Spark then refuses the pushdown (plan assertion fires)
    rather than returning wrong answers.
    """
    v1_key, agg_key = (
        "spark.sql.sources.useV1SourceList",
        "spark.sql.parquet.aggregatePushdown",
    )
    old_v1 = spark.conf.get(v1_key)
    old_agg = spark.conf.get(agg_key, "false")
    spark.conf.set(v1_key, "")
    spark.conf.set(agg_key, "true")
    try:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        aggs.append(F.count(F.lit(1)).alias("__n"))
        agg = spark.read.parquet(path).agg(*aggs)
        plan = agg._jdf.queryExecution().executedPlan().toString()
        if "PushedAggregation" not in plan:
            raise AssertionError(
                "parquet aggregate pushdown did not engage; plan:\n" + plan
            )
        row = agg.first()
        return {
            c: {"min": row[f"__mn_{c}"], "max": row[f"__mx_{c}"], "count": row["__n"]}
            for c in cols
        }
    finally:
        spark.conf.set(v1_key, old_v1)
        spark.conf.set(agg_key, old_agg)
