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


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the VALUE-CHECKABLE member
# of the sketch family (Bar-Yossef et al. 2002; also the "bottom-k"
# sketch). Unlike HLL (engine-internal registers), a KMV sketch is just
# the k smallest values of a deterministic uniform hash — every engine
# that can md5 reproduces it bit-for-bit, so estimates AND merges get a
# DuckDB oracle, closing the family's one rows-only gap (q65).
# ---------------------------------------------------------------------------
_KMV_SPACE = float(2**32)  # portable_hash_int range


def kmv_daily_sketches(
    df: DataFrame, ts_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """Per-day KMV sketch of ``key_col``: the ``k`` smallest DISTINCT
    32-bit md5-uniform hashes (sorted array) + the day's distinct-hash
    count. Store these; any date-range distinct rollup is a merge
    (:func:`kmv_merge_estimate`) — no rescan.

    Scale shape: one distinct shuffle of (day, hash) pairs, then a
    day-partitioned window takes the k smallest per day (bounded task
    memory — never a whole day's key set in one buffer). HLL (q65)
    sketches cheaper at ingest (no distinct shuffle, fixed-size partial
    aggs); KMV buys exact cross-engine replayability and transparent
    merge semantics for the stored-sketch rollup pattern.
    """
    from pyspark.sql.window import Window

    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int

    hashed = (
        df.select(
            F.to_date(ts_col).alias("day"),
            portable_hash_int(F.col(key_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    counts = hashed.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_distinct_hashes")
    )
    w = Window.partitionBy("day").orderBy("h")
    kept = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    sk = kept.groupBy("day").agg(F.sort_array(F.collect_list("h")).alias("kmv"))
    return sk.join(counts, "day")


def kmv_estimate(kmv: F.Column, k: int) -> F.Column:
    """Distinct estimate from a KMV array: exact size when the sketch
    never filled (the hash set is complete), else ``(k-1) * 2^32 /
    h_k`` (k-th smallest uniform hash). One double division + round —
    bitwise cross-engine."""
    return F.round(
        F.when(
            F.size(kmv) < k, F.size(kmv).cast("double")
        ).otherwise(
            F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.element_at(kmv, k).cast("double")
        ),
        4,
    )


def kmv_merge_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Merge stored per-group KMV sketches into ONE estimate row
    (``n_kept, kth_hash, est_distinct``): the k smallest of the union
    of kept hashes IS the KMV sketch of the union (closure under
    merge — the property HLL needs opaque register math for, visible
    here as plain set algebra). Distinct-dedups hashes shared across
    groups first."""
    from pyspark.sql.window import Window

    merged = (
        sketches.select(F.explode("kmv").alias("h"))
        .distinct()
        .withColumn("__rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("__rn") <= k)
    )
    agg = merged.agg(F.sort_array(F.collect_list("h")).alias("kmv"))
    return agg.select(
        F.size("kmv").cast("bigint").alias("n_kept"),
        F.element_at("kmv", F.least(F.size("kmv"), F.lit(k))).alias("kth_hash"),
        kmv_estimate(F.col("kmv"), k).alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005) — the frequency
# sketch, value-checkable like KMV: d seeded md5 hash rows × w counter
# buckets, point estimate = min over rows. Counters are plain integer
# sums, so build, estimate AND the one-sided error (est >= exact,
# always) replay exactly in SQL.
# ---------------------------------------------------------------------------
def cms_counters(
    weighted_keys: DataFrame,
    key_col: str,
    weight_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Build the d×w CMS counter table from (key, weight) rows:
    ``(r, b, cnt)`` with ``b = md5('cms{r}' || key) % w``. Mergeable by
    (r, b) addition (counters are sums); sketch size d·w regardless of
    key cardinality — the 100 TB shuffle moves d rows per input key
    into at most d·w groups."""
    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int

    rows = weighted_keys.select(
        F.col(weight_col).alias("__wt"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            portable_hash_int(F.col(key_col), seed=f"cms{r}"),
                            F.lit(w),
                        ).alias("b"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("rb"),
    )
    return (
        rows.select(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"), "__wt")
        .groupBy("r", "b")
        .agg(F.sum("__wt").cast("bigint").alias("cnt"))
    )


def cms_estimates(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Point estimates for ``keys`` from a CMS counter table: min over
    the d row counters each key hashes into. Guarantees est >= exact
    (collisions only ADD); expected overestimate <= (total weight)/w
    per row, driven to the min by d rows. The counter table is tiny
    (d·w) — broadcast join. Buckets absent from the counter table are
    empty counters (0), so a key never seen at build time estimates 0
    instead of silently vanishing (left join + coalesce)."""
    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int

    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            portable_hash_int(F.col(key_col), seed=f"cms{r}"),
                            F.lit(w),
                        ).alias("b"),
                    )
                    for r in range(d)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    return (
        probes.join(F.broadcast(counters), ["r", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("cms_est"))
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    n_buckets: int = 4096,
) -> DataFrame:
    """EXACT quantiles, fully distributed — the scale-safe alternative
    to both ``percentile_approx`` (approximate) and Spark's exact
    ``percentile`` aggregate (which materializes EVERY value of the
    group in one aggregation buffer: the 100 TB memory hazard).

    Two-phase rank over VALUE ranges (the numeric twin of the
    epoch-shuffle hash-prefix rank): fixed-width range buckets from one
    (min, max) scan, per-bucket counts → cumulative offsets (a window
    over ``n_buckets`` rows, never corpus rows), rank within bucket via
    a bucket-partitioned window, then pick the rows whose global rank
    is ``ceil(p·n)`` (SQL type-1 / discrete quantile). The value at a
    rank is unique regardless of intra-tie ordering, so the result is
    deterministic and exactly replayable by an ORDER BY in any engine.

    Driver actions: one count + one (min, max) agg — bounded planning
    actions, not per-row. Returns ``(p, rank, value)`` — ONE row per
    requested prob, even when two probs land on the same rank (small-n
    case: they share rank and value but keep distinct p rows).
    """
    from math import ceil

    from pyspark.sql.window import Window

    df = df.filter(F.col(value_col).isNotNull())  # percentile semantics
    n = df.count()
    if n == 0:
        # Percentile of the empty set is the empty set (the ORDER BY
        # oracle formulation joins against zero ranked rows) — return
        # the same typed empty frame instead of raising, so callers
        # like q168 stay total on datasets with no qualifying rows.
        return df.sparkSession.createDataFrame(
            [], schema="p double, rank bigint, value double"
        )
    mn, mx = df.agg(
        F.min(value_col).alias("mn"), F.max(value_col).alias("mx")
    ).first()
    span = float(mx) - float(mn)
    width = (span / n_buckets) or 1.0
    targets = sorted((max(1, ceil(p * n)), float(p)) for p in set(probs))
    v = F.col(value_col).cast("double")
    bucketed = df.select(v.alias("__v")).withColumn(
        "__b",
        F.least(
            F.floor((F.col("__v") - F.lit(float(mn))) / F.lit(width)),
            F.lit(n_buckets - 1),
        ).cast("bigint"),
    )
    counts = bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off")
    )
    w_in = Window.partitionBy("__b").orderBy("__v")
    ranked = (
        bucketed.withColumn("__rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "__b")
        .withColumn("__rank", (F.col("__off") + F.col("__rn")).cast("bigint"))
    )
    # One target row per requested prob; colliding ranks fan out to one
    # output row per p via the broadcast join (never collapsed).
    target_rows = None
    for r, p in targets:
        row = df.sparkSession.range(1).select(
            F.lit(float(p)).alias("__p"), F.lit(r).cast("bigint").alias("__rank")
        )
        target_rows = row if target_rows is None else target_rows.unionByName(row)
    return (
        ranked.filter(F.col("__rank").isin([r for r, _ in targets]))
        .join(F.broadcast(target_rows), "__rank")
        .select(
            F.col("__p").alias("p"),
            F.col("__rank").alias("rank"),
            F.col("__v").alias("value"),
        )
    )


def exact_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-group EXACT quantiles, fully distributed and fully IN-PLAN —
    the grouped form of :func:`exact_quantiles` with zero driver
    actions: per-group (min, max, n) is a broadcast table, range
    buckets / cumulative offsets / ranks are all computed per group,
    and the target rank ``ceil(p·n_g)`` is a plan expression joined
    against the ranked rows. Spark's exact ``percentile`` holds every
    value of a group in ONE aggregation buffer — a 100 TB group is an
    OOM there and a partitioned window here.

    Returns ``*group_cols, p, rank, value`` — ONE row per (group,
    requested prob); probs landing on the same rank within a group
    share rank and value but keep distinct p rows. Nulls excluded per
    percentile semantics.
    """
    from pyspark.sql.window import Window

    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(*group_cols, v.alias("__v"))
    stats = base.groupBy(*group_cols).agg(
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
        F.count(F.lit(1)).alias("__n"),
    )
    width = F.greatest(
        (F.col("__mx") - F.col("__mn")) / F.lit(float(n_buckets)),
        F.lit(1e-300),  # all-equal groups: every value lands in bucket 0
    )
    bucketed = base.join(F.broadcast(stats), group_cols).withColumn(
        "__b",
        F.least(
            F.floor((F.col("__v") - F.col("__mn")) / width),
            F.lit(n_buckets - 1),
        ).cast("bigint"),
    )
    counts = bucketed.groupBy(*group_cols, "__b").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *group_cols,
        "__b",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy(*group_cols, "__b").orderBy("__v")
    ranked = (
        bucketed.withColumn("__rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), [*group_cols, "__b"])
        .withColumn("__rank", (F.col("__off") + F.col("__rn")).cast("bigint"))
    )
    probs_df = None
    for p in sorted(set(probs)):
        row = stats.sparkSession.range(1).select(F.lit(float(p)).alias("__p"))
        probs_df = row if probs_df is None else probs_df.unionByName(row)
    targets = stats.crossJoin(F.broadcast(probs_df)).select(
        *group_cols,
        "__p",
        F.greatest(
            F.lit(1), F.ceil(F.col("__p") * F.col("__n")).cast("bigint")
        ).alias("__rank"),
    )
    return (
        ranked.join(F.broadcast(targets), [*group_cols, "__rank"])
        .select(
            *group_cols,
            F.col("__p").alias("p"),
            F.col("__rank").alias("rank"),
            F.col("__v").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# Bottom-k sample quantile sketch — the VALUE-CHECKABLE mergeable
# quantile sketch (the KMV/CMS recipe applied to quantiles, closing
# the family's q65-style gap for percentile_approx): a uniform row
# sample selected by the k smallest md5-uniform hashes of a unique row
# key (bottom-k / priority sampling, Cohen & Kaplan 2007 — public).
# Unlike KLL/t-digest (randomized compaction, engine-internal), the
# bottom-k sample is a pure ORDER BY over a deterministic hash: build,
# MERGE and estimation replay exactly in SQL.
#
# Merge closure (the stored-sketch rollup property): the k smallest
# (h, v) of the UNION of per-group bottom-k sketches == the bottom-k
# sketch of the union — any row dropped by its group's sketch has h
# above that group's k-th, hence above the union's k-th.
# ---------------------------------------------------------------------------
def bottomk_sample_sketches(
    df: DataFrame, ts_col: str, value_col: str, key_col: str, k: int = 256
) -> DataFrame:
    """Per-day bottom-k value samples: the ``k`` rows with smallest
    md5-uniform hash of ``key_col`` (ties broken by value — fully
    deterministic), stored as a sorted (h, v) struct array. Store
    these; any date-range quantile rollup is a merge + rank
    (:func:`bottomk_sample_merge` → :func:`sample_quantiles`) — no
    rescan. Nulls excluded per percentile semantics.

    Scale shape: one scan projecting (day, h, v), then a
    day-partitioned window keeps k per day — bounded task memory,
    never a whole day's values in one buffer."""
    from pyspark.sql.window import Window

    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int

    rows = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.to_date(ts_col).alias("day"),
            portable_hash_int(F.col(key_col).cast("string")).alias("h"),
            F.col(value_col).cast("double").alias("v"),
        )
        # distinct makes the sketch a SET of (h, v) — merge becomes
        # idempotent set-union + k-min (the KMV algebra), so replayed /
        # overlapping batches in the streaming maintenance path cannot
        # corrupt the sample. Cost: a genuine (hash, value) collision
        # between two rows dedups to one sample point — negligible and
        # deterministic.
        .distinct()
    )
    w = Window.partitionBy("day").orderBy("h", "v")
    kept = rows.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return kept.groupBy("day").agg(
        F.array_sort(F.collect_list(F.struct("h", "v"))).alias("sample")
    )


def bottomk_sample_merge(sketches: DataFrame, k: int = 256) -> DataFrame:
    """Merge stored per-group bottom-k samples into the union's
    bottom-k sample (closure — see module comment): explode, keep the
    k smallest (h, v). The global window ranks <= groups x k sketch
    rows — sketch-sized, never corpus-sized (the q98 merge shape)."""
    from pyspark.sql.window import Window

    ex = (
        sketches.select(F.explode("sample").alias("e"))
        .select(F.col("e.h").alias("h"), F.col("e.v").alias("v"))
        .distinct()  # idempotent: overlapping partials absorb
    )
    return (
        ex.withColumn("__rn", F.row_number().over(Window.orderBy("h", "v")))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def sample_quantiles(sample: DataFrame, probs: list[float]) -> DataFrame:
    """Quantile estimates from a merged (h, v) sample: rank by
    (v, h), estimate at rank ``ceil(p*m)`` (type-1 quantile of the
    SAMPLE — converges to the population quantile at O(1/sqrt(k))).
    Returns ``p, n_sample, est_value``. All frames here are
    sketch-sized (<= k rows), so the single-task window is bounded by
    construction."""
    from pyspark.sql.window import Window

    ranked = sample.withColumn(
        "__vr", F.row_number().over(Window.orderBy("v", "h"))
    ).withColumn("__m", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))))
    probs_df = None
    for p in sorted(set(probs)):
        row = sample.sparkSession.range(1).select(F.lit(float(p)).alias("p"))
        probs_df = row if probs_df is None else probs_df.unionByName(row)
    return (
        ranked.crossJoin(F.broadcast(probs_df))
        .filter(
            F.col("__vr")
            == F.greatest(
                F.lit(1), F.ceil(F.col("p") * F.col("__m")).cast("bigint")
            )
        )
        .select(
            "p",
            F.col("__m").cast("bigint").alias("n_sample"),
            F.col("v").alias("est_value"),
        )
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 16,
    n_buckets: int = 4096,
    avg_digits: int = 6,
    sum_decimal_scale: int = 2,
) -> DataFrame:
    """EXACT equi-depth (equal-frequency) histogram — the optimizer /
    data-profiling statistic that equal-WIDTH histograms can't replace
    on skewed columns. Bin b (1-based) holds the rows whose global
    value-rank r satisfies ``(r-1)·n_bins div n = b-1`` — pure integer
    arithmetic, so bin populations differ by at most one and the
    assignment has no float boundary.

    Ranks come from the same range-bucketed two-phase rank as
    :func:`exact_quantiles` (per-bucket counts → cumulative offsets
    over ``n_buckets`` rows, bucket-partitioned row_number) — no
    global sort, no per-group value buffer. Tied values may straddle a
    bin boundary, but every per-bin aggregate is tie-order
    independent: counts are rank-determined, and min/max/sum over
    copies of equal values don't care which copies landed where.

    Driver actions: one count + one (min, max) agg (bounded planning
    actions). Returns ``bin, n_rows, lo, hi, avg_value`` (avg =
    decimal-exact sum, one double division, rounded). The exact sum
    quantizes inputs to ``sum_decimal_scale`` decimal places (default
    2 — exact for cents-valued columns like l_extendedprice); raise it
    for higher-precision value columns."""
    from pyspark.sql.window import Window

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    df = df.filter(F.col(value_col).isNotNull())
    n = df.count()
    if n == 0:
        raise ValueError("equi_depth_histogram on an empty/all-null column")
    mn, mx = df.agg(
        F.min(value_col).alias("mn"), F.max(value_col).alias("mx")
    ).first()
    span = float(mx) - float(mn)
    width = (span / n_buckets) or 1.0
    v = F.col(value_col).cast("double")
    bucketed = df.select(v.alias("__v")).withColumn(
        "__b",
        F.least(
            F.floor((F.col("__v") - F.lit(float(mn))) / F.lit(width)),
            F.lit(n_buckets - 1),
        ).cast("bigint"),
    )
    counts = bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__cnt"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off")
    )
    w_in = Window.partitionBy("__b").orderBy("__v")
    ranked = (
        bucketed.withColumn("__rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "__b")
        .withColumn("__rank", (F.col("__off") + F.col("__rn")).cast("bigint"))
    )
    binned = ranked.withColumn(
        "bin",
        (F.expr(f"(__rank - 1) * {int(n_bins)} div {int(n)}") + F.lit(1)).cast(
            "bigint"
        ),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("__v").alias("lo"),
            F.max("__v").alias("hi"),
            F.round(
                F.sum(
                    F.col("__v").cast(f"decimal({22 + int(sum_decimal_scale)},{int(sum_decimal_scale)})")
                ).cast("double")
                / F.count(F.lit(1)).cast("double"),
                avg_digits,
            ).alias("avg_value"),
        )
        .orderBy("bin")
    )


def grouped_spearman(
    df: DataFrame,
    group_col: str,
    x_col: F.Column | str,
    y_col: F.Column | str,
    rho_digits: int = 9,
) -> DataFrame:
    """EXACT tie-corrected Spearman rank correlation per group —
    monotonic-association profiling that Pearson misreads on skewed
    columns. Uses the textbook tie-corrected form
    ``rho = (Sx + Sy - Σd²) / (2·sqrt(Sx·Sy))`` with
    ``S = (n³-n)/12 - Σ(t³-t)/12`` over tie groups, evaluated in
    INTEGER arithmetic throughout (everything scaled by 12; average
    ranks scaled by 2: ``2·avg_rank(v) = 2·|{u<v}| + |{u=v}| + 1``),
    so the only float ops are two exactly-representable int→double
    casts, two IEEE sqrts and one division — portable cross-engine
    (sqrt is correctly rounded; libm pow is not).

    No row-level rank window: ranks come from cumulative counts over
    the per-group DISTINCT-VALUE frame (the natural compression; the
    same range-bucket two-phase applies there if a group's distinct
    count ever rivals its row count). BIGINT bounds: sums reach ~4n³ —
    exact to n ≈ 100M rows/group; beyond that widen to DECIMAL(38,0).

    Returns ``{group}, n, spearman_rho`` (NULL when either column is
    constant within the group — correlation undefined)."""
    from pyspark.sql.window import Window

    g = group_col
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    base = df.select(F.col(g), x.alias("__x"), y.alias("__y"))

    def avg2_ranks(col: str) -> DataFrame:
        vc = base.groupBy(g, col).agg(F.count(F.lit(1)).alias("__c"))
        w = (
            Window.partitionBy(g)
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return vc.select(
            g,
            col,
            "__c",
            (
                F.lit(2) * F.coalesce(F.sum("__c").over(w), F.lit(0))
                + F.col("__c")
                + F.lit(1)
            )
            .cast("bigint")
            .alias("__a2"),
        )

    ax = avg2_ranks("__x").withColumnsRenamed({"__a2": "__a2x", "__c": "__cx"})
    ay = avg2_ranks("__y").withColumnsRenamed({"__a2": "__a2y", "__c": "__cy"})
    joined = base.join(ax.drop("__cx"), [g, "__x"]).join(ay.drop("__cy"), [g, "__y"])
    dd = joined.groupBy(g).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            (F.col("__a2x") - F.col("__a2y")) * (F.col("__a2x") - F.col("__a2y"))
        )
        .cast("bigint")
        .alias("__d2s"),
    )
    tx = ax.groupBy(g).agg(
        F.sum(F.col("__cx") * F.col("__cx") * F.col("__cx") - F.col("__cx"))
        .cast("bigint")
        .alias("__tx")
    )
    ty = ay.groupBy(g).agg(
        F.sum(F.col("__cy") * F.col("__cy") * F.col("__cy") - F.col("__cy"))
        .cast("bigint")
        .alias("__ty")
    )
    n3 = F.col("n") * F.col("n") * F.col("n") - F.col("n")
    fin = (
        dd.join(tx, g)
        .join(ty, g)
        .select(
            g,
            "n",
            (n3 - F.col("__tx")).alias("__sx"),
            (n3 - F.col("__ty")).alias("__sy"),
            "__d2s",
        )
    )
    rho = F.when(
        (F.col("__sx") > 0) & (F.col("__sy") > 0),
        F.round(
            (F.col("__sx") + F.col("__sy") - F.lit(3) * F.col("__d2s")).cast(
                "double"
            )
            / (
                F.lit(2.0)
                * F.sqrt(F.col("__sx").cast("double"))
                * F.sqrt(F.col("__sy").cast("double"))
            ),
            rho_digits,
        ),
    )
    return fin.select(g, "n", rho.alias("spearman_rho"))


def grouped_trend(
    df: DataFrame,
    group_col: str,
    x_col: F.Column,
    y_cents: F.Column,
    out_digits: int = 9,
) -> DataFrame:
    """Per-group simple linear regression (OLS y on x) from EXACT
    integer moment sums — trend estimation / drift profiling that
    needs no float accumulation: with integer x and integer-cents y,
    per-row products stay BIGINT-exact and the moment sums ``Σx, Σy,
    Σxy, Σx², Σy²`` accumulate as DECIMAL(38,0) (round-7 hardening:
    BIGINT sums overflowed at ~3M rows/group with micro-scaled ln
    inputs — the q308 Heaps stress caught it); the slope/intercept/R²
    numerators and denominators are exact DECIMAL(38,0) combinations,
    and floats appear only in the final divisions.

    ``slope = (nΣxy - ΣxΣy) / (nΣx² - (Σx)²)`` (cents per x-unit),
    ``intercept = (Σy - slope·Σx)/n`` in double with a fixed op order;
    ``R² = (num/dx) · (num/dy)`` as a product of two exact-integer→
    double ratios — the FACTORED form, because num² overflows any
    exact width long before num does (num ~ 10²⁷ at 10⁹ rows; its
    square needs 54 digits). Both engines compute the identical
    factored expression, so parity holds to the last ulp. Exactness
    bound: |num| < 10³⁸ (~10⁹ rows/group at micro-scaled values).
    NULL slope/R² for degenerate groups (constant x; constant y → R²
    undefined).

    Returns ``{group}, n, slope_cents, intercept_cents, r2``."""
    g = group_col
    d38 = "decimal(38,0)"
    base = df.select(
        F.col(g),
        x_col.cast("bigint").alias("__x"),
        y_cents.cast("bigint").alias("__y"),
    )
    # cast BEFORE multiplying: per-row products in DECIMAL too (a
    # micro-scaled y ~ 6e9 already squares past int64)
    xd, yd = F.col("__x").cast(d38), F.col("__y").cast(d38)
    m = base.groupBy(g).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xd).cast(d38).alias("__sx"),
        F.sum(yd).cast(d38).alias("__sy"),
        F.sum((xd * yd).cast(d38)).cast(d38).alias("__sxy"),
        F.sum((xd * xd).cast(d38)).cast(d38).alias("__sxx"),
        F.sum((yd * yd).cast(d38)).cast(d38).alias("__syy"),
    )
    nn = F.col("n").cast(d38)
    num = (nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast(d38)
    dx = (nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast(d38)
    dy = (nn * F.col("__syy") - F.col("__sy") * F.col("__sy")).cast(d38)
    slope = F.when(
        dx > 0, F.round(num.cast("double") / dx.cast("double"), out_digits)
    )
    intercept = F.when(
        dx > 0,
        F.round(
            (
                F.col("__sy").cast("double")
                - (num.cast("double") / dx.cast("double"))
                * F.col("__sx").cast("double")
            )
            / F.col("n").cast("double"),
            out_digits,
        ),
    )
    r2 = F.when(
        (dx > 0) & (dy > 0),
        F.round(
            (num.cast("double") / dx.cast("double"))
            * (num.cast("double") / dy.cast("double")),
            out_digits,
        ),
    )
    # + 0.0 maps a rounded -0.0 to +0.0 (a near-flat negative trend can
    # round to differently-signed zeros across engines; see verify
    # SKILL.md). NULLs pass through IEEE addition unchanged.
    return m.select(
        g,
        "n",
        (slope + F.lit(0.0)).alias("slope_cents"),
        (intercept + F.lit(0.0)).alias("intercept_cents"),
        (r2 + F.lit(0.0)).alias("r2"),
    )


def kmv_intersections(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
    est_digits: int = 4,
) -> DataFrame:
    """Pairwise distinct-key INTERSECTION estimates between groups
    from KMV/theta sketches — the set-operation closure of the sketch
    family (q98 gives union/rollup; audience-overlap questions need
    intersections). Theta-sketch semantics: each group retains its
    hashes below ``theta_g`` (the k-th smallest, or the full space
    when the sketch never filled); a pair's estimate counts common
    retained hashes below ``min(theta_a, theta_b)`` and scales by the
    sampled fraction: ``est = n_common · 2^32 / theta_min``. Sketches
    that never filled make the formula collapse to the EXACT common
    count (theta = 2^32).

    Every quantity is integer until the single scaling division; the
    exact intersection and absolute error ride along for measurement
    (the q109 error-column pattern). Returns ``group_a, group_b,
    n_common_sample, est_inter, exact_inter, abs_err``. Scale: one
    distinct shuffle of (group, hash), k-sized sketches joined on the
    hash, and an exact verification join on the raw keys (drop it in
    production — it exists to measure the estimator)."""
    from pyspark.sql.window import Window

    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int

    space = 4294967296.0
    g = group_col
    hashed = df.select(
        F.col(g), portable_hash_int(F.col(key_col).cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy(g).orderBy("h")
    kept = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    thetas = kept.groupBy(g).agg(
        F.coalesce(
            F.max(F.when(F.col("__rn") == k, F.col("h"))),
            F.lit(int(space)),
        )
        .cast("bigint")
        .alias("__theta")
    )
    sample = kept.join(thetas, g).filter(F.col("h") < F.col("__theta")).select(g, "h")
    tpair = (
        thetas.select(F.col(g).alias("group_a"), F.col("__theta").alias("__ta"))
        .crossJoin(
            thetas.select(F.col(g).alias("group_b"), F.col("__theta").alias("__tb"))
        )
        .filter(F.col("group_a") < F.col("group_b"))
        .select(
            "group_a", "group_b", F.least("__ta", "__tb").alias("__tmin")
        )
    )
    common = (
        sample.alias("a")
        .join(sample.alias("b"), on=[F.col("a.h") == F.col("b.h")])
        .select(
            F.col(f"a.{g}").alias("group_a"),
            F.col(f"b.{g}").alias("group_b"),
            F.col("a.h").alias("h"),
        )
        .filter(F.col("group_a") < F.col("group_b"))
        .join(F.broadcast(tpair), ["group_a", "group_b"])
        .filter(F.col("h") < F.col("__tmin"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common_sample"))
    )
    keys = df.select(F.col(g), F.col(key_col).alias("kk")).distinct()
    exact = (
        keys.alias("a")
        .join(keys.alias("b"), on=[F.col("a.kk") == F.col("b.kk")])
        .select(F.col(f"a.{g}").alias("group_a"), F.col(f"b.{g}").alias("group_b"))
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
    )
    return (
        tpair.join(common, ["group_a", "group_b"], "left")
        .join(exact, ["group_a", "group_b"], "left")
        .select(
            "group_a",
            "group_b",
            F.coalesce("n_common_sample", F.lit(0)).cast("bigint").alias(
                "n_common_sample"
            ),
            F.round(
                F.coalesce("n_common_sample", F.lit(0)).cast("double")
                * F.lit(space)
                / F.col("__tmin").cast("double"),
                est_digits,
            ).alias("est_inter"),
            F.coalesce("exact_inter", F.lit(0)).cast("bigint").alias("exact_inter"),
        )
        .withColumn(
            "abs_err",
            F.round(
                F.abs(F.col("est_inter") - F.col("exact_inter").cast("double")),
                est_digits,
            ),
        )
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet et al. 2007) — unlike q65's opaque
# Spark-internal DataSketches HLL, every piece here is SQL arithmetic
# (md5 hash, bit shifts, binary-string length), so registers, merge
# AND estimate replay exactly in DuckDB: the estimator itself becomes
# oracle-hashable.
# ---------------------------------------------------------------------------
def hll_registers(
    df: DataFrame, group_cols: list[str], key_col: str, p: int = 4
) -> DataFrame:
    """Per-group portable-HLL registers of ``key_col``: ``m = 2^p``
    rows per group, one per bucket, ``register = max rho`` where
    ``rho = (32-p) - bitlen(h >> p) + 1`` over the group's md5-uniform
    32-bit hashes (``bitlen`` via ``length(bin(w))`` — identical in
    Spark and DuckDB; ``w = 0`` -> ``rho = 33-p``). Empty buckets are
    densified to register 0 so the register vector is always complete
    (merge = element-wise max, estimate = fixed-length fold).

    Scale shape: hashing is scan-side; one groupBy on (group, bucket)
    with a max partial agg (map-side combinable); the bucket spine is
    a per-group ``explode(sequence(0, m-1))`` on the distinct-group
    frame — sketch-sized, never corpus-sized. Register arithmetic is
    pure integers, so stored register tables merge across any scope.
    """
    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int

    m = 1 << p
    hashed = df.select(
        *group_cols,
        portable_hash_int(F.col(key_col).cast("string")).alias("__h"),
    )
    w = F.shiftright(F.col("__h"), p)
    rho = F.when(w == 0, F.lit(33 - p)).otherwise(
        F.lit(33 - p) - F.length(F.bin(w))
    )
    got = (
        hashed.select(
            *group_cols, (F.col("__h") % m).alias("bucket"), rho.alias("__rho")
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").alias("register"))
    )
    spine = (
        df.select(*group_cols)
        .distinct()
        .select(*group_cols, F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("bucket"))
    )
    return spine.join(got, [*group_cols, "bucket"], "left").select(
        *group_cols,
        F.col("bucket").cast("int").alias("bucket"),
        F.coalesce("register", F.lit(0)).cast("int").alias("register"),
    )


def hll_estimate_from_registers(
    registers: DataFrame, group_cols: list[str], p: int = 4, digits: int = 4
) -> DataFrame:
    """Fold a complete register vector into the HLL estimate:
    ``E = alpha_m * m^2 / sum_j 2^(-M_j)``, with the standard
    small-range linear-counting correction ``m * ln(m/V)`` when
    ``E <= 2.5m`` and some register is zero (V = zero-register count).

    Cross-engine exactness: each ``2^(-M_j)`` is an exact power of two
    (looked up from a literal array, no libm pow), so the register sum
    is EXACT in double regardless of aggregation order (all partials
    are multiples of 2^(p-33) bounded by m — inside one ulp window);
    the branch predicate therefore agrees bitwise across engines, and
    the only libm op left is the correction path's single ``ln``
    (rounded to ``digits``). alpha is computed in-plan with the same
    double-op order both sides.
    """
    m = 1 << p
    # exact powers of two 2^0 .. 2^-(33-p); python floats are exact here
    pow2 = F.array(*[F.lit(2.0**-i) for i in range(34 - p)])
    alpha = (
        F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
        if m >= 128
        else F.lit({16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.673))
    )
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.element_at(pow2, F.col("register") + 1)).alias("__z"),
        F.sum(F.when(F.col("register") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_registers"),
    )
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) / F.col("__z")
    lin = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("n_zero_registers").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5) * F.lit(float(m))) & (F.col("n_zero_registers") > 0), lin
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        "n_zero_registers",
        F.round(est, digits).alias("est_distinct"),
    )


def gini_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tie_col: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-group EXACT Gini coefficient of a non-negative BIGINT
    ``value_col`` (e.g. revenue in cents), fully in-plan.

    With per-group values sorted ascending (``tie_col`` breaks ties —
    tie order cannot change the result, equal values contribute equal
    products under any permutation of their ranks) and 1-based rank i:

        G = (2·sum(i·x_i) - (n+1)·S) / (n·S),  S = sum(x)

    an exact ratio of integers. The rank is the grouped two-phase
    bucketed rank (``exact_quantiles_by`` discipline): per-group range
    buckets from a broadcast (min, max) table, per-bucket partitioned
    ``row_number``, cumulative bucket offsets — no per-group
    single-task window, so a group with 10^9 members still ranks in
    parallel. The rounded ratio is computed with the integer
    round-half-away quotient ``(2·10^d·num + den) div (2·den)`` —
    exact while ``10^d·num`` fits BIGINT (num ≤ 2·n·S; document the
    cents magnitude at your scale). Groups with S = 0 yield NULL.

    Returns ``*group_cols, n, total, gini`` (gini at 6 decimals).
    """
    from pyspark.sql.window import Window

    v = F.col(value_col).cast("bigint")
    base = df.filter(v.isNotNull()).select(
        *group_cols, v.alias("__v"), F.col(tie_col).alias("__tie")
    )
    stats = base.groupBy(*group_cols).agg(
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
        F.count(F.lit(1)).alias("__n"),
    )
    width = F.greatest(
        (F.col("__mx") - F.col("__mn")).cast("double") / F.lit(float(n_buckets)),
        F.lit(1e-300),
    )
    bucketed = base.join(F.broadcast(stats), group_cols).withColumn(
        "__b",
        F.least(
            F.floor((F.col("__v") - F.col("__mn")).cast("double") / width),
            F.lit(n_buckets - 1),
        ).cast("bigint"),
    )
    counts = bucketed.groupBy(*group_cols, "__b").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *group_cols,
        "__b",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy(*group_cols, "__b").orderBy("__v", "__tie")
    ranked = (
        bucketed.withColumn("__rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), [*group_cols, "__b"])
        .withColumn("__rank", (F.col("__off") + F.col("__rn")).cast("bigint"))
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__v").cast("bigint").alias("total"),
        F.sum(F.col("__rank") * F.col("__v")).cast("bigint").alias("__ix"),
    )
    # round-half-away of 10^6 * num/den in DECIMAL(38,0) arithmetic —
    # 10^6 * num reaches ~10^21 at 10^12-cent group totals, past BIGINT;
    # decimal holds 38 digits and (x - x % d) / d is an exact integer
    # quotient <= 10^6, representable exactly at any decimal scale.
    d38 = "decimal(38,0)"
    num = (
        F.lit(2).cast(d38) * F.col("__ix")
        - (F.col("n") + 1).cast(d38) * F.col("total")
    ).cast(d38)
    den = (F.col("n").cast(d38) * F.col("total")).cast(d38)
    x = (F.lit(2000000).cast(d38) * num + den).cast(d38)
    d = (F.lit(2).cast(d38) * den).cast(d38)
    q6 = ((x - x % d) / d).cast("bigint")
    return agg.select(
        *group_cols,
        "n",
        "total",
        F.when(den > 0, q6.cast("double") / F.lit(1000000.0)).alias("gini"),
    )


def weighted_median_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-group EXACT weighted (lower) median of a BIGINT value with
    BIGINT weights: the smallest v with 2·cumweight(v) >= W. The
    frame first collapses to one row per (group, v) — weighted
    quantiles are tie-order-free by construction — then runs the
    grouped two-phase bucketed rank with WEIGHT sums instead of row
    counts (`exact_quantiles_by` discipline: per-group range buckets
    from a broadcast stats table, per-bucket cumulative weight
    offsets, within-bucket running sums; no per-group single-task
    window). The pick is a plain conditional MIN — no final join.

    Returns ``*group_cols, total_weight, weighted_median`` (median as
    BIGINT, the original value scale).
    """
    from pyspark.sql.window import Window

    b = (
        df.filter(
            F.col(value_col).isNotNull() & (F.col(weight_col) > 0)
        )
        .groupBy(*group_cols, F.col(value_col).cast("bigint").alias("__v"))
        .agg(F.sum(F.col(weight_col).cast("bigint")).alias("__w"))
    )
    stats = b.groupBy(*group_cols).agg(
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
        F.sum("__w").alias("__wt"),
    )
    width = F.greatest(
        (F.col("__mx") - F.col("__mn")).cast("double") / F.lit(float(n_buckets)),
        F.lit(1e-300),
    )
    bucketed = b.join(F.broadcast(stats), group_cols).withColumn(
        "__b",
        F.least(
            F.floor((F.col("__v") - F.col("__mn")).cast("double") / width),
            F.lit(n_buckets - 1),
        ).cast("bigint"),
    )
    counts = bucketed.groupBy(*group_cols, "__b").agg(
        F.sum("__w").alias("__bw")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *group_cols,
        "__b",
        F.coalesce(F.sum("__bw").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = (
        Window.partitionBy(*group_cols, "__b")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        bucketed.withColumn("__run", F.sum("__w").over(w_in))
        .join(F.broadcast(offsets), [*group_cols, "__b"])
        .withColumn("__cum", (F.col("__off") + F.col("__run")).cast("bigint"))
    )
    return cum.groupBy(*group_cols).agg(
        F.max("__wt").cast("bigint").alias("total_weight"),
        F.min(
            F.when(2 * F.col("__cum") >= F.col("__wt"), F.col("__v"))
        )
        .cast("bigint")
        .alias("weighted_median"),
    )


def grouped_two_phase_rank(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tie_col: str,
    out_col: str = "rank",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-group 1-based row_number by a numeric ``value_col``
    (``tie_col`` ascending tie-break) WITHOUT a per-group single-task
    window — the exposed form of the rank stage shared by
    ``exact_quantiles_by`` / ``gini_by`` / ``weighted_median_by``:
    per-group range buckets from a broadcast (min, max) table,
    within-bucket partitioned row_number, cumulative bucket-count
    offsets. Returns the input rows (value and tie columns preserved)
    plus ``out_col``; nulls excluded.
    """
    from pyspark.sql.window import Window

    v = F.col(value_col).cast("bigint")
    base = df.filter(v.isNotNull()).select(
        *group_cols, v.alias("__v"), F.col(tie_col).alias("__tie")
    )
    stats = base.groupBy(*group_cols).agg(
        F.min("__v").alias("__mn"), F.max("__v").alias("__mx")
    )
    width = F.greatest(
        (F.col("__mx") - F.col("__mn")).cast("double") / F.lit(float(n_buckets)),
        F.lit(1e-300),
    )
    bucketed = base.join(F.broadcast(stats), group_cols).withColumn(
        "__b",
        F.least(
            F.floor((F.col("__v") - F.col("__mn")).cast("double") / width),
            F.lit(n_buckets - 1),
        ).cast("bigint"),
    )
    counts = bucketed.groupBy(*group_cols, "__b").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *group_cols,
        "__b",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy(*group_cols, "__b").orderBy("__v", "__tie")
    return (
        bucketed.withColumn("__rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), [*group_cols, "__b"])
        .withColumn(out_col, (F.col("__off") + F.col("__rn")).cast("bigint"))
        .drop("__b", "__rn", "__off", "__mn", "__mx")
    )
