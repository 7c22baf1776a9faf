"""Data-quality gates — the reference's runtime defensive checks as
first-class operators.

Reference has three ad-hoc guards (SURVEY §5): SCD-column presence
(``jobs/final_dim_load.py:97-101``), key-overlap ``exit(1)``
(``jobs/final_fact_load.py:56-58``; ours is facts.check_key_overlap),
and non-empty output (``:145``). Generalized here:

- :func:`validate_schema` — column presence + exact type check against
  an expected ``StructType`` (driver-side, free: no job runs);
- :func:`expect` — declarative row-level rules (not-null, unique key,
  accepted values, ranges) evaluated in ONE pass over the data,
  returning per-rule violation counts; :func:`assert_expectations`
  raises if any rule fails.

Scale: all rules are fused into a single aggregate (one scan, one
reduce) rather than one action per rule — at 100 TB, N separate
``count()`` guards would each rescan the table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaValidationError(ValueError):
    pass


class ExpectationError(ValueError):
    pass


def validate_schema(
    df: DataFrame, expected: T.StructType, allow_extra: bool = True
) -> None:
    """Check column presence and exact Spark types; raises with the full
    list of problems (not just the first)."""
    actual = {f.name: f.dataType for f in df.schema.fields}
    problems: list[str] = []
    for f in expected.fields:
        if f.name not in actual:
            problems.append(f"missing column: {f.name} ({f.dataType.simpleString()})")
        elif actual[f.name] != f.dataType:
            problems.append(
                f"type mismatch for {f.name}: expected "
                f"{f.dataType.simpleString()}, got {actual[f.name].simpleString()}"
            )
    if not allow_extra:
        extra = set(actual) - {f.name for f in expected.fields}
        problems.extend(f"unexpected column: {c}" for c in sorted(extra))
    if problems:
        raise SchemaValidationError("; ".join(problems))


def expect(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique_key: Sequence[str] | None = None,
    accepted_values: dict[str, Sequence] | None = None,
    ranges: dict[str, tuple[float | None, float | None]] | None = None,
) -> dict[str, int]:
    """Evaluate all rules in one pass; returns rule -> violation count.

    ``unique_key`` needs its own aggregation (count distinct over the
    key) — still a single extra job, not one per column.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    for c in not_null:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"not_null:{c}"))
    for c, vals in (accepted_values or {}).items():
        bad = ~F.col(c).isin(*list(vals)) | F.col(c).isNull()
        aggs.append(F.sum(bad.cast("long")).alias(f"accepted_values:{c}"))
    for c, (lo, hi) in (ranges or {}).items():
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(c) < lo)
        if hi is not None:
            cond = cond | (F.col(c) > hi)
        aggs.append(F.sum(cond.cast("long")).alias(f"range:{c}"))

    row = df.agg(*aggs).first().asDict()
    total = row.pop("__total")
    result = {k: int(v or 0) for k, v in row.items()}

    if unique_key:
        n_keys = df.select(*unique_key).distinct().count()
        result[f"unique_key:{','.join(unique_key)}"] = total - n_keys
    return result


def assert_expectations(df: DataFrame, **rules) -> None:
    """Raise ExpectationError listing every failed rule."""
    violations = {k: v for k, v in expect(df, **rules).items() if v > 0}
    if violations:
        raise ExpectationError(
            "; ".join(f"{k}: {v} violating rows" for k, v in sorted(violations.items()))
        )


def observe_quality(
    df: DataFrame,
    name: str = "dq",
    not_null: Sequence[str] = (),
    ranges: dict[str, tuple[float | None, float | None]] | None = None,
):
    """Attach :func:`expect`-style counters to the DataFrame itself via
    ``df.observe()``: the metrics are computed DURING whatever action
    the caller already runs (the write, the count) — ZERO extra scan,
    unlike ``expect`` which runs its own aggregate job. This is how a
    100 TB pipeline collects DQ counters on the hot path: guards that
    rescan the table double its cost; observed metrics ride along in
    the same whole-stage-codegen pass.

    Returns ``(df, observation)`` — run an action on the returned df,
    then read ``observation.get`` (a dict: ``n_rows`` plus one
    violation counter per rule). Works identically under batch and
    ``foreachBatch`` micro-batches.
    """
    from pyspark.sql import Observation

    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"not_null:{c}"))
    for c, (lo, hi) in (ranges or {}).items():
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(c) < lo)
        if hi is not None:
            cond = cond | (F.col(c) > hi)
        aggs.append(F.sum(cond.cast("long")).alias(f"range:{c}"))
    obs = Observation(name)
    return df.observe(obs, *aggs), obs


def dq_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column data-quality profile as a DATAFRAME (composable /
    sink-able, unlike :func:`expect`'s driver-side dict): row count,
    null count and distinct count per column. All statistics come from
    ONE aggregate over one scan (count_distinct fuses into the same
    Aggregate), then a stack() to long form — no per-column jobs.
    Counts only, no min/max: stringified extrema don't round-trip
    engines (float formatting differs), counts always do."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    stack_expr = "stack({n}, {args}) AS (column, n_nulls, n_distinct)".format(
        n=len(cols),
        args=", ".join(f"'{c}', __nulls_{c}, __dist_{c}" for c in cols),
    )
    return wide.selectExpr("__n AS n_rows", stack_expr).select(
        "column", "n_rows", "n_nulls", "n_distinct"
    )


def exact_zscore_outliers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    z: int = 3,
) -> DataFrame:
    """Per-group z-score outliers computed ENTIRELY in exact integer
    arithmetic — no stddev(), no float division, no epsilon.

    Float z-scores are engine-unstable at the margin (summation order
    shifts the last ulp of stddev and flips boundary rows — the q29
    lesson). For a 2-decimal value this is avoidable: with cents
    ``x``, group count ``n``, sum ``s`` and sum of squares ``ss``,

        (x - s/n)^2 > z^2 * (n*ss - s^2) / (n*(n-1))
        <=> (n*x - s)^2 * (n-1) > z^2 * n * (n*ss - s^2)

    — both sides integer-exact in DECIMAL(38,0) (HUGEINT on DuckDB),
    so every engine flags the IDENTICAL row set at any scale. One
    group aggregate (broadcast back over the group key) + one
    scan-side filter; n<2 groups have no variance and emit nothing.
    """
    d38 = "decimal(38,0)"
    cents = (F.col(value_col).cast("decimal(12,2)") * 100).cast(d38)
    enriched = df.withColumn("__c", cents)
    stats = enriched.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(d38).alias("__n"),
        F.sum("__c").cast(d38).alias("__s"),
        F.sum(F.col("__c") * F.col("__c")).cast(d38).alias("__ss"),
    )
    dev = F.col("__c") * F.col("__n") - F.col("__s")
    lhs = dev * dev * (F.col("__n") - 1)
    rhs = (
        F.lit(z * z).cast(d38)
        * F.col("__n")
        * (F.col("__n") * F.col("__ss") - F.col("__s") * F.col("__s"))
    )
    return (
        enriched.join(F.broadcast(stats), list(group_cols))
        .filter((F.col("__n") >= 2) & (lhs > rhs))
        .drop("__c", "__n", "__s", "__ss")
    )
