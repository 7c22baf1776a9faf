"""As-of (point-in-time) join — the canonical time-series operator
Spark's join surface lacks, composed from a union + one partitioned
window (no range self-join, no UDFs).

For each left row, attach the LATEST right row with ``right.ts <=
left.ts`` within the same key — price-as-of-trade, last-event-before-
purchase, dimension-as-of-fact. The classic relational encodings are an
O(n·m) range self-join or a per-left-row subquery; this implementation
is the union-sort trick:

1. tag both sides and union them on (key, ts) with a side marker that
   sorts right rows BEFORE left rows at equal ts (at-or-before
   semantics — a right row at exactly left.ts matches);
2. one window over (key) ordered by (ts, side, tie-breaks) carries the
   last non-null right payload forward (``last(..., ignorenulls)`` with
   an unbounded-preceding row frame);
3. keep the left rows.

Cost: ONE shuffle on the key (the window sort), linear in |L|+|R| —
the 100 TB plan. Determinism: callers must ensure at most one right
row per (key, ts) (pre-dedupe with ``keyed_dedupe``); otherwise which
same-ts row wins is tie-broken by the ordered right columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row at or
    before its timestamp (nulls when no prior right row exists).

    ``right_cols`` are the right-side payload columns to carry (default:
    everything except the key and timestamp); they come back suffixed,
    plus ``<right_ts><suffix>`` with the matched timestamp.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols]
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right first at equal ts
        payload.alias("__payload"),
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    unioned = r.withColumn("__left", F.lit(None).cast(l.schema["__left"].dataType)).unionByName(l)

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__payload").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__match.__rts").alias(f"{right_ts}{suffix}"))
    out_cols.extend(F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols)
    return carried.select(*out_cols)
