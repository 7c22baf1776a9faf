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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _micros(c: Column) -> Column:
    """Timestamp → exact BIGINT epoch microseconds (cast through
    ``timestamp`` so TIMESTAMP_NTZ inputs resolve under the session TZ,
    identity here — sessions run UTC)."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join with pandas ``merge_asof`` semantics: every left
    row, plus the right row matched by ``direction`` —

    - ``backward`` (default): latest right row at or before the left
      timestamp;
    - ``forward``: earliest right row at or after it;
    - ``nearest``: whichever of the two is closer in time (exact tie →
      the backward match, pandas' rule).

    ``tolerance_seconds`` (optional) nulls out a match farther than the
    tolerance in the chosen direction — the guard that stops a stale
    quote/state enriching an event from hours later.

    ``right_cols`` are the right-side payload columns to carry (default:
    everything except the key and timestamp); they come back suffixed,
    plus ``<right_ts><suffix>`` with the matched timestamp.

    Scale: ONE union + key-partitioned ordered window per direction
    (rows, not ranges — the merge-sorted carry-forward shape); nearest
    runs both passes and picks scan-side. No range join, no fan-out.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
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
    unioned = r.withColumn(
        "__left", F.lit(None).cast(l.schema["__left"].dataType)
    ).unionByName(l)

    def carry(forward: bool) -> F.Column:
        # forward = the same carry-forward, scanning time DESCENDING:
        # the last non-null payload at-or-above the row is the earliest
        # right row at-or-after it. For right rows at EQUAL ts, __side
        # ordering puts them before the left row in both scans, so
        # equal-ts rights match in both directions (dt = 0).
        ts_order = F.col("__ts").desc() if forward else F.col("__ts").asc()
        w = (
            Window.partitionBy("__k")
            .orderBy(
                ts_order, F.col("__side").asc(), F.col("__payload").asc_nulls_last()
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        m = F.last("__payload", ignorenulls=True).over(w)
        if tolerance_seconds is not None:
            # exact BIGINT microseconds — a double epoch-seconds cast
            # loses ~2.4e-7 s at current epochs, enough to flip a match
            # exactly at the tolerance boundary vs an integer-micro
            # oracle (ADVICE r7).
            dt = (
                _micros(m.getField("__rts")) - _micros(F.col("__ts"))
                if forward
                else _micros(F.col("__ts")) - _micros(m.getField("__rts"))
            )
            m = F.when(dt <= F.lit(int(tolerance_seconds) * 1_000_000), m)
        return m

    # both carries run over the SAME union frame (duplicate-left-safe:
    # no self-join; nearest costs one extra in-partition sort)
    if direction == "backward":
        staged = unioned.withColumn("__pick", carry(False))
    elif direction == "forward":
        staged = unioned.withColumn("__pick", carry(True))
    else:
        staged = unioned.withColumn("__mb", carry(False)).withColumn(
            "__mf", carry(True)
        )
        # exact-tie comparison in integer microseconds (see carry())
        db = _micros(F.col("__ts")) - _micros(F.col("__mb.__rts"))
        df_ = _micros(F.col("__mf.__rts")) - _micros(F.col("__ts"))
        staged = staged.withColumn(
            "__pick",
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(db <= df_, F.col("__mb"))  # exact tie -> backward (pandas rule)
            .otherwise(F.col("__mf")),
        )
    carried = staged.filter(F.col("__side") == 1)

    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__pick.__rts").alias(f"{right_ts}{suffix}"))
    out_cols.extend(F.col(f"__pick.{c}").alias(f"{c}{suffix}") for c in right_cols)
    return carried.select(*out_cols)


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
    extra_equi: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Point-in-interval join as a bucketed EQUI-join (the 100 TB plan
    for range joins with no natural equality key).

    Matches every ``points`` row to every ``intervals`` row with
    ``start_ts <= point_ts < end_ts``. Declared naively, Spark plans a
    pure range predicate as BroadcastNestedLoopJoin (or a cartesian
    product) — O(|P|·|I|) and a scale-killer. Instead both sides are
    assigned epoch-time buckets of ``bucket_seconds``: a point falls in
    exactly ONE bucket, an interval is exploded to EVERY bucket it
    overlaps, and the join becomes hash-equi on bucket id with the
    exact range predicate evaluated inside the join condition. Each
    (point, interval) match meets in precisely the point's bucket, so
    no post-join dedup is needed.

    Cost: one shuffle of each side on bucket id; interval explosion is
    ``ceil(len/bucket)+1`` copies — pick ``bucket_seconds`` near the
    typical interval length (~2 copies). Skewed hot buckets can reuse
    ``operators.skew.salted_join`` semantics if needed.

    ``how``: 'inner' or 'left' (left preserves all points — safe
    because points are never replicated; interval-preserving outer
    joins would duplicate unmatched exploded copies and are rejected).
    ``extra_equi``: optional [(point_col, interval_col)] equality keys
    ANDed into the join (e.g. user_id attribution).
    Precondition: the two frames' column names are disjoint and
    ``start_ts <= end_ts`` on every interval row.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"how={how!r}: only inner/left joins are point-safe")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint; overlapping: {sorted(overlap)}")

    w = int(bucket_seconds)

    def _bucket(c: str) -> Column:
        # cast to double = epoch seconds incl. fractional microseconds.
        # A wrong bucket here would be a silent candidate MISS (the
        # exact predicate below can't rescue a pair that never joins),
        # so the assignment must be exact, and it is for µs data:
        # integer multiples of w seconds are double-exact (< 2^53), and
        # any other µs timestamp sits ≥ 1 µs from a boundary while the
        # cast's worst error is a half-ulp ≈ 1.2e-7 s at epoch
        # magnitude — two orders too small to cross it.
        return F.floor(F.col(c).cast("double") / F.lit(w)).cast("long")

    p = points.withColumn("__pb", _bucket(point_ts))
    iv = intervals.withColumn(
        "__ib", F.explode(F.sequence(_bucket(start_ts), _bucket(end_ts)))
    )
    cond = (
        (p["__pb"] == iv["__ib"])
        & (p[point_ts] >= iv[start_ts])
        & (p[point_ts] < iv[end_ts])
    )
    for pc, ic in extra_equi or []:
        cond = cond & (p[pc] == iv[ic])
    return p.join(iv, cond, how).drop("__pb", "__ib")
