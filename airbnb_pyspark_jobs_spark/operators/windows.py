"""Time-window & sessionization operators over event streams (batch form).

The reference has no event-time operators (SURVEY §2.6: a single global
row_number); these are north-star extensions built on Spark's native
window machinery:

- :func:`tumbling_agg` — fixed windows via ``F.window`` (works in batch
  AND structured streaming; the streaming module reuses it).
- :func:`sessionize` — gap-based session ids via lag + cumulative sum
  (the classic two-window formulation, partition-parallel by user).
- :func:`session_stats` — per-session aggregates.

Scale: both shuffle once on the entity key (user_id); windows are
PARTITIONED (never global); sessionize's running sum uses an
unbounded-preceding frame within (user) partitions only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling_agg(
    events: DataFrame,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Fixed-window aggregation; emits ``window_start``/``window_end``.

    With ``slide`` < ``duration`` this becomes a sliding (hopping)
    window: each event lands in duration/slide windows (Spark expands
    this row-side before the aggregation — shuffle volume scales by the
    overlap factor; keep duration/slide small at scale).
    """
    w = (
        F.window(F.col(ts_col), duration, slide)
        if slide
        else F.window(F.col(ts_col), duration)
    )
    return (
        events.groupBy(w.alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Assign gap-based session ids per user.

    A new session starts when the time since the previous event of the
    same user exceeds ``gap``. Adds ``session_seq`` (1-based per user).
    Deterministic ordering via ``order_tiebreak`` for equal timestamps.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = F.expr(f"interval {gap}")
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_session = (
        F.when(prev_ts.isNull(), F.lit(1))
        .when(F.col(ts_col) > prev_ts + gap_us, F.lit(1))
        .otherwise(F.lit(0))
    )
    run = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_seq", F.sum(new_session).over(run).cast("bigint"))


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    session_col: str = "session_seq",
) -> DataFrame:
    """Per-session stats: start/end, event count, duration in microseconds
    (integer-exact; avoids float epoch math)."""
    return sessions.groupBy(user_col, session_col).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))).alias("duration_us"),
    )


def keyed_dedupe(
    df: DataFrame,
    keys: list[str] | None = None,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Batch twin of streaming/events.streaming_dedupe: one row per key,
    keeping the FIRST in ``order_by`` order (default event time).

    ``dropDuplicatesWithinWatermark`` keeps the first-ARRIVED row per key
    within the watermark horizon; replaying a bounded source through it
    and running this over the same data converge on identical rows when
    duplicates are exact replays, and on the earliest-by-event-time row
    otherwise — the deterministic batch semantics an oracle can check
    (plain dropDuplicates keeps an arbitrary row). Partitioned window,
    one shuffle on the key — never a global sort.
    """
    keys = keys if keys is not None else ["event_id"]
    order_by = order_by if order_by is not None else ["ts"]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
