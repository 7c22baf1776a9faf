"""Custom stateful streaming operators via applyInPandasWithState.

Built-in watermarked aggs cover windows/dedup (streaming/events.py);
this module shows the ARBITRARY-state path — a per-key running profile
that survives across micro-batches — using the public
``applyInPandasWithState`` API (Arrow-batched, GroupState-backed).

Scale: state lives in the state store partitioned by the grouping key
(user_id) — the same hash partitioning every micro-batch, no
re-shuffling of state; use GroupStateTimeout to bound state lifetime for
unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (event count, value total) across micro-batches.

    Emits the updated running totals for each user seen in a batch
    (update output mode). State: (n, total) per user.
    """

    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 transformWithStateInPandas: the successor API to
# applyInPandasWithState — named, independently-evolvable state
# variables (value/list/map) with per-state TTL, timers, and schema
# evolution. Same state-store partitioning story (state lives with the
# grouping key's hash partition; no re-shuffle across micro-batches).
#
# Runtime gate: the TWS streaming runner speaks protobuf to the JVM
# (pyspark.sql.streaming.proto), so executing a TWS query needs the
# python `protobuf` package — absent in this container. The operator
# builds the plan either way; HAVE_TWS_RUNTIME tells callers/tests
# whether it can actually run (the applyInPandasWithState twin above is
# the runnable-here path with identical semantics minus per-state TTL).
# ---------------------------------------------------------------------------
try:  # capability probe, not an import we use directly
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAVE_TWS_RUNTIME = True
except ImportError:
    HAVE_TWS_RUNTIME = False

TWS_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("n_batches", T.LongType()),
    ]
)

_TWS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("batches", T.LongType()),
    ]
)


def running_user_totals_tws(stream: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Per-user running totals via the transformWithStateInPandas API.

    Tracks (n_events, total_value, n_batches-that-touched-this-user) in
    a ValueState. ``ttl_ms`` bounds state lifetime for unbounded key
    spaces — the per-state TTL knob applyInPandasWithState lacks
    (GroupStateTimeout is per-operator and manual there).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ttl = ttl_ms

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", _TWS_STATE_SCHEMA, ttlDurationMs=ttl
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (user_id,) = key
            if self._totals.exists():
                n, total, batches = self._totals.get()
            else:
                n, total, batches = 0, 0.0, 0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            batches += 1
            self._totals.update((n, total, batches))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "n_batches": [batches],
                }
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=TWS_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# Streaming CEP: error-burst alerts — the stateful twin of the batch
# q250 gaps-and-islands detector, as a production alert stream: per
# user, a run of errors each within `gap_us` of the previous; when the
# run reaches `min_errors` the operator emits (and keeps updating) an
# alert row keyed by the burst's start. State is three longs per user
# (last error, burst start, run length) in the state store — hash-
# partitioned by user_id once, never re-shuffled across micro-batches.
# A burst that ends (gap exceeded) is emitted in its FINAL size before
# the state resets, so replaying the event stream yields exactly the
# batch q250 rows (asserted in tests incl. a cross-batch restart).
# Rows within a micro-batch are sorted by (ts, event_id) in the Arrow
# batch — cross-batch order is the source's responsibility (file
# sources: one file per trigger, checkpointed).
# ---------------------------------------------------------------------------
BURST_ALERT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("burst_start", T.TimestampType()),
        T.StructField("n_errors", T.LongType()),
    ]
)

_BURST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("run", T.LongType()),
    ]
)


def error_burst_alerts(
    stream: DataFrame,
    gap_us: int = 86_400_000_000,
    min_errors: int = 3,
) -> DataFrame:
    """Alert stream of per-user error bursts (>= ``min_errors`` errors,
    consecutive gaps <= ``gap_us``). Update output mode: an alert row
    re-emits with its growing ``n_errors`` while the burst is alive and
    once more at its final size when a later event closes it."""

    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        (user_id,) = key
        last_us, start_us, run = (
            state.get if state.exists else (None, None, 0)
        )
        out_starts: list[int] = []
        out_ns: list[int] = []
        # A key's micro-batch data can span MULTIPLE Arrow chunks (that
        # is why the API hands an iterator), and chunk order after the
        # shuffle is not time order — materialize the whole key-batch
        # and sort GLOBALLY before scanning, else out-of-order events
        # across chunk boundaries fabricate gaps / split bursts for any
        # user with more rows than arrow.maxRecordsPerBatch per trigger.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        batch = (
            pd.concat(chunks).sort_values(["ts", "event_id"]) if chunks else None
        )
        if batch is not None:
            for ts in batch["ts"]:
                us = int(pd.Timestamp(ts).value // 1000)
                if last_us is None or us - last_us > gap_us:
                    if run >= min_errors:
                        # finalize the burst that just closed
                        out_starts.append(start_us)
                        out_ns.append(run)
                    start_us, run = us, 1
                else:
                    run += 1
                last_us = us
        if run >= min_errors:
            out_starts.append(start_us)
            out_ns.append(run)
        state.update((last_us, start_us, run))
        if not out_starts:
            return
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_starts),
                "burst_start": [
                    pd.Timestamp(s * 1000, unit="ns") for s in out_starts
                ],
                "n_errors": out_ns,
            }
        )

    return (
        stream.filter("event_type = 'error' AND user_id IS NOT NULL")
        .select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=BURST_ALERT_SCHEMA,
            stateStructType=_BURST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
