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
