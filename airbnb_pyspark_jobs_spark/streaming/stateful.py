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
