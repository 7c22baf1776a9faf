"""Structured Streaming surface over event tables."""

from airbnb_pyspark_jobs_spark.streaming.dedupe import streaming_minhash_dedup
from airbnb_pyspark_jobs_spark.streaming.events import (
    read_event_stream,
    streaming_dedupe,
    streaming_session_agg,
    streaming_tumbling_agg,
)

__all__ = [
    "read_event_stream",
    "streaming_minhash_dedup",
    "streaming_dedupe",
    "streaming_session_agg",
    "streaming_tumbling_agg",
]
