"""Named end-to-end queries: the correctness-gate and benchmark surface."""

from airbnb_pyspark_jobs_spark.plans.queries import ORACLES, QUERIES

# Importing registers the query families into QUERIES/ORACLES.
from airbnb_pyspark_jobs_spark.plans import text_queries as _text_queries  # noqa: E402,F401
from airbnb_pyspark_jobs_spark.plans import similarity_queries as _sim_queries  # noqa: E402,F401
from airbnb_pyspark_jobs_spark.plans import event_queries as _event_queries  # noqa: E402,F401
from airbnb_pyspark_jobs_spark.plans import analytics_queries as _analytics_queries  # noqa: E402,F401
from airbnb_pyspark_jobs_spark.plans import multimodal_queries as _multimodal_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES"]
