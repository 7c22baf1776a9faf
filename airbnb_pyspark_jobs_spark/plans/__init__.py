"""Named end-to-end queries: the correctness-gate and benchmark surface."""

from airbnb_pyspark_jobs_spark.plans.queries import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
