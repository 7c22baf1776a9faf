"""Cache-ownership hygiene: persisting queries must not leak blocks.

Operators persist intermediates that multiple downstream branches read
(shingle tables, candidate pairs, CMS term frequencies). The contract
(`caching.owned_persist`) is that those caches are registered and
released by the next `@query` invocation / an explicit
`release_owned_caches()` — so a long-lived session running the whole
registry (the driver's loop, bench.py) holds at most one query's
intermediates at a time instead of accumulating them until eviction.
"""

from __future__ import annotations

import os

import pytest

from airbnb_pyspark_jobs_spark.caching import release_owned_caches

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


@pytest.mark.parametrize(
    "qname",
    [
        "q44_ngram_jaccard_pairs",   # owned shingle-table persist
        "q103_dup_span_coverage",    # owned positioned-shingle persist
        "q99_cms_token_counts",      # owned term-frequency persist
    ],
)
def test_persisting_query_releases_blocks(spark, qname):
    """Materialize a persisting query, release owned caches, and assert
    the block manager is back to its pre-query persistent-RDD count."""
    from airbnb_pyspark_jobs_spark.plans import QUERIES

    release_owned_caches()  # clean slate (earlier tests may own caches)
    before = _persistent_rdd_count(spark)
    QUERIES[qname](spark, SF_DIR).collect()
    release_owned_caches()
    # <= not ==: earlier tests' localCheckpoint blocks are freed
    # ASYNCHRONOUSLY by the ContextCleaner, so the ambient count can
    # drop mid-test; the hygiene claim is only "this query left no
    # NET-NEW blocks behind".
    assert _persistent_rdd_count(spark) <= before


def test_query_loop_holds_at_most_one_querys_caches(spark):
    """Back-to-back @query invocations: entering query N+1 releases
    query N's owned caches automatically (the driver-loop contract)."""
    from airbnb_pyspark_jobs_spark.plans import QUERIES

    release_owned_caches()
    base = _persistent_rdd_count(spark)
    loop = [
        "q44_ngram_jaccard_pairs",
        "q103_dup_span_coverage",
        "q99_cms_token_counts",
    ]
    for qname in loop:
        QUERIES[qname](spark, SF_DIR).collect()
        # while a query's result was just materialized its own caches may
        # still be registered — but never more than ONE query's worth:
        # the wrapper released everything owned before this invocation.
    QUERIES["q01_pricing_summary"](spark, SF_DIR).collect()  # releases last
    assert _persistent_rdd_count(spark) <= base


def test_nested_query_invocation_keeps_composers_caches(spark):
    """A composite query that owned_persist()s a shared frame and then
    calls OTHER registered queries must keep its cache: the release
    sweep fires only at top-level invocations (reentrancy depth 0),
    never inside a composition (q172 -> q156/q169 -> q147)."""
    from pyspark.sql import functions as F

    from airbnb_pyspark_jobs_spark.caching import owned_persist
    from airbnb_pyspark_jobs_spark.plans.queries import query

    seen = {}

    @query("qtest_inner_noop")
    def _inner(spark, sf_dir):
        return spark.range(1).select(F.lit(1).alias("one"))

    @query("qtest_outer_composite")
    def _outer(spark, sf_dir):
        shared = owned_persist(spark.range(10).select(F.col("id").alias("k")))
        shared.count()  # materialize the cache
        _inner(spark, sf_dir).collect()  # nested registered-query call
        seen["cached_after_nested"] = shared.storageLevel.useMemory
        return shared

    from airbnb_pyspark_jobs_spark.plans.queries import ORACLES, QUERIES

    try:
        QUERIES["qtest_outer_composite"](spark, SF_DIR).collect()
        assert seen["cached_after_nested"] is True
    finally:
        from airbnb_pyspark_jobs_spark.plans.queries import QUERY_FAMILIES

        for name in ("qtest_inner_noop", "qtest_outer_composite"):
            QUERIES.pop(name, None)
            ORACLES.pop(name, None)
            QUERY_FAMILIES.pop(name, None)
        release_owned_caches()
