"""Blocked fuzzy matching: verification exactness, blocking recall
bounds, custom keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.linkage import blocked_fuzzy_pairs


def test_fuzzy_pairs_within_block_and_threshold(spark):
    df = spark.createDataFrame(
        [("acme corp",), ("acme crop",), ("acme inc",), ("zeta corp",), ("acme corp",)],
        "name string",
    )
    out = {(r.name_a, r.name_b): r.lev for r in blocked_fuzzy_pairs(df, "name", max_distance=2).collect()}
    # transposition = distance 2; duplicates collapse via distinct
    assert out[("acme corp", "acme crop")] == 2
    # same block but over threshold: corp vs inc is > 2
    assert ("acme corp", "acme inc") not in out
    # different blocks never compared, even at distance 1
    assert all("zeta" not in a and "zeta" not in b for a, b in out)


def test_fuzzy_pairs_custom_block_column(spark):
    df = spark.createDataFrame(
        [("bolt", "z1"), ("bolts", "z1"), ("bolt", "z2")], "name string, zone string"
    )
    out = blocked_fuzzy_pairs(df, "name", block="zone", max_distance=1).collect()
    assert [(r.name_a, r.name_b, r.lev) for r in out] == [("bolt", "bolts", 1)]


def test_multi_pass_blocking_union_recovers_cross_block_pairs(spark):
    """Single-key blocking misses pairs whose first token differs; a
    second pass on another key + union restores them — the standard
    multi-pass ER recipe."""
    df = spark.createDataFrame(
        [("acme corp", "NY"), ("acme corps", "NY"), ("acme4 corp", "NY")],
        "name string, state string",
    )
    first = blocked_fuzzy_pairs(df, "name", max_distance=2)
    # 'acme' vs 'acme4' first tokens differ -> missed by pass 1
    assert ("acme corp", "acme4 corp") not in {
        (r.name_a, r.name_b) for r in first.collect()
    }
    second = blocked_fuzzy_pairs(df, "name", block="state", max_distance=2)
    both = first.unionByName(second).distinct()
    got = {(r.name_a, r.name_b) for r in both.collect()}
    assert ("acme corp", "acme4 corp") in got and ("acme corp", "acme corps") in got
