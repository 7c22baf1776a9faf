"""Bloom semi-join: exactness for any bloom size + real pruning."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.bloom import (
    bloom_semi_join,
    build_bloom_bits,
)


def test_bloom_semi_join_equals_plain_semi_join(spark):
    fact = spark.range(0, 2000).withColumnRenamed("id", "k")
    keys = (
        spark.range(0, 2000, 7)
        .withColumnRenamed("id", "dk")
        .filter(F.col("dk") % 3 == 0)
    )
    got = sorted(
        r.k for r in bloom_semi_join(fact, keys, "k", "dk").collect()
    )
    want = sorted(
        r.k for r in fact.join(keys, fact.k == keys.dk, "left_semi").collect()
    )
    assert got == want and len(want) > 0


def test_tiny_bloom_still_exact(spark):
    # 64 bits for 100 keys -> bloom saturates (every probe passes); the
    # exact verify join must still produce the true semi-join.
    fact = spark.range(0, 500).withColumnRenamed("id", "k")
    keys = spark.range(0, 500, 5).withColumnRenamed("id", "dk")
    got = sorted(
        r.k
        for r in bloom_semi_join(
            fact, keys, "k", "dk", num_bits=64, num_hashes=2
        ).collect()
    )
    assert got == list(range(0, 500, 5))


def test_bloom_superset_prunes_most_nonmatches(spark):
    # exact=False returns the bloom superset: all true matches plus a
    # small false-positive tail (1M bits for 200 keys -> fpp ~ 0).
    fact = spark.range(0, 20_000).withColumnRenamed("id", "k")
    keys = spark.range(0, 20_000, 100).withColumnRenamed("id", "dk")
    got = {r.k for r in bloom_semi_join(fact, keys, "k", "dk", exact=False).collect()}
    true = set(range(0, 20_000, 100))
    assert true <= got  # no false negatives, ever
    assert len(got - true) < 200  # pruned ~99% of non-matches


def test_build_bloom_bits_sets_expected_bits(spark):
    keys = spark.range(0, 50).withColumnRenamed("id", "dk")
    bits = build_bloom_bits(keys, "dk", num_bits=1 << 12, num_hashes=3)
    n_set = int(np.unpackbits(bits).sum())
    assert 0 < n_set <= 150  # <= keys * num_hashes, > 0


def test_bloom_params_sizing_and_measured_fpp(spark):
    from airbnb_pyspark_jobs_spark.operators.bloom import bloom_params

    num_bits, num_hashes = bloom_params(1_000_000, 0.01)
    assert 9_000_000 < num_bits < 10_500_000 and num_hashes == 7
    # measured fpp with the computed params stays near the target
    nb, nh = bloom_params(500, 0.01)
    keys = spark.range(0, 5000, 10).withColumnRenamed("id", "dk")
    fact = spark.range(0, 50_000).withColumnRenamed("id", "k")
    got = {
        r.k
        for r in bloom_semi_join(
            fact, keys, "k", "dk", num_bits=nb, num_hashes=nh, exact=False
        ).collect()
    }
    true = set(range(0, 5000, 10))
    fp = len(got - true) / (50_000 - len(true))
    assert fp < 0.03  # target 0.01 with slack for hash correlation
