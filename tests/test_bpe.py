"""BPE merge learning: classic-example merges, fixpoint replace on
overlapping runs, and tie-break determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.bpe import (
    apply_merge,
    bpe_learn_merges,
)


def test_bpe_learns_classic_low_lower_lowest_merges(spark):
    docs = spark.createDataFrame(
        [(1, "low lower lowest")], "doc_id long, text string"
    )
    merges = bpe_learn_merges(docs, n_merges=2)
    # (l,o) wins count 3 (ties with (o,w), lexicographic l < o), then
    # the merged 'lo' pairs with 'w' at count 3
    assert [(m[1], m[2], m[4]) for m in merges] == [("l", "o", 3), ("lo", "w", 3)]


def test_apply_merge_fixpoint_handles_overlapping_runs(spark):
    df = spark.createDataFrame(
        [(" a a a a a a </w> ",), (" b a n a n a </w> ",)], "s string"
    )
    out = [
        r.m
        for r in df.select(apply_merge(F.col("s"), "a", "a").alias("m"))
        .collect()
    ]
    # maximal: no adjacent (a, a) remains. Placement differs from
    # classic pairwise-left in same-symbol runs >= 6 (documented
    # operator caveat) — what's pinned is determinism + maximality.
    assert out[0] == " aa a aa a </w> "
    assert " a a " not in out[0]
    out2 = df.select(apply_merge(F.col("s"), "a", "n").alias("m")).collect()
    assert out2[1].m == " b an an a </w> "  # classic banana result
