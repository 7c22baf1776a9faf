"""BPE merge learning: classic-example merges, fixpoint replace on
overlapping runs, and tie-break determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.bpe import (
    apply_merge,
    bpe_learn_merges,
    bpe_segment_words,
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


def test_bpe_merges_past_single_symbol_words(spark):
    """Learning must continue once some word is FULLY merged to one
    symbol: sequence(1, size-1) on a 1-element symbol array is
    sequence(1, 0) = [1, 0] (Spark generates descending), which
    indexed past the array before single-symbol words were filtered
    out of the pair count (hit at merge 33 of the 256-merge run)."""
    docs = spark.createDataFrame(
        [("to to to to",), ("be or not",)], ["text"]
    )
    # exhaust the corpus: every word ends as one merged symbol
    merges = bpe_learn_merges(docs, n_merges=64)
    assert 0 < len(merges) < 64  # stopped at exhaustion, no crash
    merged_syms = {m[3] for m in merges}
    assert "to</w>" in merged_syms  # 'to' fully merged including </w>
    seg = bpe_segment_words(docs, merges)
    rows = {r["w"]: r["n_sym"] for r in seg.collect()}
    assert rows["to"] == 1  # highest-frequency word: one symbol
