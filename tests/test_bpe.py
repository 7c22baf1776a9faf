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


def test_unigram_lm_em_viterbi_prefers_frequent_pieces(spark):
    """A corpus dominated by one word must segment it as one piece
    (the full word is a top substring), while rare words fall back to
    char pieces; EM counts weight by word frequency."""
    from airbnb_pyspark_jobs_spark.operators.bpe import unigram_lm_em

    rows = [("banana banana banana banana xy",)] * 5
    docs = spark.createDataFrame(rows, "text string")
    out = {r.piece: r for r in unigram_lm_em(docs, vocab_size=50, top_out=50).collect()}
    # 'banana' is the highest-probability covering piece -> one-piece path
    assert "banana" in out and out["banana"].em_count == 20
    assert out["banana"].piece_len == 6
    # every em_count piece also carries its seed frequency
    assert out["banana"].seed_freq >= 20
    # 'xy' (freq 5) segments via its own substring piece
    assert "xy" in out and out["xy"].em_count == 5


def test_unigram_lm_em_single_chars_guarantee_segmentability(spark):
    """A word whose multi-char substrings are all pruned from the seed
    vocab (vocab_size=0 multi pieces) still segments — as single
    chars."""
    from airbnb_pyspark_jobs_spark.operators.bpe import unigram_lm_em

    docs = spark.createDataFrame([("abc abc ab",)], "text string")
    out = {r.piece: r for r in unigram_lm_em(docs, vocab_size=0, top_out=50).collect()}
    assert set(out) == {"a", "b", "c"}
    assert out["a"].em_count == 3 and out["c"].em_count == 2
