"""Round-7 operators: RRF fusion, boolean-coverage retriever,
lexical-diversity profile, Matryoshka truncation sweep, confident-
learning label-noise suspects."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_rrf_fuse_integer_gains_and_order(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import rrf_fuse, rrf_gain_micros

    g = rrf_gain_micros(60, 3)
    assert g == [16393, 16129, 15873]  # round(1e6/61), /62, /63
    a = spark.createDataFrame(
        [(0, 100, 1), (0, 101, 2), (0, 102, 3)], "query_id long, doc_id long, rn long"
    )
    b = spark.createDataFrame(
        [(0, 101, 1), (0, 103, 2)], "query_id long, doc_id long, rn long"
    )
    out = {r.doc_id: r for r in rrf_fuse([a, b], top_k=4, max_rank=3).collect()}
    # doc 101: rank2 in a + rank1 in b -> both gains, tops the fusion
    assert out[101].rrf_micro == g[1] + g[0] and out[101].n_lists == 2
    assert out[101].rn == 1
    assert out[100].rrf_micro == g[0] and out[100].n_lists == 1
    # doc 100 (16393) beats doc 103 (16129-as-rank2? no: b rank2 -> g[1])
    assert out[103].rrf_micro == g[1]
    assert out[100].rn == 2


def test_coverage_topk_ranks_by_matched_terms_then_tf(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import coverage_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),        # 2 distinct matches, tf 2
            (2, "alpha alpha alpha"),       # 1 distinct match, tf 3
            (3, "alpha beta alpha beta"),   # 2 distinct matches, tf 4
            (4, "delta epsilon zeta"),      # no match
        ],
        "doc_id long, text string",
    )
    out = coverage_topk(docs, [(0, "alpha beta")], top_k=10).collect()
    order = [r.doc_id for r in sorted(out, key=lambda r: r.rn)]
    assert order == [3, 1, 2]  # (2,4) > (2,2) > (1,3); doc 4 absent


def test_lexical_diversity_exact_counts(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import lexical_diversity

    docs = spark.createDataFrame(
        [("s1", "aa bb aa cc"), ("s1", "dd"), ("s2", "ee ee")],
        "source string, text string",
    )
    out = {r.source: r for r in lexical_diversity(docs).collect()}
    s1 = out["s1"]  # tokens: aa,bb,aa,cc,dd -> 5 tokens, 4 types, 3 hapax
    assert (s1.n_tokens, s1.n_types, s1.n_hapax) == (5, 4, 3)
    assert s1.ttr == 0.8 and s1.hapax_share == 0.75
    assert s1.mean_word_len == 2.0
    s2 = out["s2"]
    assert (s2.n_tokens, s2.n_types, s2.n_hapax) == (2, 1, 0)


def test_matryoshka_full_dims_recall_is_one(spark):
    from airbnb_pyspark_jobs_spark.operators.similarity import matryoshka_recall

    emb = spark.range(0, 40).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                ((F.col("id") + i) % 7 + F.lit(0.5)).cast("double")
                for i in range(8)
            ]
        ).alias("embedding"),
    )
    out = {
        r.trunc_dims: r
        for r in matryoshka_recall(
            emb, emb.filter(F.col("vec_id") < 3), dims_list=(2, 8), k=3
        ).collect()
    }
    assert out[8].recall_at_k == 1.0  # full dims reproduce the ground truth
    assert out[8].n_hits == out[8].n_expected == 9
    assert 0.0 <= out[2].recall_at_k <= 1.0


def test_grouped_two_phase_cumsum_matches_window(spark):
    """The grouped range-bucketed cumsum must equal the plain grouped
    window cumsum (same values, no group-sized partition) — forced
    through multiple buckets with a small n_buckets."""
    from pyspark.sql.window import Window

    from airbnb_pyspark_jobs_spark.operators.sampling import (
        grouped_two_phase_cumsum_multi,
    )

    rows = [
        ("g%d" % (i % 3), i, i % 7 + 1, (i * 3) % 5) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, k long, a long, b long")
    got = {
        (r.g, r.k): (r.ca, r.cb)
        for r in grouped_two_phase_cumsum_multi(
            df, "g", "k", "k", ["a", "b"], ["ca", "cb"], n_buckets=8
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r.g, r.k): (r.ca, r.cb)
        for r in df.select(
            "g", "k", F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
        ).collect()
    }
    assert got == want


def test_grouped_cumsum_rejects_suffixed_internal_clash(spark):
    """The clash guard must catch the SUFFIXED working names the helper
    actually generates (__run_<out>, not just bare __run) — an input
    column named __run_ca was silently clobbered before (ADVICE r7)."""
    import pytest

    from airbnb_pyspark_jobs_spark.operators.sampling import (
        grouped_two_phase_cumsum_multi,
    )

    df = spark.createDataFrame(
        [("g", 1, 1, 7)], "g string, k long, a long, __run_ca long"
    )
    with pytest.raises(ValueError, match="__run_ca"):
        grouped_two_phase_cumsum_multi(df, "g", "k", "k", ["a"], ["ca"])


def test_heaps_fit_monotone_inputs(spark):
    """Sanity: a corpus where every doc repeats one word (V flat) gets
    beta ~ 0; a corpus of all-new words per doc gets beta ~ 1."""
    from airbnb_pyspark_jobs_spark.operators.corpus import heaps_law_fit

    flat = [("flat", i, "zz zz zz") for i in range(30)]
    grow = [("grow", i, "w%da w%db w%dc" % (i, i, i)) for i in range(30)]
    docs = spark.createDataFrame(
        flat + grow, "source string, doc_id long, text string"
    )
    out = {r.source: r for r in heaps_law_fit(docs).collect()}
    assert abs(out["grow"].heaps_beta - 1.0) < 0.01
    assert abs(out["flat"].heaps_beta) < 0.05


def test_confident_label_suspects_exact(spark):
    from airbnb_pyspark_jobs_spark.operators.classifier import (
        confident_label_suspects,
    )

    scored = spark.createDataFrame(
        [
            (1, 1.0, 0.9),
            (2, 1.0, 0.7),
            (3, 0.0, 0.1),
            (4, 0.0, 0.5),
            (5, 0.0, 0.85),
            (6, 1.0, 0.25),
        ],
        "doc_id long, y double, p double",
    )
    # t1 = round-half-away mean of {900000, 700000, 250000} = 616667
    # t0 = round-half-away mean of {900000, 500000, 150000} = 516667
    out = {r.doc_id: r for r in confident_label_suspects(scored).collect()}
    # suspects: doc4 (y=0, pm 500000 < 616667? no) — check each:
    #   doc3 pm=100000 < t1 clean; doc4 pm=500000 < t1 clean
    #   doc5 pm=850000 >= 616667 -> suspected 1, margin 233333
    #   doc6 conf0=750000 >= 516667 -> suspected 0, margin 233333
    #   doc2 conf0=300000 < t0 clean; doc1 conf0=100000 clean
    assert set(out) == {5, 6}
    assert out[5].suspected_label == 1 and out[5].margin_micro == 850000 - 616667
    assert out[6].suspected_label == 0 and out[6].margin_micro == 750000 - 516667
