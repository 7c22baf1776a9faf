"""Dedup operator edge cases not exercised by the sf corpora —
short/empty documents, where Spark and the DuckDB oracle CTE must agree
that sub-n docs produce NO shingles."""

from __future__ import annotations

from airbnb_pyspark_jobs_spark.operators import dedupe as DD


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_docs_produce_no_shingles(spark):
    df = _docs(spark, [(1, ""), (2, "a"), (3, "a b"), (4, "a b c")])
    sh = DD.shingle_table(df).collect()
    assert {(r.doc_id, r.s) for r in sh} == {(4, "a b c")}


def test_identical_short_docs_pair_via_exact_not_jaccard(spark):
    # two identical 2-token docs: no shingles -> no Jaccard pair (they
    # dedup via the exact fingerprint path instead); identical 3-token
    # docs pair at jaccard 1.0
    df = _docs(spark, [(1, "hi there"), (2, "hi there"), (3, "x y z"), (4, "x y z")])
    pairs = DD.ngram_jaccard_pairs(df, threshold=0.5, persist_shingles=False).collect()
    assert [(r.doc_id_a, r.doc_id_b, r.jaccard) for r in pairs] == [(3, 4, 1.0)]
    exact = DD.exact_dedup_keepers(df).collect()
    assert {(r.keeper_id, r.n_copies) for r in exact} == {(1, 2), (3, 2)}


def test_minhash_drops_shingleless_docs_both_sides(spark):
    df = _docs(spark, [(1, "a b"), (2, "p q r s t"), (3, "p q r s t")])
    sig = DD.minhash_signatures(df).collect()
    assert sorted(r.doc_id for r in sig) == [2, 3]
    pairs = DD.minhash_lsh_pairs(df, threshold=0.5, persist_shingles=False).collect()
    assert [(r.doc_id_a, r.doc_id_b, r.jaccard) for r in pairs] == [(2, 3, 1.0)]
