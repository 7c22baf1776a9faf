"""Text-function edge cases: empty/short/unicode inputs must not error
or produce surprising values."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.functions import text as TX


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).first().v


def test_token_count_edges(spark):
    assert _one(spark, "a b  c", TX.token_count("text")) == 3
    assert _one(spark, "   padded   ", TX.token_count("text")) == 1
    # empty string: split('', ws) -> [''] -> size 1 (documented behavior)
    assert _one(spark, "", TX.token_count("text")) == 1


def test_bpe_ish_count_edges(spark):
    assert _one(spark, "hello, world 42", TX.bpe_ish_token_count("text")) == 4
    assert _one(spark, "", TX.bpe_ish_token_count("text")) == 0
    assert _one(spark, "!!!", TX.bpe_ish_token_count("text")) == 3


def test_lang_guess(spark):
    assert _one(spark, "the cat is on the mat", TX.lang_guess("text")) == "en"
    assert _one(spark, "der hund ist nicht da und", TX.lang_guess("text")) == "de"
    assert _one(spark, "xyz qqq zzz", TX.lang_guess("text")) == "und"


def test_fingerprint_normalizes(spark):
    a = _one(spark, "  Hello   WORLD ", TX.fingerprint("text"))
    b = _one(spark, "hello world", TX.fingerprint("text"))
    assert a == b


def test_shingles_short_docs(spark):
    # shorter than n -> NO shingles (matches the oracle CTE semantics;
    # sub-n docs carry no n-gram signal)
    assert _one(spark, "", TX.word_shingles("text", 3)) == []
    assert _one(spark, "a", TX.word_shingles("text", 3)) == []
    assert _one(spark, "a b", TX.word_shingles("text", 3)) == []
    assert _one(spark, "a b c", TX.word_shingles("text", 3)) == ["a b c"]
    out3 = _one(spark, "a b c d", TX.word_shingles("text", 3))
    assert out3 == ["a b c", "b c d"]


def test_winnowing_shared_substring_guarantee(spark):
    """Docs sharing a >= k+w-1 char substring must share a fingerprint."""
    k, w = 8, 4
    shared = "zqxjkvbw mlpqrtyu"  # 17 chars >= k+w-1=11
    df = spark.createDataFrame(
        [(1, f"aaa {shared} bbb"), (2, f"ccc ddd {shared} eee")],
        "doc_id long, text string",
    )
    norm = df.select("doc_id", TX.normalize_text("text").alias("t"))
    hashed = norm.select("doc_id", TX.kgram_hashes("t", k).alias("h"))
    fps = hashed.select("doc_id", F.explode(TX.window_minima("h", w)).alias("fp"))
    a = {r.fp for r in fps.filter("doc_id = 1").collect()}
    b = {r.fp for r in fps.filter("doc_id = 2").collect()}
    assert a & b, "no shared fingerprint despite long shared substring"
