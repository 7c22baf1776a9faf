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


def test_redact_pii_all_categories(spark):
    t = "mail a.b-c+x@foo-bar.org or 192.168.0.1 or +1 (555) 123-4567 end"
    out = _one(spark, t, TX.redact_pii("text"))
    assert out == "mail <EMAIL> or <IP> or <PHONE> end"


def test_pii_counts_attribute_each_match_once(spark):
    # the IP's dotted digits must NOT also count as a phone (counts run
    # on the progressively-redacted text, like the replacement does)
    t = "x 10.20.30.40 y 5551234567 z a@b.io"
    counts = TX.pii_counts("text")
    import pyspark.sql.functions as F

    row = (
        spark.createDataFrame([(t,)], "text string")
        .select(*[c.alias(n) for n, c in counts.items()])
        .first()
    )
    assert (row.n_emails, row.n_ips, row.n_phones) == (1, 1, 1)


def test_quantize_int8_round_trip_error_bounded(spark):
    import pyspark.sql.functions as F

    from airbnb_pyspark_jobs_spark.functions import vectors as V

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "id long, v array<double>",
    ).select("id", "v", V.abs_max(F.col("v")).alias("s"))
    out = {
        r.id: r
        for r in df.select(
            "id",
            V.quantize_int8(F.col("v"), F.col("s")).alias("q"),
            V.int8_reconstruction_error(F.col("v"), F.col("s")).alias("e"),
        ).collect()
    }
    assert out[1].q == [64, -127, 32, 0]  # round(0.5*127)=64, exact -127
    assert out[1].e <= 0.5 / 127  # max per-element error = scale/(2*127)
    assert out[2].q == [0, 0, 0, 0] and out[2].e == 0.0  # zero vector safe
