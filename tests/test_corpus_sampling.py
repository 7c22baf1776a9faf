"""Chunking, hash-split and TF-IDF operator edge cases (oracle parity
is covered by q42/q43/q48 in the oracle suite)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.corpus import chunk_documents, tfidf_top_terms
from airbnb_pyspark_jobs_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunking_coverage_and_overlap(spark):
    toks = [f"w{i}" for i in range(150)]
    df = _docs(spark, [(1, " ".join(toks))])
    chunks = sorted(
        chunk_documents(df, chunk_tokens=64, overlap=8).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride 56: starts at 0, 56, 112 -> 3 chunks; last is the 38-token tail
    assert [r.chunk_idx for r in chunks] == [0, 1, 2]
    assert chunks[0].n_chunk_tokens == 64
    assert chunks[1].chunk_text.split()[0] == "w56"  # overlap of 8
    assert chunks[2].n_chunk_tokens == 150 - 112
    # every token appears in some chunk
    covered = {t for r in chunks for t in r.chunk_text.split()}
    assert covered == set(toks)


def test_chunking_short_doc_single_chunk(spark):
    df = _docs(spark, [(1, "a b c")])
    chunks = chunk_documents(df, chunk_tokens=64, overlap=8).collect()
    assert len(chunks) == 1
    assert chunks[0].chunk_text == "a b c"
    assert chunks[0].n_chunk_tokens == 3


def test_chunking_rejects_bad_overlap(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_docs(spark, [(1, "a")]), chunk_tokens=8, overlap=8)


def test_hash_split_stable_and_complete(spark):
    df = spark.range(2000).withColumnRenamed("id", "k")
    out = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert 0.75 < counts["train"] / 2000 < 0.85
    # membership is per-key stable: dropping other rows never moves a row
    sub = hash_split(df.filter(F.col("k") < 100), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    full = {r.k: r.split for r in out.filter(F.col("k") < 100).collect()}
    assert {r.k: r.split for r in sub.collect()} == full
    # a different seed deals a different split
    reseeded = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="s1")
    moved = out.alias("a").join(reseeded.alias("b"), "k").filter(
        F.col("a.split") != F.col("b.split")
    )
    assert moved.count() > 0


def test_hash_split_rejects_bad_fractions(spark):
    with pytest.raises(ValueError, match="sum"):
        hash_split(spark.range(1), "id", {"a": 0.5, "b": 0.4})


def test_deterministic_sample_reproducible_subset(spark):
    df = spark.range(1000)
    a = {r.id for r in deterministic_sample(df, "id", 0.2).collect()}
    b = {r.id for r in deterministic_sample(df, "id", 0.2).collect()}
    assert a == b
    assert 100 < len(a) < 300
    bigger = {r.id for r in deterministic_sample(df, "id", 0.5).collect()}
    assert a <= bigger  # nested: smaller fractions are subsets


def test_tfidf_df_cap_drops_ubiquitous_terms(spark):
    df = _docs(
        spark,
        [(1, "common rare1 rare1"), (2, "common rare2"), (3, "common rare3")],
    )
    out = tfidf_top_terms(df, top_k=3, max_df_ratio=0.5).collect()
    terms = {r.term for r in out}
    assert "common" not in terms  # df=3/3 > 0.5 cap
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc[1][0].term == "rare1" and by_doc[1][0].tf == 2


def test_repetition_signals_known_counts(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),   # bigrams: ab ba ab ba -> top 2/4, dup 4/4
            (2, "x y z"),       # bigrams: xy yz -> top 1/2, dup 0
            (3, "solo"),        # no bigrams -> absent from output
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_bigrams == 4
    assert out[1].top_bigram_ratio == 0.5
    assert out[1].dup_bigram_ratio == 1.0
    assert out[2].n_bigrams == 2
    assert out[2].top_bigram_ratio == 0.5
    assert out[2].dup_bigram_ratio == 0.0


def test_stratified_sample_deterministic_and_proportional(spark):
    from airbnb_pyspark_jobs_spark.operators.sampling import stratified_sample

    df = spark.range(4000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
    )
    out = stratified_sample(df, "g", {"a": 0.5, "b": 1.0}, key_col="k")
    counts = {r.g: r.c for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert counts["b"] == 2000  # fraction 1.0 keeps the whole stratum
    assert 800 < counts["a"] < 1200  # ~half, hash-determined
    # determinism: the exact same subset on a second evaluation
    ids1 = sorted(r.k for r in out.collect())
    ids2 = sorted(r.k for r in stratified_sample(df, "g", {"a": 0.5, "b": 1.0}, key_col="k").collect())
    assert ids1 == ids2
    # unlisted strata get default_fraction (0 -> dropped entirely)
    df2 = df.withColumn("g", F.lit("zzz"))
    assert stratified_sample(df2, "g", {"a": 0.5}, key_col="k").count() == 0
    with pytest.raises(ValueError):
        stratified_sample(df, "g", {"a": 1.5}, key_col="k")


def _tree_postings_digest(doc_ids, buckets: int = 64) -> str:
    """Python mirror of vocabulary()'s two-level tree digest: md5 per
    (doc-id hash bucket) sub-list, then md5 of the sorted bucket
    digests. Keeps the expected value derivable without Spark."""
    import hashlib

    by_bucket: dict[int, list[str]] = {}
    for d in doc_ids:
        b = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % buckets
        by_bucket.setdefault(b, []).append(str(d))
    bdigs = [
        hashlib.md5(",".join(sorted(ids)).encode()).hexdigest()
        for ids in by_bucket.values()
    ]
    return hashlib.md5(",".join(sorted(bdigs)).encode()).hexdigest()


def test_vocabulary_counts_and_postings_digest(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import vocabulary

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "c c c")], "doc_id long, text string"
    )
    out = {r.term: r for r in vocabulary(docs).collect()}
    assert out["a"].df == 1 and out["a"].cf == 2
    assert out["b"].df == 2 and out["b"].cf == 2
    assert out["c"].df == 2 and out["c"].cf == 4
    assert out["b"].postings_md5 == _tree_postings_digest([1, 2])
    assert out["c"].postings_md5 == _tree_postings_digest([2, 3])
    import math

    assert out["a"].idf == round(math.log(3 / 1), 6)


def test_vocabulary_digest_invariant_to_bucket_count_collisions(spark):
    """The tree digest is a pure function of the posting SET given a
    bucket count: a 2-bucket build (forcing collisions) still yields
    the python-mirror digest, and two builds at the same B agree."""
    from airbnb_pyspark_jobs_spark.operators.corpus import vocabulary

    docs = spark.createDataFrame(
        [(i, "hot other%d" % i) for i in range(12)], "doc_id long, text string"
    )
    out = {r.term: r for r in vocabulary(docs, digest_buckets=2).collect()}
    assert out["hot"].df == 12
    assert out["hot"].postings_md5 == _tree_postings_digest(range(12), buckets=2)
    again = {r.term: r for r in vocabulary(docs, digest_buckets=2).collect()}
    assert again["hot"].postings_md5 == out["hot"].postings_md5


def test_derive_digest_buckets_absolute_bound():
    """B auto-scales so the worst level-1 buffer is bounded at
    target_ids_per_bucket ABSOLUTELY (VERDICT r6 #1): floor 64 below
    64·target docs, then ceil(N/target) — same integer arithmetic the
    q38 oracle derives in SQL."""
    from airbnb_pyspark_jobs_spark.operators.corpus import derive_digest_buckets

    assert derive_digest_buckets(0) == 64
    assert derive_digest_buckets(100) == 64
    assert derive_digest_buckets(6_400_000) == 64
    assert derive_digest_buckets(6_400_001) == 65
    assert derive_digest_buckets(10**9) == 10_000
    # target parameterizes the bound: worst buffer stays ~flat as N grows
    assert derive_digest_buckets(100_000, 1000) == 100
    assert derive_digest_buckets(1_000_000, 1000) == 1000


def test_vocabulary_auto_buckets_match_explicit(spark):
    """digest_buckets=None derives B=64 for a small corpus — identical
    output (digests included) to an explicit B=64 build."""
    from airbnb_pyspark_jobs_spark.operators.corpus import vocabulary

    docs = spark.createDataFrame(
        [(i, "hot only%d" % i) for i in range(10)], "doc_id long, text string"
    )
    auto = {r.term: r for r in vocabulary(docs).collect()}
    pinned = {r.term: r for r in vocabulary(docs, digest_buckets=64).collect()}
    assert auto == pinned
    # a caller-known corpus count pins B driver-side with the same
    # arithmetic — no count action, identical digests (VERDICT r7 #5)
    known = {r.term: r for r in vocabulary(docs, n_docs=10).collect()}
    assert known == pinned


def test_pack_sequences_concat_split_semantics(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import pack_sequences

    # single shard (shards=1) so the packing order is fully determined:
    # chunks of 60 tokens against budget 100 -> first-token packs
    # 0,0,1,1,2,... (chunk 2 starts at token 60 < 100 -> pack 0, overflow)
    chunks = spark.createDataFrame(
        [(1, i, 60) for i in range(5)],
        "doc_id long, chunk_idx long, n_chunk_tokens long",
    )
    out = {r.pack_id: r for r in pack_sequences(chunks, budget=100, shards=1).collect()}
    assert [out[p].n_chunks for p in sorted(out)] == [2, 2, 1]
    assert sum(r.pack_tokens for r in out.values()) == 300  # nothing lost
    assert all(r.shard == 0 for r in out.values())
    # chunks never split across shards: every doc's chunks share a shard
    many = spark.createDataFrame(
        [(d, i, 10) for d in range(20) for i in range(3)],
        "doc_id long, chunk_idx long, n_chunk_tokens long",
    )
    packs = pack_sequences(many, budget=50, shards=4)
    assert packs.agg(F.sum("pack_tokens")).collect()[0][0] == 600


def test_pack_sequences_bfd_hand_example(spark):
    """BFD semantics on a hand-traced example (budget 10, one shard):
    tokens [7,6,4,3,2,2] sorted desc place as bin0={7,3}, bin1={6,4},
    bin2={2,2} — best-fit picks the FULLEST fitting bin, none
    overflows."""
    from airbnb_pyspark_jobs_spark.operators.corpus import pack_sequences_bfd

    chunks = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate([7, 6, 4, 3, 2, 2])],
        "doc_id long, chunk_idx long, n_chunk_tokens long",
    )
    out = sorted(
        (r.pack_id, r.n_chunks, r.pack_tokens)
        for r in pack_sequences_bfd(chunks, budget=10, shards=1).collect()
    )
    assert out == [(0, 2, 10), (1, 2, 10), (2, 2, 4)]


def test_pack_sequences_bfd_oversize_chunk_raises(spark):
    """VERDICT r9 #5: a chunk wider than the budget used to silently
    open an overflowing bin — the exact truncation hazard the BFD
    docstring rules out. It must fail the job loudly instead."""
    import pytest

    from airbnb_pyspark_jobs_spark.operators.corpus import pack_sequences_bfd

    chunks = spark.createDataFrame(
        [(1, 0, 5), (1, 1, 17)],
        "doc_id long, chunk_idx long, n_chunk_tokens long",
    )
    with pytest.raises(Exception, match="exceeds"):
        pack_sequences_bfd(chunks, budget=10, shards=1).collect()


def test_pack_sequences_bfd_auto_derives_shards(spark):
    """VERDICT r9 #5: shards=None derives the count from the input so
    the sequential span stays ~target_chunks_per_shard without manual
    tuning (the q38 autoscale precedent)."""
    from airbnb_pyspark_jobs_spark.operators.corpus import (
        derive_pack_shards,
        pack_sequences_bfd,
    )

    assert derive_pack_shards(10, 100_000) == 8          # floor
    assert derive_pack_shards(1_000_000, 100_000) == 10  # ceil(n/target)
    assert derive_pack_shards(1_000_001, 100_000) == 11
    chunks = spark.createDataFrame(
        [(d, 0, 10) for d in range(300)],
        "doc_id long, chunk_idx long, n_chunk_tokens long",
    )
    out = pack_sequences_bfd(chunks, budget=50, target_chunks_per_shard=20)
    # 300 chunks / 20 per shard -> 15 shards; every chunk packed
    shards_seen = {r.shard for r in out.collect()}
    assert shards_seen <= set(range(15)) and len(shards_seen) > 8
    assert out.agg(F.sum("pack_tokens")).collect()[0][0] == 3000


def test_pack_sequences_bfd_purity_col_never_mixes_sources(spark):
    """q342 mitigation path: purity_col packs within (shard, value)
    groups — no bin mixes two sources, count_cols reports n_source=1
    per pack, and nothing is lost."""
    from airbnb_pyspark_jobs_spark.operators.corpus import pack_sequences_bfd

    chunks = spark.createDataFrame(
        [
            (d, i, 30, f"src{d % 3}")
            for d in range(12)
            for i in range(2)
        ],
        "doc_id long, chunk_idx long, n_chunk_tokens long, source string",
    )
    out = pack_sequences_bfd(
        chunks,
        budget=100,
        shards=4,
        purity_col="source",
        count_cols=("source",),
    ).collect()
    assert all(r.n_source == 1 for r in out)
    assert {r.source for r in out} == {"src0", "src1", "src2"}
    assert sum(r.pack_tokens for r in out) == 12 * 2 * 30
    # same-source chunks share a shard (shard key = source hash)
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, set()).add(r.shard)
    assert all(len(s) == 1 for s in by_src.values())


def test_weighted_sample_probability_boundaries(spark):
    from airbnb_pyspark_jobs_spark.operators.sampling import weighted_sample

    df = spark.range(2000).select(F.col("id").alias("k"), F.lit(1.0).alias("w"))
    assert weighted_sample(df, "w", key_col="k").count() == 2000  # w=1 keeps all
    df0 = df.withColumn("w", F.lit(0.0))
    assert weighted_sample(df0, "w", key_col="k").count() == 0  # w=0 drops all
    dfh = df.withColumn("w", F.lit(0.5))
    n = weighted_sample(dfh, "w", key_col="k").count()
    assert 850 < n < 1150  # ~half, hash-determined
    # out-of-range weights clamp instead of misbehaving
    dfx = df.withColumn("w", F.when(F.col("k") % 2 == 0, 7.0).otherwise(-3.0))
    kept = {r.k for r in weighted_sample(dfx, "w", key_col="k").collect()}
    assert kept == {k for k in range(2000) if k % 2 == 0}
    # deterministic across evaluations
    assert kept == {r.k for r in weighted_sample(dfx, "w", key_col="k").collect()}


def test_cdc_chunks_survive_prefix_insertion(spark):
    """Inserting a prefix must leave MOST chunk hashes intact (only the
    chunk containing the edit changes) — the property fixed-size
    chunking lacks (every boundary shifts)."""
    from airbnb_pyspark_jobs_spark.operators.corpus import cdc_chunks

    import hashlib

    # non-repeating deterministic text (~1200 chars): periodic text
    # collapses to few distinct k-grams and starves the boundary test
    base = " ".join(
        hashlib.md5(str(i).encode()).hexdigest()[:7] for i in range(150)
    )
    docs = spark.createDataFrame(
        [(1, base), (2, "INSERTED-PREFIX " + base)], "doc_id long, text string"
    )
    out = cdc_chunks(docs, k=8, divisor=64).collect()
    h1 = {r.chunk_md5 for r in out if r.doc_id == 1}
    h2 = {r.chunk_md5 for r in out if r.doc_id == 2}
    assert len(h1) > 3  # actually chunked
    shared = len(h1 & h2)
    assert shared >= len(h1) - 2, (shared, len(h1))

    # chunks reassemble to the original text, in order
    parts = sorted(
        ((r.chunk_idx, r.chunk_text) for r in out if r.doc_id == 1)
    )
    assert "".join(t for _i, t in parts) == base


def test_epoch_shuffle_permutation_and_shards(spark):
    from airbnb_pyspark_jobs_spark.operators.sampling import epoch_shuffle

    df = spark.range(0, 97).withColumnRenamed("id", "doc_id")
    e0 = epoch_shuffle(df, "doc_id", epoch=0, n_shards=4).collect()
    # exact permutation of 0..n-1
    assert sorted(r["epoch_pos"] for r in e0) == list(range(97))
    # contiguous equal shards (sizes differ by <= 1, ordered by position)
    by_shard = {}
    for r in e0:
        by_shard.setdefault(r["shard"], []).append(r["epoch_pos"])
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[-1] - sizes[0] <= 1 and len(by_shard) == 4
    for s, ps in by_shard.items():
        ps = sorted(ps)
        assert ps == list(range(ps[0], ps[-1] + 1))  # contiguous range
    # a different epoch re-deals a different (but reproducible) order
    e1a = {r["doc_id"]: r["epoch_pos"] for r in epoch_shuffle(df, "doc_id", epoch=1).collect()}
    e1b = {r["doc_id"]: r["epoch_pos"] for r in epoch_shuffle(df, "doc_id", epoch=1).collect()}
    o0 = {r["doc_id"]: r["epoch_pos"] for r in e0}
    assert e1a == e1b and e1a != o0


def test_gopher_rules_flag_each_rule(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import gopher_rules

    good = "the quick brown fox jumps over the lazy dog and that " * 5  # 55 words
    docs = spark.createDataFrame(
        [
            (0, good),                                  # passes everything
            (1, "short text only"),                     # fails word count
            (2, "the " + "# " * 60),                    # symbol ratio + alpha ratio
            (3, " ".join(["a"] * 60)),                  # mean word len < 3
            (4, " ".join(["wonderful"] * 60)),          # no required stopwords
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert rows[0]["keep"]
    assert not rows[1]["pass_word_count"]
    assert not rows[2]["pass_symbol_ratio"] and not rows[2]["pass_alpha_ratio"]
    assert not rows[3]["pass_mean_word_len"]
    assert not rows[4]["pass_stopwords"] and rows[4]["n_required_stopwords"] == 0
    # signal sanity: integer-exact mean on doc 3 (all 1-char words)
    assert rows[3]["mean_word_len"] == 1.0


def test_source_interleave_respects_rates(spark):
    from airbnb_pyspark_jobs_spark.operators.sampling import source_interleave

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = source_interleave(df, "doc_id", "source", {"a": 0.75, "b": 0.25}).collect()
    ordered = sorted(out, key=lambda r: (r["interleave_key"], r["source"], r["doc_id"]))
    # stride scheduling: in any prefix ending at a 'b' emission, 'a' has
    # been emitted ~3x as often (|n_a - 3*n_b| bounded by one stride)
    n = {"a": 0, "b": 0}
    for r in ordered[:80]:
        n[r["source"]] += 1
        if r["source"] == "b":
            assert abs(n["a"] - 3 * n["b"]) <= 3, (n, r["interleave_key"])
    # per-source ranks are each a contiguous 1..k sequence
    for s in ("a", "b"):
        ranks = sorted(r["source_rank"] for r in out if r["source"] == s)
        assert ranks == list(range(1, len(ranks) + 1))


def test_unigram_logprob_known_values(spark):
    import math

    from airbnb_pyspark_jobs_spark.operators.corpus import unigram_logprob_scores

    docs = spark.createDataFrame(
        [(0, "cat cat dog"), (1, "cat rare")], ["doc_id", "text"]
    )
    # corpus: cat x3, dog x1, rare x1 (total 5)
    lp = {"cat": round(math.log(3 / 5), 6), "dog": round(math.log(1 / 5), 6),
          "rare": round(math.log(1 / 5), 6)}
    rows = {r["doc_id"]: r for r in unigram_logprob_scores(docs).collect()}
    assert rows[0]["n_tokens"] == 3
    assert rows[0]["mean_logprob"] == round((2 * lp["cat"] + lp["dog"]) / 3, 4)
    assert rows[1]["mean_logprob"] == round((lp["cat"] + lp["rare"]) / 2, 4)
    # the common-word doc is more "typical" than the rare-word doc
    assert rows[0]["mean_logprob"] > rows[1]["mean_logprob"]


# ---------------------------------------------------------------------------
# language_id: stopword-profile + char-class heuristic
# ---------------------------------------------------------------------------
def test_language_id_picks_profiled_language(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import language_id

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is a good day for the cat"),
            (2, "der hund ist nicht auf der straße und das ist ein gutes zeichen"),
            (3, "el perro es un animal que vive en la casa con el gato"),
            (4, "le chien est dans la maison pour le moment et il est content"),
            (5, "zzz qqq www eee rrr ttt yyy uuu"),  # no stopword evidence
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in language_id(df).collect()}
    assert out[1].pred_lang == "en" and out[1].reliable
    assert out[2].pred_lang == "de" and out[2].reliable
    assert out[3].pred_lang == "es" and out[3].reliable
    assert out[4].pred_lang == "fr" and out[4].reliable
    assert out[5].pred_lang == "und" and not out[5].reliable


def test_language_id_non_ascii_ratio_and_tiebreak(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import language_id

    df = spark.createDataFrame(
        [
            (1, "这是 中文 文本 没有 停用词"),  # all non-ascii, no stopwords
            # 'la de' hits both es and fr profiles equally -> alphabetical
            # tie-break: es < fr
            (2, "la de la de la de la de la de"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in language_id(df).collect()}
    # every non-space char in doc 1 is CJK: ratio counts chars incl spaces
    assert out[1].non_ascii_ratio > 0.7 and out[1].pred_lang == "und"
    assert out[2].pred_lang == "es" and out[2].margin == 0.0 and not out[2].reliable


def test_language_id_composes_with_quality_filter(spark):
    """The pipeline stage order: language gate -> quality gate. The
    composed keep-set is a subset of each gate's keep-set."""
    from tests.conftest import SF_DIR

    from airbnb_pyspark_jobs_spark.operators.corpus import language_id, quality_filter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lid = language_id(docs).select("doc_id", "pred_lang", "reliable")
    gated = docs.join(
        lid.filter(F.col("reliable") & (F.col("pred_lang") == "en")),
        "doc_id",
        "left_semi",
    )
    n_lang = gated.count()
    composed = quality_filter(gated).filter(F.col("keep")).count()
    all_quality = quality_filter(docs).filter(F.col("keep")).count()
    assert 0 < n_lang < docs.count()
    assert composed <= min(n_lang, all_quality)


def test_temperature_mixture_flattens_skew(spark):
    """alpha=0.5 must upweight the small source vs its proportional
    share, and alpha=1.0 must reproduce proportional sampling."""
    from airbnb_pyspark_jobs_spark.operators.sampling import (
        temperature_mixture_quotas,
    )

    rows = [(i, "big", "w " * 100) for i in range(90)] + [
        (1000 + i, "small", "w " * 100) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    q5 = {
        r.source: (r.weight, r.quota)
        for r in temperature_mixture_quotas(docs, budget=100, alpha=0.5)
        .select("source", "weight", "quota")
        .distinct()
        .collect()
    }
    q1 = {
        r.source: (r.weight, r.quota)
        for r in temperature_mixture_quotas(docs, budget=100, alpha=1.0)
        .select("source", "weight", "quota")
        .distinct()
        .collect()
    }
    # proportional: small = 10% -> quota 10; sqrt: sqrt(9):sqrt(1) = 3:1 -> 25%
    assert q1["small"][1] == 10 and q1["big"][1] == 90
    assert q5["small"][1] == 25 and q5["big"][1] == 75
    # selection takes min(quota, source size): the small source has
    # only 10 docs, so its quota of 25 cannot be filled (sampling is
    # without replacement; leftover budget is not redistributed)
    sel = (
        temperature_mixture_quotas(docs, budget=100, alpha=0.5)
        .filter(F.col("selected"))
        .groupBy("source")
        .count()
        .collect()
    )
    assert {r.source: r["count"] for r in sel} == {"big": 75, "small": 10}


def test_alpha_pow_rejects_unportable_exponents(spark):
    import pytest

    from airbnb_pyspark_jobs_spark.operators.sampling import _alpha_pow

    with pytest.raises(ValueError):
        _alpha_pow(F.lit(2.0), 0.3)


def test_char_bigram_entropy_orders_repetitive_below_diverse(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import char_bigram_entropy

    df = spark.createDataFrame(
        [
            (1, "ababababababababababab"),          # 2 distinct bigrams
            (2, "the quick brown fox jumps over!"),  # diverse
            (3, "a"),                                # sub-2-char -> 0
            (4, "aaaaaaaaaaaa"),                     # 1 distinct bigram -> H=0
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in char_bigram_entropy(df).collect()}
    assert out[3].n_bigrams == 0 and out[3].entropy == 0.0
    assert out[4].entropy == 0.0 and out[4].low_entropy
    assert out[1].entropy < out[2].entropy
    assert out[1].low_entropy and out[2].low_entropy  # both under 5.8 bits (short)
    # exact check: 'abab...' has bigrams ab x11, ba x10 -> H ~ 0.9986
    import math
    n, ca, cb = 21, 11, 10
    want = round(math.log2(n) - (ca * round(math.log2(ca) * 1e9) + cb * round(math.log2(cb) * 1e9)) / (n * 1e9), 6)
    assert abs(out[1].entropy - want) < 1e-9


def test_dsir_importance_scores_target_like_docs_higher(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import dsir_importance_weights

    # target slice (docs 1-4) speaks "alpha beta"; background speaks
    # "gamma delta"; doc 10 mimics the target, doc 11 the background.
    rows = [(i, "alpha beta alpha beta", True) for i in range(1, 5)]
    rows += [(i, "gamma delta gamma delta", False) for i in range(5, 10)]
    rows += [(10, "alpha beta", False), (11, "gamma delta", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = {
        r.doc_id: r
        for r in dsir_importance_weights(df, is_target=F.col("tgt")).collect()
    }
    assert out[10].avg_logratio > out[11].avg_logratio
    # at toy scale add-1 smoothing over 1024 buckets dominates the
    # absolute sign, so assert the flag's DEFINITION, not its value
    assert out[10].keep == (out[10].avg_logratio > 0)
    assert not out[11].keep
    # n_ngrams = unigrams + bigrams = 2 + 1 for the two-token docs
    assert out[10].n_ngrams == 3


def test_dsir_single_token_doc_has_no_bigrams(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import dsir_importance_weights

    df = spark.createDataFrame(
        [(1, "solo", True), (2, "a b", False)],
        "doc_id long, text string, tgt boolean",
    )
    out = {
        r.doc_id: r
        for r in dsir_importance_weights(df, is_target=F.col("tgt")).collect()
    }
    # the sequence(1,0)-descending guard: 1-token doc = 1 unigram only
    assert out[1].n_ngrams == 1
    assert out[2].n_ngrams == 3


def test_bigram_interp_scores_fluent_above_shuffled(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import (
        bigram_interp_logprob_scores,
    )

    # corpus dominated by the bigram "a b"; doc 10 follows the pattern,
    # doc 11 uses the same unigrams in never-seen orders
    rows = [(i, "a b a b a b") for i in range(1, 6)]
    rows += [(10, "a b a b"), (11, "b b a a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_interp_logprob_scores(df).collect()}
    assert out[10].n_tokens == 4
    assert out[10].mean_logprob > out[11].mean_logprob


def test_bigram_interp_single_token_doc_uses_unigram_only(spark):
    import math

    from airbnb_pyspark_jobs_spark.operators.corpus import (
        bigram_interp_logprob_scores,
    )

    df = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_interp_logprob_scores(df).collect()}
    # two tokens total, both "x": p_uni = 1.0, ln -> 0.0
    assert out[1].n_tokens == 1
    assert abs(out[1].mean_logprob - round(math.log(1.0), 6)) < 1e-12


def test_bm25_ranks_matching_docs_first(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "spark shuffle join"),
            (2, "spark spark spark shuffle"),
            (3, "cats and dogs"),
            (4, "join join filler filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(df, [(0, "spark join")], top_k=4).collect()
    rows = {r.doc_id: r for r in out}
    # doc 3 shares no query term -> absent entirely
    assert set(rows) == {1, 2, 4}
    # doc 1 matches BOTH terms and is short -> best
    assert [r.doc_id for r in sorted(out, key=lambda r: r.rn)][0] == 1
    assert all(r.query_id == 0 for r in out)


def test_bm25_idf_downweights_common_terms(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import bm25_topk

    # "common" is in every doc, "rare" in one: equal tf, doc 2 must
    # outrank doc 1 for a query containing both
    df = spark.createDataFrame(
        [(1, "common alpha"), (2, "common rare"), (3, "common beta"), (4, "common gamma")],
        "doc_id long, text string",
    )
    out = sorted(bm25_topk(df, [(0, "common rare")], top_k=4).collect(), key=lambda r: r.rn)
    assert out[0].doc_id == 2
    assert len(out) == 4


def test_oov_rates_against_truncated_vocab(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import oov_rates

    # vocab_size=2 keeps the two most frequent terms ("a", "b")
    df = spark.createDataFrame(
        [(1, "a a b rare1"), (2, "a b"), (3, "rare2 rare3")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in oov_rates(df, vocab_size=2).collect()}
    assert out[1].n_tokens == 4 and out[1].n_oov == 1
    assert out[1].oov_rate == 0.25
    assert out[2].n_oov == 0
    assert out[3].n_oov == 2 and out[3].oov_rate == 1.0


def test_tfidf_cosine_pairs_identical_docs_score_one(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import tfidf_cosine_pairs

    df = spark.createDataFrame(
        [
            (1, "rare1 rare2 rare3"),
            (2, "rare1 rare2 rare3"),     # identical -> cos 1.0
            (3, "rare1 rare2 other"),     # shares 2/3 rare terms
            (4, "alpha beta gamma"),      # disjoint -> absent
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id_a, r.doc_id_b): r.cos_sim
        for r in tfidf_cosine_pairs(df, threshold=0.1, max_df_ratio=1.0).collect()
    }
    assert out[(1, 2)] == 1.0
    assert 0.1 < out[(1, 3)] < 1.0
    assert (1, 4) not in out and (2, 4) not in out


def test_pmi_ranks_exclusive_pair_above_independent(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import pmi_cooccurrence

    # "tea"+"pot" always together (PMI high); "the" in every doc
    # (PMI ~ 0 with anything)
    rows = [(i, "tea pot the") for i in range(6)]
    rows += [(i, "cat dog the") for i in range(6, 12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.term_a, r.term_b): r for r in pmi_cooccurrence(df, min_pair_docs=5, top_k=10).collect()}
    import math

    # pmi(pot, tea) = ln(6*12/(6*6)) = ln 2
    assert out[("pot", "tea")].pmi == round(math.log(2.0), 6)
    # pmi(tea, the) = ln(6*12/(6*12)) = 0
    assert out[("tea", "the")].pmi == 0.0
    assert out[("pot", "tea")].rn < out[("tea", "the")].rn


def test_two_phase_helpers_reject_reserved_columns(spark):
    """The range-bucket helpers use __b/__run/... internally; an input
    frame carrying those names used to be silently clobbered (q213's
    first draft lost its counts column to the bucket id). Now they
    raise."""
    import pytest

    from airbnb_pyspark_jobs_spark.operators.sampling import (
        two_phase_numeric_cumsum,
        two_phase_numeric_rank,
    )

    df = spark.createDataFrame([(1.0, 2)], "v double, __b long")
    with pytest.raises(ValueError, match="__b"):
        two_phase_numeric_rank(df, "v", "v", "rk")
    with pytest.raises(ValueError, match="__b"):
        two_phase_numeric_cumsum(df, "v", "v", "__b", "c")


def test_cumsum_multi_equals_stacked_singles(spark):
    """One bucket pass over several value columns must equal the
    twice-applied single-column helper row-for-row."""
    from airbnb_pyspark_jobs_spark.operators.sampling import (
        two_phase_numeric_cumsum,
        two_phase_numeric_cumsum_multi,
    )

    df = spark.createDataFrame(
        [(float(i % 7), i, i % 3, (i * 2) % 5) for i in range(200)],
        "v double, id long, a long, b long",
    )
    multi = {
        (r.v, r.id): (r.c1, r.c2)
        for r in two_phase_numeric_cumsum_multi(
            df, "v", "id", ["a", "b"], ["c1", "c2"]
        ).collect()
    }
    single = {
        (r.v, r.id): (r.c1, r.c2)
        for r in two_phase_numeric_cumsum(
            two_phase_numeric_cumsum(df, "v", "id", "a", "c1"),
            "v",
            "id",
            "b",
            "c2",
        ).collect()
    }
    assert multi == single


def test_retrieval_metrics_match_python_recompute(spark):
    """retrieval_metrics' wiring is checked against an INDEPENDENT
    python recompute: take bm25_topk's actual ranking + the boolean-AND
    relevance set and re-derive MRR/nDCG/precision/recall with the same
    integer-micro gains; a no-match query yields the all-zero row."""
    from airbnb_pyspark_jobs_spark.operators.corpus import (
        bm25_topk,
        dcg_gain_micros,
        retrieval_metrics,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b"),
            (2, "a b a"),
            (3, "a a a a a a a a"),
            (4, "y z"),
            (5, "b y"),
        ],
        "doc_id long, text string",
    )
    queries = [(0, "a b"), (1, "q")]
    k = 3
    out = {r.query_id: r for r in retrieval_metrics(docs, queries, k=k).collect()}
    assert set(out) == {0, 1}
    # query 1 matches nothing
    r1 = out[1]
    assert (r1.n_relevant, r1.n_hits, r1.mrr, r1.ndcg) == (0, 0, 0.0, 0.0)
    assert (r1.precision_at_k, r1.recall_at_k) == (0.0, 0.0)

    # independent recompute for query 0
    ranked = sorted(
        (r.rn, r.doc_id)
        for r in bm25_topk(docs, queries, top_k=k).collect()
        if r.query_id == 0
    )
    rel = {1, 2}  # docs containing BOTH a and b
    hits = [(rn, d) for rn, d in ranked if d in rel]
    g6, cum6 = dcg_gain_micros(k)
    dcg6 = sum(g6[rn - 1] for rn, _ in hits)
    idcg6 = cum6[min(len(rel), k) - 1]

    def ratio(num, den):  # round-half-away at 6, like decimal_ratio_round
        q = (2 * 10**6 * abs(num) + den) // (2 * den)
        return (q if num >= 0 else -q) / 1e6

    r0 = out[0]
    assert r0.n_relevant == 2 and r0.n_hits == len(hits)
    assert r0.mrr == ratio(1, hits[0][0])
    assert r0.ndcg == ratio(dcg6, idcg6)
    assert r0.precision_at_k == ratio(len(hits), k)
    assert r0.recall_at_k == ratio(len(hits), 2)
