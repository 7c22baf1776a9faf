"""Scaling exponents for the round-5 heavy families (VERDICT r5 ask #5)
plus the q38 tree-digest hot-term stress (ask #1).

Fits alpha = log(t2/t1) / log(n2/n1) over ~10x input growth for:
- q184 feature covariance (REAL operator, synthetic embeddings, d=32):
  expected alpha ~ 1 (n·d²/2 scan-side products, d²-row shuffle);
- q145 triangle counts (REAL operator, synthetic sparse graph):
  expected alpha ~ 1 on bounded-degree graphs (degree-ordered wedges);
- q218 Poisson-bootstrap mean (same plan SHAPE as
  plans/analytics_queries.q218: 16x explode + md5 inverse-CDF draw +
  one 16-group aggregate): expected alpha ~ 1 (scan-bound);
- q38 vocabulary with a PLANTED hot term in EVERY doc: the tree digest
  must stay ~linear, and its worst aggregation buffer is n/B doc-ids
  vs the flat digest's n (reported side by side; the flat variant is
  the pre-round-6 hazard shape, timed here only as the comparison).

Usage: python scripts/heavy_family_scaling.py [sizes_csv] [ops_csv]
(default sizes 100000,300000,1000000; default ops all of
q184,q145,q218,q38 — pass e.g. `q145,q218` to push the cheap ops to
larger n without paying for covariance)
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from airbnb_pyspark_jobs_spark.caching import release_owned_caches  # noqa: E402
from airbnb_pyspark_jobs_spark.session import get_spark  # noqa: E402
from airbnb_pyspark_jobs_spark.sources.synthetic import register  # noqa: E402

SIZES = (
    [int(x) for x in sys.argv[1].split(",")]
    if len(sys.argv) > 1
    else [100_000, 300_000, 1_000_000]
)
OPS = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else {
    "q184", "q145", "q218", "q38", "q308", "q311", "q306", "q305",
    "q315", "q320",
}


REPS = int(os.environ.get("SCALING_REPS", "1"))


def run(label: str, thunk) -> float:
    """Time thunk-to-noop-sink; with SCALING_REPS=k, best of k runs
    (first-run JIT/codegen warmup otherwise dominates the cheap ends of
    a ladder and can even make alpha come out negative)."""
    best = float("inf")
    for _ in range(max(1, REPS)):
        t0 = time.perf_counter()
        thunk().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label}: {best:.1f}s" + (f" (best of {REPS})" if REPS > 1 else ""), flush=True)
    return best


def synthetic_embeddings(spark, n: int, d: int = 32):
    """Deterministic dense vectors: component j of row i derives from
    md5-free integer mixing (cheap, JVM-side)."""
    return (
        spark.range(n)
        .repartition(32)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {d - 1}), j -> "
                "cast(pmod(hash(id, j), 1000) as double) / 1000.0)"
            ).alias("embedding"),
        )
        .localCheckpoint()
    )


def synthetic_edges(spark, m: int):
    """Sparse graph with ~m edges over m/4 nodes: each edge connects
    hash-derived endpoints — bounded expected degree (~8), plus local
    i->i+1 chains so triangles exist."""
    nodes = m // 4
    return (
        spark.range(m)
        .repartition(32)
        .select(
            F.pmod(F.hash(F.col("id")), F.lit(nodes)).cast("long").alias("src"),
            F.pmod(F.hash(F.col("id") + 1_000_000_007), F.lit(nodes))
            .cast("long")
            .alias("dst"),
        )
        .localCheckpoint()
    )


def q218_shape(spark, n: int, reps: int = 16, lanes: int = 4):
    """The q218 plan shape over n synthetic (key, price) rows (r8: one
    md5 digest per (row, group) carries `lanes` 8-hex-char uniforms)."""
    from airbnb_pyspark_jobs_spark.plans.analytics_queries import _POIS_CDF

    x = (
        spark.range(n)
        .repartition(32)
        .select(
            F.col("id").alias("k"),
            (F.pmod(F.hash("id"), F.lit(10_000)).cast("decimal(12,2)") / 100).alias(
                "__price"
            ),
        )
    )
    hs = x.select(
        "__price",
        "k",
        F.explode(F.sequence(F.lit(0), F.lit(reps // lanes - 1))).alias("__g"),
    ).select(
        "__price",
        "__g",
        F.md5(
            F.concat_ws("|", F.col("k").cast("string"), F.col("__g").cast("string"))
        ).alias("__h"),
    )
    rep = hs.select(
        "__price",
        "__g",
        "__h",
        F.explode(F.sequence(F.lit(0), F.lit(lanes - 1))).alias("__j"),
    )
    u = (
        F.conv(
            F.col("__h").substr((F.lit(1) + F.col("__j") * 8).cast("int"), F.lit(8)),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    c = F.when(u < float(_POIS_CDF[0]), 0)
    for kk, p in enumerate(_POIS_CDF[1:], start=1):
        c = c.when(u < float(p), kk)
    c = c.otherwise(6)
    drawn = rep.select(
        (F.col("__g") * lanes + F.col("__j")).alias("__r"), "__price", c.alias("__c")
    )
    return drawn.groupBy(F.col("__r").cast("int").alias("replicate")).agg(
        F.sum("__c").cast("bigint").alias("n_eff"),
        F.sum(F.col("__c") * F.col("__price")).cast("decimal(38,2)").alias("s"),
    )


def hot_corpus(spark, n: int):
    """Synthetic docs where EVERY doc contains the planted term 'hotly'
    (df = n — the stopword-grade skewed key)."""
    return (
        spark.read.format("synthetic_docs")
        .option("n", n)
        .option("partitions", 32)
        .option("vocab_size", 5000)
        .option("zipf_s", 1.1)
        .load()
        .select("doc_id", F.concat(F.lit("hotly "), F.col("text")).alias("text"))
        .localCheckpoint()
    )


def flat_vocabulary(docs):
    """The PRE-round-6 flat digest (single per-term collect_list) —
    timed only as the hazard comparison; its worst buffer is the hot
    term's FULL n-id list in one task."""
    from airbnb_pyspark_jobs_spark.operators.corpus import tokens

    term_rows = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(tokens("text")).alias("t"),
    ).select("doc_id", F.lower("t").alias("term"))
    per_doc = term_rows.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.md5(F.concat_ws(",", F.sort_array(F.collect_list("doc_id")))).alias(
            "postings_md5"
        ),
    )


def main() -> None:
    spark = get_spark(app_name="heavy_family_scaling", profile="local")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    from airbnb_pyspark_jobs_spark.operators.corpus import vocabulary
    from airbnb_pyspark_jobs_spark.operators.dedupe import triangle_counts
    from airbnb_pyspark_jobs_spark.operators.similarity import feature_covariance

    results: dict[str, dict[int, float]] = {}
    for n in SIZES:
        print(f"== n={n} ==", flush=True)
        if "q184" in OPS:
            spark.catalog.clearCache(); release_owned_caches()
            emb = synthetic_embeddings(spark, n)
            results.setdefault("q184_covariance_d32", {})[n] = run(
                "q184 covariance", lambda: feature_covariance(emb)
            )
            emb.unpersist()
        if "q145" in OPS:
            spark.catalog.clearCache(); release_owned_caches()
            edges = synthetic_edges(spark, n)
            results.setdefault("q145_triangles", {})[n] = run(
                "q145 triangles", lambda: triangle_counts(edges)
            )
            edges.unpersist()
        if "q218" in OPS:
            spark.catalog.clearCache(); release_owned_caches()
            results.setdefault("q218_bootstrap_shape", {})[n] = run(
                "q218 bootstrap", lambda: q218_shape(spark, n)
            )
        if "q308" in OPS:
            # Heaps-law fit (round 7): term explode + two keyed
            # aggregates + the grouped two-phase cumsum + exact OLS —
            # expected alpha ~ 1 (every stage scan- or key-bounded).
            from airbnb_pyspark_jobs_spark.operators.corpus import heaps_law_fit

            spark.catalog.clearCache(); release_owned_caches()
            docs = (
                spark.read.format("synthetic_docs")
                .option("n", n).option("partitions", 32)
                .option("vocab_size", 5000).option("zipf_s", 1.1)
                .load()
                .withColumn("source", F.pmod(F.hash("doc_id"), F.lit(8)))
                .localCheckpoint()
            )
            results.setdefault("q308_heaps_fit", {})[n] = run(
                "q308 Heaps-law fit (8 sources)",
                lambda: heaps_law_fit(docs, group_col="source"),
            )
            docs.unpersist()
        if "q311" in OPS:
            # Unigram-LM EM step (round 7): cost = one corpus-scan word
            # aggregate + DISTINCT-WORD-bounded substring lattice + DP.
            # With a fixed synthetic vocab the word table saturates, so
            # alpha should fall well below 1 past the first decade —
            # the "nothing scales with corpus rows after the first
            # aggregate" claim, measured.
            from airbnb_pyspark_jobs_spark.operators.bpe import unigram_lm_em

            spark.catalog.clearCache(); release_owned_caches()
            docs = (
                spark.read.format("synthetic_docs")
                .option("n", n).option("partitions", 32)
                .option("vocab_size", 5000).option("zipf_s", 1.1)
                .load().localCheckpoint()
            )
            results.setdefault("q311_unigram_em", {})[n] = run(
                "q311 unigram-LM EM step", lambda: unigram_lm_em(docs)
            )
            docs.unpersist()
        if "q306" in OPS:
            # Confident-learning suspects (round 7): one scan-side
            # projection + a 2-row threshold aggregate broadcast back.
            # Expected alpha ~ 1 (pure scan).
            from airbnb_pyspark_jobs_spark.operators.classifier import (
                confident_label_suspects,
            )

            spark.catalog.clearCache(); release_owned_caches()
            scored = (
                spark.range(n)
                .repartition(32)
                .select(
                    F.col("id").alias("doc_id"),
                    F.pmod(F.hash("id"), F.lit(2)).cast("bigint").alias("y"),
                    (
                        F.pmod(F.hash(F.col("id") + 7), F.lit(1_000_000)).cast(
                            "double"
                        )
                        / 1e6
                    ).alias("p"),
                )
                .localCheckpoint()
            )
            results.setdefault("q306_label_suspects", {})[n] = run(
                "q306 confident-learning suspects",
                lambda: confident_label_suspects(scored),
            )
            scored.unpersist()
        if "q305" in OPS:
            # Matryoshka truncation sweep (round 7): |dims_list|+1
            # bounded-query brute passes (Q=10 broadcast queries) over
            # the corpus. Expected alpha ~ 1 in corpus size — each pass
            # is one n·d scan, no candidate blowup.
            from airbnb_pyspark_jobs_spark.operators.similarity import (
                matryoshka_recall,
            )

            spark.catalog.clearCache(); release_owned_caches()
            emb = synthetic_embeddings(spark, n, d=64)
            qs = emb.filter(F.col("vec_id") < 10).localCheckpoint()
            results.setdefault("q305_matryoshka_d64_q10", {})[n] = run(
                "q305 matryoshka sweep (d=64, Q=10)",
                lambda: matryoshka_recall(emb, qs, dims_list=(8, 16, 32, 64)),
            )
            emb.unpersist()
        if "q315" in OPS:
            # Duplicated-span run profile (round 8): the q103 covered-
            # position stage + one doc-partitioned gaps-and-islands
            # window + a broadcast threshold join. Expected alpha ~ 1
            # (same scan/keyed shape as the measured q103 family).
            from airbnb_pyspark_jobs_spark.operators.dedupe import (
                dup_span_run_profile,
            )

            spark.catalog.clearCache(); release_owned_caches()
            docs = (
                spark.read.format("synthetic_docs")
                .option("n", n).option("partitions", 32)
                .option("vocab_size", 5000).option("zipf_s", 1.1)
                .load().localCheckpoint()
            )
            results.setdefault("q315_span_profile", {})[n] = run(
                "q315 dup-span run profile", lambda: dup_span_run_profile(docs)
            )
            docs.unpersist()
        if "q320" in OPS:
            # Template clusters (round 8): winnowing fingerprints ->
            # df-capped fragment pairs -> pointer-jumping components ->
            # cluster stats. The df cap bounds the pair fan-out, so
            # expected alpha ~ 1 despite the quadratic-looking join.
            from airbnb_pyspark_jobs_spark.operators.dedupe import (
                dedup_components,
            )
            from airbnb_pyspark_jobs_spark.functions import text as TX
            from airbnb_pyspark_jobs_spark.plans.text_queries import (
                _Q155_MAX_DF,
                _Q155_MIN_SHARED,
                _WK,
                _WW,
            )

            spark.catalog.clearCache(); release_owned_caches()
            docs = (
                spark.read.format("synthetic_docs")
                .option("n", n).option("partitions", 32)
                .option("vocab_size", 5000).option("zipf_s", 1.1)
                .load().localCheckpoint()
            )

            def template_clusters():
                norm = docs.select("doc_id", TX.normalize_text("text").alias("__t"))
                hashed = norm.select(
                    "doc_id", TX.kgram_hashes("__t", k=_WK).alias("__h")
                )
                w = hashed.select(
                    "doc_id", F.explode(TX.window_minima("__h", w=_WW)).alias("fp")
                ).localCheckpoint()
                rare = (
                    w.groupBy("fp")
                    .agg(F.count(F.lit(1)).alias("__df"))
                    .filter(F.col("__df") <= _Q155_MAX_DF)
                )
                wf = w.join(rare.select("fp"), "fp")
                pairs = (
                    wf.alias("a")
                    .join(
                        wf.alias("b"),
                        on=[
                            F.col("a.fp") == F.col("b.fp"),
                            F.col("a.doc_id") < F.col("b.doc_id"),
                        ],
                    )
                    .groupBy(
                        F.col("a.doc_id").alias("doc_id_a"),
                        F.col("b.doc_id").alias("doc_id_b"),
                    )
                    .agg(F.count(F.lit(1)).alias("n_shared"))
                    .filter(F.col("n_shared") >= _Q155_MIN_SHARED)
                    .localCheckpoint()
                )
                nodes = (
                    pairs.select(F.col("doc_id_a").alias("doc_id"))
                    .unionByName(pairs.select(F.col("doc_id_b").alias("doc_id")))
                    .distinct()
                )
                comp = dedup_components(nodes, pairs.select("doc_id_a", "doc_id_b"))
                return comp.groupBy("component_id").agg(
                    F.count(F.lit(1)).alias("n_docs")
                )

            results.setdefault("q320_template_clusters", {})[n] = run(
                "q320 template clusters", template_clusters
            )
            docs.unpersist()
        if "simhash" in OPS:
            # SimHash width ladder (round 9, VERDICT r8 #1): RAW banded
            # candidate volume and pair-op wall time at 16-bit md5
            # (oracle-portable) vs 64-bit xxhash64 (production), q59's
            # max_hamming=1 / bands=2 config. Candidate volume is
            # computed WITHOUT materializing the join: sum over
            # (band_idx, band_val) buckets of C(cnt, 2). Expected: the
            # 16-bit baseline grows ~n²/2^8 per band while 64-bit band
            # values carry 32 bits, so chance collisions vanish and
            # volume tracks only REAL near-dups (~linear).
            from airbnb_pyspark_jobs_spark.operators.dedupe import (
                simhash_pairs,
                simhash_signatures,
            )

            spark.catalog.clearCache(); release_owned_caches()
            docs = (
                spark.read.format("synthetic_docs")
                .option("n", n).option("partitions", 32)
                .option("vocab_size", 5000).option("zipf_s", 1.1)
                .load().localCheckpoint()
            )
            for bits, hf in ((16, "md5"), (64, "xxhash64")):
                band_bits = bits // 2
                mask = (1 << band_bits) - 1
                sig = simhash_signatures(docs, bits=bits, hash_fn=hf)
                banded = sig.select(
                    F.explode(
                        F.array(
                            *[
                                F.struct(
                                    F.lit(b).alias("band_idx"),
                                    F.shiftright(F.col("simhash"), b * band_bits)
                                    .bitwiseAND(F.lit(mask))
                                    .alias("band_val"),
                                )
                                for b in range(2)
                            ]
                        )
                    ).alias("bv")
                ).select("bv.band_idx", "bv.band_val")
                raw = (
                    banded.groupBy("band_idx", "band_val")
                    .agg(F.count(F.lit(1)).alias("c"))
                    .agg(
                        F.sum(
                            (F.col("c") * (F.col("c") - 1) / 2).cast("bigint")
                        ).alias("raw_pairs")
                    )
                    .first()["raw_pairs"]
                )
                print(f"  simhash bits={bits}: raw candidates {raw}", flush=True)
                results.setdefault(f"simhash_pairs_b{bits}", {})[n] = run(
                    f"simhash_pairs bits={bits} ({hf})",
                    lambda bits=bits, hf=hf: simhash_pairs(
                        docs, max_hamming=1, bands=2, bits=bits, hash_fn=hf
                    ),
                )
            docs.unpersist()
        if "q319" in OPS:
            # PQ code-utilization (round 9, VERDICT r8 #4): the q319
            # composition = q83 encode (train + scan-side projection)
            # + the two-level code-count aggregate. Training collects
            # m·k·sub doubles per iteration (bounded); everything else
            # is scan- or key-bounded. Expected alpha ~ 1.
            from airbnb_pyspark_jobs_spark.operators.similarity import (
                pq_encode,
                pq_train_codebooks,
            )

            spark.catalog.clearCache(); release_owned_caches()
            emb = synthetic_embeddings(spark, n, d=64)

            def q319_shape():
                books = pq_train_codebooks(emb, m=4, k=8, iters=2, dims=64)
                codes = pq_encode(emb, books).select("codes")
                per = codes.select(
                    F.explode(F.sequence(F.lit(0), F.lit(3))).alias("__s"), "codes"
                ).select(
                    "__s",
                    F.element_at(F.split("codes", "-"), F.col("__s") + 1)
                    .cast("bigint")
                    .alias("__code"),
                )
                cnt = per.groupBy("__s", "__code").agg(
                    F.count(F.lit(1)).alias("__c")
                )
                return cnt.groupBy("__s").agg(
                    F.count(F.lit(1)).alias("n_used"),
                    F.max("__c").alias("top_code_n"),
                    F.sum("__c").alias("n"),
                )

            results.setdefault("q319_pq_utilization", {})[n] = run(
                "q319 PQ code utilization", q319_shape
            )
            emb.unpersist()
        if "q321" in OPS:
            # Neyman allocation (round 9): one grouped DECIMAL(38,0)
            # moment pass over token counts + a broadcast scalar total.
            # Expected alpha ~ 1 (scan-bound; |sources| rows shuffled).
            from airbnb_pyspark_jobs_spark.functions.text import token_count

            spark.catalog.clearCache(); release_owned_caches()
            docs = (
                spark.read.format("synthetic_docs")
                .option("n", n).option("partitions", 32)
                .option("vocab_size", 5000).option("zipf_s", 1.1)
                .load().localCheckpoint()
            )

            def q321_shape():
                tc = F.col("__t").cast("decimal(38,0)")
                m = (
                    docs.select("source", token_count("text").alias("__t"))
                    .groupBy("source")
                    .agg(
                        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                        F.sum(tc).cast("decimal(38,0)").alias("__s"),
                        F.sum(tc * tc).cast("decimal(38,0)").alias("__ss"),
                    )
                )
                w = m.select(
                    "source",
                    "n_docs",
                    F.round(
                        F.sqrt(
                            (
                                F.col("n_docs") * F.col("__ss")
                                - F.col("__s") * F.col("__s")
                            ).cast("double")
                        )
                        * 1e6
                    )
                    .cast("bigint")
                    .alias("w_micro"),
                )
                tw = w.agg(F.sum("w_micro").cast("bigint").alias("__tw"))
                quota = F.expr("(1000 * w_micro) div __tw")
                return w.crossJoin(F.broadcast(tw)).select(
                    "source",
                    "n_docs",
                    quota.cast("bigint").alias("quota"),
                    F.least(quota, F.col("n_docs")).cast("bigint").alias("alloc"),
                )

            results.setdefault("q321_neyman", {})[n] = run(
                "q321 Neyman allocation", q321_shape
            )
            docs.unpersist()
        if "q322" in OPS:
            # Audio-fingerprint collision spectrum (round 9): ONE Arrow
            # mapInPandas pass shipping 8 longs per clip + a keyed
            # count. Expected alpha ~ 1 (scan-bound). 256-byte
            # deterministic payloads.
            from airbnb_pyspark_jobs_spark.operators.multimodal import (
                audio_fingerprints,
            )

            spark.catalog.clearCache(); release_owned_caches()
            media = (
                spark.range(n)
                .repartition(32)
                .select(
                    F.col("id").alias("media_id"),
                    F.encode(
                        F.repeat(F.md5(F.col("id").cast("string")), 8), "utf-8"
                    ).alias("payload"),
                )
                .localCheckpoint()
            )
            results.setdefault("q322_fp_spectrum", {})[n] = run(
                "q322 audio fp spectrum",
                lambda: audio_fingerprints(media, n_windows=8, window=64)
                .groupBy("fingerprint")
                .agg(F.count(F.lit(1)).alias("n_clips")),
            )
            media.unpersist()
        if "q323" in OPS:
            # Semi-Markov holding times (round 9): one user-partitioned
            # lead window + one grouped exact-integer aggregate.
            # Expected alpha ~ 1 (bounded events-per-user partitions).
            from pyspark.sql.window import Window

            from airbnb_pyspark_jobs_spark.functions.numeric import (
                decimal_ratio_round,
            )

            spark.catalog.clearCache(); release_owned_caches()
            ev = (
                spark.range(n)
                .repartition(32)
                .select(
                    F.pmod(F.hash("id"), F.lit(max(1000, n // 100)))
                    .cast("long")
                    .alias("user_id"),
                    F.concat(
                        F.lit("ev"),
                        F.pmod(F.hash(F.col("id") + 7), F.lit(8)).cast("string"),
                    ).alias("event_type"),
                    (
                        F.col("id") * 1_000_000
                        + F.pmod(F.hash(F.col("id") + 13), F.lit(997))
                    ).alias("us"),
                    F.col("id").alias("event_id"),
                )
                .localCheckpoint()
            )

            def q323_shape():
                w = Window.partitionBy("user_id").orderBy("us", "event_id")
                e = ev.select(
                    "event_type",
                    F.col("us").alias("__us"),
                    F.lead("us").over(w).alias("__nxt"),
                )
                g = e.filter(F.col("__nxt").isNotNull()).select(
                    "event_type",
                    (F.col("__nxt") - F.col("__us")).cast("bigint").alias("__h"),
                )
                return g.groupBy("event_type").agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
                    decimal_ratio_round(
                        F.sum(F.col("__h").cast("decimal(38,0)")),
                        F.count(F.lit(1)) * F.lit(1_000_000),
                        4,
                    ).alias("mean_hold_sec"),
                    F.min("__h").alias("min_hold_us"),
                    F.max("__h").alias("max_hold_us"),
                )

            results.setdefault("q323_holding_times", {})[n] = run(
                "q323 holding times", q323_shape
            )
            ev.unpersist()
        if "q324" in OPS:
            # IVF hubness audit (round 10, VERDICT r9 #7): the exact
            # half is the O(n²) all-pairs ranking BY DESIGN (the audit
            # baseline), so alpha ~ 2 at growing SAMPLE n — which is
            # exactly why the registry entry runs on the id-bounded
            # audit sample (q52/q316 convention). The approx half
            # (ann_hubness_estimate, the 100 TB path) is timed
            # alongside WITH CELLS SIZED TO n (n/64 centroids): the
            # per-list candidate volume stays ~constant, so alpha ~ 1.
            from airbnb_pyspark_jobs_spark.operators.similarity import (
                ann_hubness_estimate,
                ann_hubness_profile,
            )

            spark.catalog.clearCache(); release_owned_caches()
            hub_n = max(200, n // 200)  # exact audit sizes: n²-bounded
            emb_s = synthetic_embeddings(spark, hub_n)
            results.setdefault("q324_hubness_audit_exactO2", {})[hub_n] = run(
                f"q324 hubness audit (exact+approx, n={hub_n})",
                lambda: ann_hubness_profile(
                    emb_s, k=5, n_centroids=8, n_probe=2, train_iters=3
                ),
            )
            emb_s.unpersist()
            spark.catalog.clearCache(); release_owned_caches()
            emb_a = synthetic_embeddings(spark, n // 10)
            results.setdefault("q324_hubness_approx_scaled_cells", {})[n // 10] = run(
                f"q324 approx hubness (cells=n/64, n={n // 10})",
                lambda: ann_hubness_estimate(
                    emb_a,
                    k=5,
                    n_centroids=max(8, (n // 10) // 64),
                    n_probe=2,
                    train_iters=1,
                ),
            )
            emb_a.unpersist()
        if "twolevel" in OPS:
            # Two-level coarse quantizer (round 10, q345): index BUILD
            # cost at cells ∝ n (k = n/64), flat vs hierarchical with
            # the SAME total cell count. Flat assignment is O(n·k) =
            # O(n²/64); two-level is O(n·2√k). Expected: flat α → 2,
            # two-level α → 1.5, with a widening absolute gap.
            import math as _math

            from airbnb_pyspark_jobs_spark.operators.similarity import (
                ivf_corpus_lists,
                ivf_two_level_lists,
                ivf_two_level_lists_spill,
                kmeans_centroids,
                kmeans_centroids_two_level,
            )

            spark.catalog.clearCache(); release_owned_caches()
            tn = n // 10
            k_cells = max(16, tn // 64)
            k_side = max(4, int(_math.isqrt(k_cells)))
            emb = synthetic_embeddings(spark, tn)

            def flat_build():
                c = kmeans_centroids(emb, k=k_side * k_side, iters=1)
                return ivf_corpus_lists(emb, c).groupBy("cid").count()

            def two_build():
                s, b = kmeans_centroids_two_level(
                    emb, k_super=k_side, k_sub=k_side, iters=1
                )
                return ivf_two_level_lists(emb, s, b).groupBy("scid", "sub").count()

            def spill_build():
                # q347 multi-assignment: super top-2 + margin filter +
                # grouped sub-assign over (1+spill)·n memberships —
                # must keep the two-level α (O(n·√k)), small constant up
                s, b = kmeans_centroids_two_level(
                    emb, k_super=k_side, k_sub=k_side, iters=1
                )
                return (
                    ivf_two_level_lists_spill(emb, s, b, spill_margin_units=500)
                    .groupBy("scid", "sub")
                    .count()
                )

            print(f"  twolevel: n={tn} cells={k_side * k_side}", flush=True)
            results.setdefault("ivf_build_flat_cells_prop_n", {})[tn] = run(
                f"flat IVF build (k={k_side * k_side})", flat_build
            )
            results.setdefault("ivf_build_two_level_same_cells", {})[tn] = run(
                f"two-level IVF build ({k_side}x{k_side})", two_build
            )
            results.setdefault("ivf_build_two_level_spill500", {})[tn] = run(
                f"two-level spill build ({k_side}x{k_side}, margin 500)",
                spill_build,
            )
            emb.unpersist()
        if "q330" in OPS:
            # IVF imbalance factor (round 10): trained Lloyd (k·iters
            # corpus scans) + ONE assignment scan + a k-row aggregate.
            # Expected alpha ~ 1.
            from airbnb_pyspark_jobs_spark.functions.numeric import (
                decimal_ratio_round,
            )
            from airbnb_pyspark_jobs_spark.operators.similarity import (
                ivf_corpus_lists,
                kmeans_centroids,
            )

            spark.catalog.clearCache(); release_owned_caches()
            emb = synthetic_embeddings(spark, n)

            def q330_shape():
                cents = kmeans_centroids(emb, k=8, iters=3)
                sz = ivf_corpus_lists(emb, cents).groupBy("cid").agg(
                    F.count(F.lit(1)).cast("bigint").alias("__s")
                )
                d38 = "decimal(38,0)"
                agg = sz.agg(
                    F.sum("__s").cast("bigint").alias("n"),
                    F.count(F.lit(1)).cast("bigint").alias("n_cells"),
                    F.max("__s").cast("bigint").alias("max_cell"),
                    F.sum(F.col("__s").cast(d38) * F.col("__s").cast(d38))
                    .cast(d38)
                    .alias("__ss"),
                )
                return agg.select(
                    "n", "n_cells", "max_cell",
                    decimal_ratio_round(
                        F.lit(8) * F.col("__ss"), F.col("n") * F.col("n"), 6
                    ).alias("imbalance_factor"),
                )

            results.setdefault("q330_ivf_imbalance", {})[n] = run(
                "q330 IVF imbalance (train+assign+agg)", q330_shape
            )
            emb.unpersist()
        if "q333" in OPS or "q335" in OPS:
            # q333 decile vocab JSD (round 10): two-phase rank ->
            # decile -> token explode -> (decile, term) counts ->
            # decile-0 pair join via the intersection identity.
            # Expected alpha ~ 1 (scan + keyed aggregates; the join
            # materializes only (decile-0 term, decile) pairs).
            from airbnb_pyspark_jobs_spark.functions.text import tokens
            from airbnb_pyspark_jobs_spark.operators.sampling import (
                two_phase_numeric_rank,
            )

            def docs_n():
                return (
                    spark.read.format("synthetic_docs")
                    .option("n", n).option("partitions", 32)
                    .option("vocab_size", 5000).option("zipf_s", 1.1)
                    .load().localCheckpoint()
                )

            def jsd_shape(docs):
                ranked = two_phase_numeric_rank(
                    docs.select("doc_id"), "doc_id", "doc_id", "__rnk"
                )
                cnt = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
                dec = ranked.crossJoin(F.broadcast(cnt)).select(
                    "doc_id",
                    F.expr("(__rnk - 1) * 10 div __n").cast("bigint").alias("__dec"),
                )
                toks = (
                    docs.select("doc_id", F.explode(tokens("text")).alias("__t"))
                    .join(dec, "doc_id")
                    .select("__dec", F.lower("__t").alias("term"))
                )
                st = toks.groupBy("__dec", "term").agg(
                    F.count(F.lit(1)).cast("bigint").alias("__c")
                )
                a = st.filter(F.col("__dec") == 0).select(
                    "term", F.col("__c").alias("__ca")
                )
                b = st.filter(F.col("__dec") > 0).select(
                    F.col("__dec").alias("decile"), "term", F.col("__c").alias("__cb")
                )
                return (
                    a.join(b, "term")
                    .groupBy("decile")
                    .agg(
                        F.count(F.lit(1)).alias("n_shared_terms"),
                        F.sum("__ca").alias("mass_a"),
                        F.sum("__cb").alias("mass_b"),
                    )
                )

            if "q333" in OPS:
                spark.catalog.clearCache(); release_owned_caches()
                docs = docs_n()
                results.setdefault("q333_decile_jsd_shape", {})[n] = run(
                    "q333 decile vocab-drift shape", lambda: jsd_shape(docs)
                )
                docs.unpersist()
            if "q335" in OPS:
                # q335 dashboard = q333 drift + q328 redup (MinHash
                # pairs + decile ranks) + corpus Good-Turing, one row.
                # Expected alpha ~ 1 (sum of measured ~1 parts).
                from airbnb_pyspark_jobs_spark.operators.corpus import (
                    good_turing_bigram_mass,
                )
                from airbnb_pyspark_jobs_spark.operators.dedupe import (
                    minhash_lsh_pairs,
                )

                spark.catalog.clearCache(); release_owned_caches()
                docs = docs_n()

                def dash_shape():
                    drift = jsd_shape(docs)
                    pairs = minhash_lsh_pairs(
                        docs, num_hashes=8, bands=2, threshold=0.5,
                        persist_shingles=False,
                    )
                    gt = good_turing_bigram_mass(
                        docs.withColumn("__all", F.lit("all")), group_col="__all"
                    )
                    return (
                        drift.agg(F.max("decile").alias("d"))
                        .crossJoin(
                            F.broadcast(
                                pairs.agg(F.count(F.lit(1)).alias("n_pairs"))
                            )
                        )
                        .crossJoin(F.broadcast(gt.select("p_unseen")))
                    )

                results.setdefault("q335_dashboard_shape", {})[n] = run(
                    "q335 dashboard shape (drift+redup+GT)", dash_shape
                )
                docs.unpersist()
        if "bfd" in OPS:
            # BFD sequence packing (round 10, VERDICT r9 #5): runtime
            # ladder for pack_sequences_bfd with AUTO-DERIVED shards
            # (derive_pack_shards, target 20k chunks/shard here so the
            # derivation engages at measurable sizes). Expected alpha
            # ~ 1: per-shard span is pinned at ~target (n log target
            # work per shard x n/target shards), so wall time tracks n
            # while the sequential span stays FLAT — the greedy packer
            # q36 is timed alongside as the one-shuffle baseline.
            from airbnb_pyspark_jobs_spark.operators.corpus import (
                derive_pack_shards,
                pack_sequences,
                pack_sequences_bfd,
            )

            spark.catalog.clearCache(); release_owned_caches()
            target = 20_000
            chunks = (
                spark.range(n)
                .repartition(32)
                .select(
                    (F.col("id") / 4).cast("long").alias("doc_id"),
                    F.pmod(F.col("id"), F.lit(4)).alias("chunk_idx"),
                    (
                        64
                        + F.pmod(F.hash(F.col("id") + 3), F.lit(193)).cast("long")
                    ).alias("n_chunk_tokens"),
                )
                .localCheckpoint()
            )
            shards = derive_pack_shards(n, target)
            print(f"  bfd derived shards: {shards}", flush=True)
            results.setdefault("bfd_pack_auto_shards", {})[n] = run(
                "pack_sequences_bfd (auto shards)",
                lambda: pack_sequences_bfd(
                    chunks, budget=2048, target_chunks_per_shard=target
                ),
            )
            results.setdefault("concat_pack_same_shards", {})[n] = run(
                "pack_sequences greedy (same shards)",
                lambda: pack_sequences(chunks, budget=2048, shards=shards),
            )
            chunks.unpersist()
        if "q38" in OPS:
            spark.catalog.clearCache(); release_owned_caches()
            docs = hot_corpus(spark, n)
            results.setdefault("q38_tree_digest_hot", {})[n] = run(
                "q38 tree digest (hot term df=n)", lambda: vocabulary(docs)
            )
            results.setdefault("q38_flat_digest_hot", {})[n] = run(
                "q38 FLAT digest (hazard comparison)", lambda: flat_vocabulary(docs)
            )
            print(
                f"  worst buffer: tree ~{n // 64} ids/bucket vs flat {n} ids",
                flush=True,
            )
            docs.unpersist()
    print("\n| op | " + " | ".join(f"n={n}" for n in SIZES) + " | exponents |")
    for op, times in results.items():
        sizes = [n for n in SIZES if n in times]
        ts = [times[n] for n in sizes]
        exps = [
            round(
                math.log(ts[i + 1] / ts[i]) / math.log(sizes[i + 1] / sizes[i]), 2
            )
            for i in range(len(sizes) - 1)
        ]
        cells = [f"{times[n]:.1f}s" if n in times else "-" for n in SIZES]
        print("| " + op + " | " + " | ".join(cells) + f" | {exps} |")
    spark.stop()


if __name__ == "__main__":
    main()
