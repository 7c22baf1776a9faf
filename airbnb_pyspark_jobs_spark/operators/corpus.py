"""Corpus-level text operators for LLM training-data pipelines:
document chunking and TF-IDF term ranking.

Both are pure DataFrame compositions (no UDFs) with md5/integer/rounded
arithmetic so the DuckDB oracles reproduce them value-for-value.

Scale notes:
- :func:`chunk_documents` is scan-side (tokenize → chunk-index sequence
  → explode): no shuffle at all; output rows ≈ docs × tokens/stride.
- :func:`tfidf_top_terms` shuffles twice (per-doc term counts, per-term
  document frequencies) plus a broadcast of the scalar corpus size; the
  document-frequency join is an equi-join on the term — the natural
  partitioning for 100 TB corpora. ``max_df_ratio`` drops
  stopword-class terms BEFORE the rank window, the same df-cap
  economics as dedupe's ``max_shingle_df``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airbnb_pyspark_jobs_spark.functions.numeric import exact_mean_round
from airbnb_pyspark_jobs_spark.functions.text import py_query_terms, tokens


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard pre-tokenization step for context-window-bounded training.

    Chunk k covers tokens ``[k*stride, k*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap``; the last chunk index is
    ``ceil((n - chunk_tokens) / stride)`` (never negative), so every
    token is covered and short docs yield exactly one chunk. Returns
    ``doc_id, chunk_idx, chunk_text, n_chunk_tokens``.

    Tokenize-once staging: the token array is projected before the
    chunk lambda references it (the SCALE_NOTES lambda-inlining trap).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    tok = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks"))
    n = F.size("__toks")
    last_idx = F.greatest(
        F.floor((n - chunk_tokens + stride - 1) / F.lit(stride)).cast("int"), F.lit(0)
    )
    chunked = tok.select(
        "doc_id",
        "__toks",
        F.explode(F.sequence(F.lit(0), last_idx)).alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_k: int = 3,
    max_df_ratio: float | None = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF terms per document (lowercased whitespace tokens).

    ``tfidf = tf * ln(N / df)`` with tf = in-doc term count, df =
    number of docs containing the term, N = corpus size. Scores are
    rounded to 6 digits before ranking with (term) tie-breaks, making
    the top-k reproducible cross-engine despite float ln(). Terms in
    more than ``max_df_ratio`` of docs are dropped before ranking
    (stopword-class df cap). Returns
    ``doc_id, term, tf, df, tfidf, rn``.
    """
    term_rows = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("t"),
    ).select("doc_id", F.lower("t").alias("term"))

    tf = term_rows.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).alias("__n"))

    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("__n").cast("double") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    if max_df_ratio is not None:
        scored = scored.filter(
            F.col("df").cast("double") <= F.col("__n").cast("double") * max_df_ratio
        )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= top_k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rn")
    )


def quality_filter(
    docs: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 5000,
    min_quality: float = 0.5,
    max_top_token_ratio: float = 0.18,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style corpus quality gate: every document gets a ``keep``
    verdict plus the FIRST failing rule as ``drop_reason`` (ordered:
    lang → length → quality → repetition), so filtered corpora stay
    auditable — you can count what each rule removed.

    Signals reuse the tokenize-once staging from q40 (language guess,
    quality score) plus a repetition signal: the share of the most
    frequent lowercased token (`top_token_ratio`, the cheap Gopher
    repetition rule). The repetition signal is the only shuffle (token
    explode → per-doc counts → max/sum); everything else is scan-side.
    Returns ``doc_id, n_tokens, quality, lang_guess, top_token_ratio,
    keep, drop_reason``.
    """
    from airbnb_pyspark_jobs_spark.functions.text import (
        lang_guess_from_counts,
        quality_score_from_counts,
        stopword_count_from_tokens,
        tokens,
    )

    langs = ("en", "de", "es", "fr")
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("__toks"),
        F.regexp_count(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"))
        .cast("bigint")
        .alias("__n_punct"),
        F.length(text_col).cast("bigint").alias("__n_chars"),
    )
    counted = staged.select(
        "doc_id",
        "__n_punct",
        "__n_chars",
        F.size("__toks").cast("bigint").alias("n_tokens"),
        *[
            stopword_count_from_tokens(F.col("__toks"), lg).alias(f"__sw_{lg}")
            for lg in langs
        ],
    )
    rep = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("t"))
        .select("doc_id", F.lower("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            (F.max("c").cast("double") / F.sum("c").cast("double")).alias(
                "top_token_ratio"
            )
        )
    )
    sig = counted.join(rep, "doc_id").select(
        "doc_id",
        "n_tokens",
        quality_score_from_counts(
            F.col("n_tokens"), F.col("__sw_en"), F.col("__n_punct"), F.col("__n_chars")
        ).alias("quality"),
        lang_guess_from_counts([(lg, F.col(f"__sw_{lg}")) for lg in langs]).alias(
            "lang_guess"
        ),
        "top_token_ratio",
    )
    reason = (
        F.when(F.col("lang_guess") == "und", F.lit("lang"))
        .when(
            (F.col("n_tokens") < min_tokens) | (F.col("n_tokens") > max_tokens),
            F.lit("length"),
        )
        .when(F.col("quality") < min_quality, F.lit("quality"))
        .when(F.col("top_token_ratio") > max_top_token_ratio, F.lit("repetition"))
    )
    return sig.select(
        "*",
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )


def repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style bigram repetition signals per document: the share of
    bigram instances taken by the single most frequent bigram
    (``top_bigram_ratio``) and the share belonging to any bigram that
    occurs more than once (``dup_bigram_ratio``). The unigram variant
    lives in :func:`quality_filter` (``top_token_ratio``); bigram-level
    shares are the standard next rung for catching boilerplate and
    looping generations that unigram stats miss.

    Plan: tokenize-once projection → bigram array via two shifted
    ``slice``s zipped scan-side (no per-element recompute of the token
    split) → explode → ONE (doc_id, bigram) count shuffle → ONE per-doc
    aggregate. The bigram-instance total doubles as the denominator, so
    no join back to the input is needed. Documents with fewer than two
    tokens have no bigram instances and are absent from the output.

    Ratios are single IEEE divisions of exact integer counts —
    bit-identical across engines, emitted raw (never re-rounded).
    """
    staged = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks")
    )
    n_bi = F.greatest(F.size("__toks") - 1, F.lit(0))
    bg = staged.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("__toks", F.lit(1), n_bi),
                F.slice("__toks", F.lit(2), n_bi),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    )
    counts = bg.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    total = F.sum("c")
    return counts.groupBy("doc_id").agg(
        total.cast("bigint").alias("n_bigrams"),
        (F.max("c").cast("double") / total.cast("double")).alias("top_bigram_ratio"),
        (
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(F.lit(0))).cast("double")
            / total.cast("double")
        ).alias("dup_bigram_ratio"),
    )


def derive_digest_buckets(n_docs: int, target_ids_per_bucket: int = 100_000) -> int:
    """Digest-bucket count that bounds the worst level-1 aggregation
    buffer ABSOLUTELY: a term present in every one of ``n_docs``
    documents lands ≤ ``target_ids_per_bucket`` doc-ids (in expectation)
    per (term, bucket) group when ``B = max(64, ceil(N / target))``.
    Pure integer arithmetic — the oracle derives the same B in SQL with
    ``GREATEST(64, (COUNT(*) + target - 1) // target)``, so the tree
    digests stay bit-identical cross-engine at every corpus size."""
    return max(64, (int(n_docs) + target_ids_per_bucket - 1) // target_ids_per_bucket)


def vocabulary(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    digest_buckets: int | None = None,
    target_ids_per_bucket: int = 100_000,
    n_docs: int | None = None,
) -> DataFrame:
    """Corpus vocabulary / inverted-index build: one row per lowercased
    term with document frequency ``df``, collection frequency ``cf``,
    ``idf = round(ln(N/df), 6)`` and ``postings_md5`` — a TREE hash of
    the distinct doc-id posting list. The digest value-checks the FULL
    postings list cross-engine without shipping arrays around (array
    columns don't round-trip a pandas compare; a hash does).

    Tree digest (hot-term safety): a flat per-term
    ``collect_list(doc_id)`` puts a stopword-grade term's ENTIRE
    posting list into one aggregation buffer in one task — ~10 GB for a
    hot term at 10^9 docs, the textbook skewed-key OOM. Instead the
    list is hashed in two bounded levels: doc-ids are bucketed by
    ``pmod(md5-hash(doc_id), B)``, level 1 md5-hashes each (term,
    bucket) sub-list, level 2 md5-hashes the lexicographically-sorted
    bucket digests (buffer ≤ B fixed-width strings). Both levels are
    deterministic set functions of the posting list, so the oracle
    reproduces the digest exactly with the same two-level SQL.

    B auto-scales with the corpus (``digest_buckets=None``, the
    default): ``B = max(64, ceil(N / target_ids_per_bucket))`` bounds
    the worst level-1 buffer at ``target_ids_per_bucket`` ids
    ABSOLUTELY — not as N/64, which at 10^9 docs would still put
    ~15.6M ids in one buffer. B is derived IN-PLAN from a broadcast
    count aggregate (no eager driver action at plan-build time, one
    fewer job — VERDICT r7 #5); callers that already hold the corpus
    count can pass ``n_docs`` to pin B driver-side instead, and an
    explicit ``digest_buckets`` pins it outright (the digest VALUE
    depends on B, so cross-engine comparison must share it).

    Plan: explode → one (term, doc) aggregate (collapses duplicate
    occurrences while counting them for cf) → TWO bounded grouped
    aggregates for the tree digest; the corpus-size and bucket-count
    scalars join in as broadcasts.
    """
    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int

    if digest_buckets is None and n_docs is not None:
        digest_buckets = derive_digest_buckets(n_docs, target_ids_per_bucket)
    if digest_buckets is not None:
        staged = docs.withColumn("__B", F.lit(int(digest_buckets)).cast("bigint"))
    else:
        # same integer arithmetic as derive_digest_buckets / the SQL
        # oracle's GREATEST(64, (COUNT(*) + t - 1) // t), as a 1-row
        # broadcast frame
        t = int(target_ids_per_bucket)
        nb = docs.agg(
            F.greatest(
                F.lit(64).cast("bigint"),
                F.expr(f"(count(1) + {t - 1}) div {t}"),
            ).alias("__B")
        )
        staged = docs.crossJoin(F.broadcast(nb))
    # the digest bucket depends only on doc_id — hash ONCE per doc row,
    # before the token explode, not once per (term, doc) pair (measured
    # ~3x on the whole build at 1M docs)
    term_rows = staged.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.pmod(
            portable_hash_int(F.col(id_col).cast("string")), F.col("__B")
        ).alias("__b"),
        F.explode(tokens(text_col)).alias("t"),
    ).select("doc_id", "__b", F.lower("t").alias("term"))
    per_doc = term_rows.groupBy("term", "doc_id", "__b").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = docs.select(F.countDistinct(id_col).alias("__n"))
    per_bucket = (
        per_doc.groupBy("term", "__b")
        .agg(
            F.count(F.lit(1)).alias("__df_part"),
            F.sum("tf").alias("__cf_part"),
            F.md5(F.concat_ws(",", F.sort_array(F.collect_list("doc_id")))).alias(
                "__bdig"
            ),
        )
    )
    return (
        per_bucket.groupBy("term")
        .agg(
            F.sum("__df_part").alias("df"),
            F.sum("__cf_part").alias("cf"),
            F.md5(F.concat_ws(",", F.sort_array(F.collect_list("__bdig")))).alias(
                "postings_md5"
            ),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "df",
            "cf",
            F.round(
                F.log(F.col("__n").cast("double") / F.col("df").cast("double")), 6
            ).alias("idf"),
            "postings_md5",
        )
    )


def derive_pack_shards(
    n_chunks: int, target_chunks_per_shard: int = 100_000
) -> int:
    """Packing-shard count that bounds the SEQUENTIAL span of the
    per-shard packers absolutely (VERDICT r9 #5 — the fixed shards=8
    default was documented, not derived): one shard processes
    ~``target_chunks_per_shard`` chunks in one task whatever the corpus
    size, when ``shards = max(8, ceil(n / target))``. Same derivation
    shape as :func:`derive_digest_buckets` (the q38 bucket-autoscale
    precedent); pure integer arithmetic so an oracle can replay it with
    ``GREATEST(8, (n + target - 1) // target)``."""
    return max(
        8, (int(n_chunks) + target_chunks_per_shard - 1) // target_chunks_per_shard
    )


def pack_sequences(
    chunks: DataFrame,
    budget: int = 2048,
    shards: int = 8,
    id_col: str = "doc_id",
    order_col: str = "chunk_idx",
    token_col: str = "n_chunk_tokens",
    count_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Concat-style sequence packing: the step after chunking that fills
    fixed token-budget training sequences. Within a shard, chunks are
    concatenated in (doc, chunk) order and cut every ``budget`` tokens;
    a chunk belongs to the pack containing its FIRST token (packs can
    overflow by at most one chunk — the standard concat-and-split
    packing, not bin-packing, which is inherently sequential).

    Global greedy packing would serialize the corpus through one
    ordering; sharding by doc-id hash makes packing embarrassingly
    parallel — each shard is one window partition, so the whole
    operator is ONE shuffle (the per-shard window sort) plus the final
    pack aggregate, and determinism is a pure function of (doc ids,
    chunk order, budget, shards).

    Returns one row per pack: ``shard, pack_id, n_chunks, pack_tokens,
    n_docs`` (plus ``n_{c}`` = distinct values of each ``count_cols``
    column per pack — e.g. ``count_cols=("source",)`` adds
    ``n_source`` for pack-purity reporting, q342).
    """
    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int

    sharded = chunks.withColumn(
        "shard", F.pmod(portable_hash_int(F.col(id_col).cast("string")), F.lit(shards))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col), F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_excl = F.sum(token_col).over(w) - F.col(token_col)
    packed = sharded.withColumn(
        "pack_id",
        F.floor(cum_excl.cast("double") / F.lit(float(budget))).cast("bigint"),
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(token_col).cast("bigint").alias("pack_tokens"),
        F.countDistinct(id_col).alias("n_docs"),
        *[
            F.countDistinct(c).cast("bigint").alias(f"n_{c}")
            for c in count_cols
        ],
    )


def pack_sequences_bfd(
    chunks: DataFrame,
    budget: int = 2048,
    shards: int | None = None,
    id_col: str = "doc_id",
    order_col: str = "chunk_idx",
    token_col: str = "n_chunk_tokens",
    purity_col: str | None = None,
    count_cols: tuple[str, ...] = (),
    target_chunks_per_shard: int = 100_000,
) -> DataFrame:
    """Best-fit-decreasing sequence packing (VERDICT r8 #6) — the
    bin-packing alternative to :func:`pack_sequences`' concat-and-split:
    chunks sort by (tokens DESC, doc, chunk) and each goes into the
    FULLEST already-open bin that still fits (ties → lowest bin id;
    none fits → open a new bin). Bins never overflow — a chunk whose
    ``token_col`` exceeds ``budget`` cannot be placed under that
    contract and raises ValueError (VERDICT r9 #5: it used to silently
    open an overflowing bin, the exact silent-truncation hazard BFD
    exists to eliminate; split oversize chunks upstream, e.g.
    :func:`chunk_documents` with ``chunk_tokens <= budget``). q325
    measures the utilization delta vs the greedy packer through the
    q204 report.

    BFD is inherently sequential (each placement depends on every
    prior fill), so it runs per SHARD as one Arrow ``applyInPandas``
    group. ``shards=None`` (default) derives the count from the input
    via :func:`derive_pack_shards` — one extra count() job buys a
    sequential span bounded at ~``target_chunks_per_shard`` chunks per
    task whatever the corpus size (the q38 autoscale precedent);
    pass an explicit ``shards`` to pin it (oracle-replayed queries
    do). Determinism is a pure function of (ids, chunk order, budget,
    shards). Inside a shard the best-fit lookup is a bisect-maintained
    sorted fill list — O(n log n + n·insert), not the naive O(n·bins)
    scan.

    ``purity_col`` (q342 source-pure packing): shard by THAT column's
    hash and pack within (shard, purity_col) groups, so no bin ever
    mixes two of its values — the standard mitigation for
    cross-document/cross-source attention contamination. All chunks
    of one value serialize through one group, so a value with more
    than ~``target_chunks_per_shard`` chunks is the skew bound (the
    derived shard count still spreads DISTINCT values).

    Returns one row per pack: ``shard, pack_id, n_chunks, pack_tokens,
    n_docs`` plus ``n_{c}`` per ``count_cols`` entry (distinct values
    in the pack — ``count_cols=("source",)`` makes source purity an
    output column). ``pack_id`` is the bin's opening order within its
    packing group; with ``purity_col``, pack identity is (shard,
    purity value, pack_id) and ids restart per value.
    """
    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int

    b = int(budget)
    if shards is None:
        shards = derive_pack_shards(chunks.count(), target_chunks_per_shard)
    shard_key = purity_col if purity_col is not None else id_col
    sharded = chunks.withColumn(
        "shard",
        F.pmod(portable_hash_int(F.col(shard_key).cast("string")), F.lit(shards)),
    )
    group_keys = ["shard"] + ([purity_col] if purity_col is not None else [])

    def bfd(pdf):
        import bisect

        import pandas as pd

        if len(pdf) and int(pdf[token_col].max()) > b:
            worst = int(pdf[token_col].max())
            raise ValueError(
                f"pack_sequences_bfd: chunk with {worst} tokens exceeds "
                f"budget {b} — bins never overflow under BFD; split "
                "oversize chunks upstream or raise the budget"
            )
        pdf = pdf.sort_values(
            [token_col, id_col, order_col], ascending=[False, True, True]
        )
        fills_sorted: list[int] = []            # fill keys, ascending
        pairs: list[tuple[int, int]] = []       # (fill, bin_id), same order
        n_bins = 0
        assignments: list[int] = []
        for t in pdf[token_col].tolist():
            cap = b - t
            idx = bisect.bisect_right(fills_sorted, cap) - 1
            if idx < 0:  # nothing fits (or no bins yet): open a bin
                bin_id, new_fill = n_bins, t
                n_bins += 1
            else:
                f = fills_sorted[idx]
                left = bisect.bisect_left(fills_sorted, f)  # lowest bin id
                _, bin_id = pairs[left]
                del fills_sorted[left]
                del pairs[left]
                new_fill = f + t
            pos = bisect.bisect_left(pairs, (new_fill, bin_id))
            pairs.insert(pos, (new_fill, bin_id))
            fills_sorted.insert(pos, new_fill)
            assignments.append(bin_id)
        out = pdf.assign(__pack=assignments)
        gkeys = ["shard"] + ([purity_col] if purity_col is not None else [])
        g = out.groupby(gkeys + ["__pack"], as_index=False).agg(
            n_chunks=(token_col, "size"),
            pack_tokens=(token_col, "sum"),
            n_docs=(id_col, "nunique"),
            **{f"n_{c}": (c, "nunique") for c in count_cols},
        )
        cols = {"shard": g["shard"]}
        if purity_col is not None:
            cols[purity_col] = g[purity_col].astype(str)
        cols.update(
            {
                "pack_id": g["__pack"],
                "n_chunks": g["n_chunks"],
                "pack_tokens": g["pack_tokens"],
                "n_docs": g["n_docs"],
                **{f"n_{c}": g[f"n_{c}"] for c in count_cols},
            }
        )
        return pd.DataFrame(cols)

    schema = (
        "shard int, "
        + (f"{purity_col} string, " if purity_col is not None else "")
        + "pack_id bigint, n_chunks bigint, pack_tokens bigint, n_docs bigint"
        + "".join(f", n_{c} bigint" for c in count_cols)
    )
    return sharded.groupBy(*group_keys).applyInPandas(bfd, schema=schema)


def cdc_chunks(
    docs: DataFrame,
    k: int = 8,
    divisor: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking (Rabin-style): cut after character
    ``i+k−1`` wherever the k-gram hash starting at ``i`` satisfies
    ``h % divisor == 0`` — expected chunk length ≈ ``divisor`` chars.

    Why not fixed-size chunks (q42): inserting one character shifts
    every later fixed boundary, so every downstream chunk fingerprint
    changes; CDC boundaries are functions of LOCAL content, so an edit
    disturbs only the chunk it lands in — the property that makes
    chunk-level dedup effective on near-identical documents (the same
    principle as rsync/LBFS/backup dedup, applied to corpus text).

    Scan-side only: staged projections (hash array → cut positions →
    bounds → explode), no shuffle, no UDFs. Returns ``doc_id,
    chunk_idx, chunk_text, chunk_md5, n_chars``; dedup = groupBy
    chunk_md5 (exact) or any of the pair ops over chunks.
    """
    from airbnb_pyspark_jobs_spark.functions.text import kgram_hashes

    t = F.col(text_col)
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        t.alias("__t"),
        F.length(t).alias("__n"),
        kgram_hashes(t, k=k).alias("__h"),
    )
    cuts = hashed.select(
        "doc_id",
        "__t",
        "__n",
        F.filter(
            F.transform(
                "__h",
                lambda x, i: F.when(
                    x % F.lit(divisor) == 0, i + F.lit(k)
                ).otherwise(F.lit(None).cast("bigint")),
            ),
            lambda c: c.isNotNull() & (c < F.col("__n")),
        ).alias("__cuts"),
    )
    bounded = cuts.select(
        "doc_id",
        "__t",
        F.concat(
            F.array(F.lit(0).cast("bigint")),
            F.col("__cuts"),
            F.array(F.col("__n").cast("bigint")),
        ).alias("__b"),
    )
    seg = bounded.select(
        "doc_id",
        "__t",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("__b") - 2),
                lambda j: F.struct(
                    F.element_at(F.col("__b"), (j + 1).cast("int")).alias("s"),
                    F.element_at(F.col("__b"), (j + 2).cast("int")).alias("e"),
                ),
            )
        ).alias("chunk_idx", "seg"),
    )
    chunk = F.col("__t").substr(
        (F.col("seg.s") + 1).cast("int"), (F.col("seg.e") - F.col("seg.s")).cast("int")
    )
    staged = seg.select(
        "doc_id", F.col("chunk_idx").cast("bigint").alias("chunk_idx"), chunk.alias("chunk_text")
    )
    return staged.select(
        "doc_id",
        "chunk_idx",
        "chunk_text",
        F.md5("chunk_text").alias("chunk_md5"),
        F.length("chunk_text").cast("bigint").alias("n_chars"),
    )


GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Per-rule Gopher quality flags (Rae et al. 2021, "Scaling Language
    Models: Methods, Analysis & Insights from Training Gopher",
    Appendix A1.1 — public paper): word-count bounds, mean-word-length
    bounds, symbol-to-word ratio ('#' and '...'), alphabetic-word
    ratio, and the required-stopword rule (≥2 distinct of the/be/to/of/
    and/that/have/with).

    Complements :func:`quality_filter` (first-failing-rule audit): here
    EVERY rule is reported as its own ``pass_*`` boolean plus the
    underlying signal, so rule-level ablations can be measured
    corpus-wide (what fraction fails ONLY the stopword rule, etc.);
    ``keep`` is the AND of all rules.

    Scale: one tokenize pass staged into a column, then pure scan-side
    array math — no shuffle, no UDFs; integer sums / integer counts →
    one IEEE division → round, so signals are bitwise cross-engine.
    """
    from airbnb_pyspark_jobs_spark.functions.text import tokens

    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__t"),
        tokens(text_col).alias("__toks"),
    )
    # project per-token lengths / flags BEFORE the folds (lambda
    # discipline: never nest an expensive expression inside transform)
    arrs = staged.select(
        "doc_id",
        "__t",
        F.size("__toks").cast("bigint").alias("n_words"),
        F.transform("__toks", lambda t: F.length(t).cast("bigint")).alias("__lens"),
        F.size(F.filter("__toks", lambda t: t.rlike("[A-Za-z]")))
        .cast("bigint")
        .alias("__n_alpha"),
        F.size(
            F.array_intersect(
                F.transform("__toks", F.lower),
                F.array(*[F.lit(w) for w in GOPHER_REQUIRED_STOPWORDS]),
            )
        )
        .cast("bigint")
        .alias("n_required_stopwords"),
    )
    nw = F.col("n_words").cast("double")
    sig = arrs.select(
        "doc_id",
        "n_words",
        "n_required_stopwords",
        F.round(
            F.aggregate("__lens", F.lit(0).cast("bigint"), lambda a, x: a + x).cast(
                "double"
            )
            / nw,
            4,
        ).alias("mean_word_len"),
        F.round(
            (
                (F.length("__t") - F.length(F.replace(F.col("__t"), F.lit("#"))))
                + (F.length("__t") - F.length(F.replace(F.col("__t"), F.lit("..."))))
                / F.lit(3)
            ).cast("double")
            / nw,
            6,
        ).alias("symbol_word_ratio"),
        F.round(F.col("__n_alpha").cast("double") / nw, 4).alias("alpha_word_ratio"),
    )
    flags = sig.select(
        "*",
        ((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)).alias(
            "pass_word_count"
        ),
        (
            (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len)
        ).alias("pass_mean_word_len"),
        (F.col("symbol_word_ratio") <= max_symbol_word_ratio).alias(
            "pass_symbol_ratio"
        ),
        (F.col("alpha_word_ratio") >= min_alpha_word_ratio).alias("pass_alpha_ratio"),
        (F.col("n_required_stopwords") >= min_stopwords).alias("pass_stopwords"),
    )
    return flags.select(
        "*",
        (
            F.col("pass_word_count")
            & F.col("pass_mean_word_len")
            & F.col("pass_symbol_ratio")
            & F.col("pass_alpha_ratio")
            & F.col("pass_stopwords")
        ).alias("keep"),
    )


def unigram_logprob_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lp_digits: int = 6,
    score_digits: int = 4,
) -> DataFrame:
    """Mean unigram log-probability per document — the SQL-expressible
    stand-in for the perplexity filter of CCNet-style pipelines (score
    every document by how well a corpus-trained LM predicts it; keep
    the well-fit head / drop the gibberish tail). A unigram LM replaces
    CCNet's KenLM (no external model artifacts here), which preserves
    the operator's SHAPE: one corpus-scale pass to train, one broadcast
    join to score.

    Determinism recipe: per-term ``ln(freq/total)`` is rounded to
    ``lp_digits`` and cast to DECIMAL, per-doc sums are then EXACT, and
    the rounded mean is :func:`exact_mean_round` (pure-integer
    round-half-away — ``round(sum_double/n)`` flips at .5 boundaries
    across engines; see functions/numeric.py). Higher mean logprob =
    more typical of the corpus.

    Returns ``doc_id, n_tokens, mean_logprob``. Scale: the LM is
    vocab-sized (broadcast); the only corpus-scale shuffles are the two
    token groupBys.
    """
    from airbnb_pyspark_jobs_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("t")
    ).select("doc_id", F.lower("t").alias("term"))
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("__c"))
    total = tf.agg(F.sum("__c").alias("__n"))
    lm = (
        tf.crossJoin(F.broadcast(total))
        .select(
            "term",
            F.round(
                F.log(F.col("__c").cast("double") / F.col("__n").cast("double")),
                lp_digits,
            )
            .cast(f"decimal(28,{lp_digits})")
            .alias("__lp"),
        )
    )
    return (
        toks.join(F.broadcast(lm), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            exact_mean_round(
                F.sum("__lp"), F.count(F.lit(1)), score_digits, sum_scale=lp_digits
            ).alias("mean_logprob"),
        )
    )


# Character-class signal for language ID: non-ASCII chars (CJK,
# Cyrillic, accented Latin...) — pattern valid in BOTH Java regex and
# RE2 so the DuckDB oracle runs it verbatim.
NON_ASCII_PATTERN = r"[^\x00-\x7f]"
LANGID_LANGS = ("de", "en", "es", "fr")  # alphabetical = tie-break order


def language_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_ratio: float = 0.02,
    min_margin: float = 0.005,
) -> DataFrame:
    """Heuristic language identification (CCNet/CLD-style public
    approach, no model download): per-language STOPWORD-PROFILE ratios
    over whitespace tokens plus a character-class signal
    (non-ASCII ratio), argmax with deterministic alphabetical
    tie-break, and an explicit reliability gate — the standard
    LLM-pipeline cleansing stage between dedup and quality filtering.

    Per-rule outputs (the :func:`gopher_rules` shape — every signal
    visible for rule-level ablations): ``ratio_<lang>`` for each
    profiled language, ``non_ascii_ratio``, the prediction
    (``'und'`` when the best ratio is under ``min_ratio`` — no
    evidence beats weak evidence), ``margin`` (best − second-best
    ratio) and ``reliable`` (prediction exists and margin ≥
    ``min_margin``).

    Scale: one tokenize pass staged into a column, per-language counts
    as array filters over it (lambda discipline: tokens projected
    FIRST), one regexp_count for the char-class — pure scan-side, no
    shuffle, no UDFs. Ratios are integer-count / integer-count
    divisions rounded to 6: bitwise cross-engine, so the whole
    operator value-checks against the DuckDB oracle.
    """
    from airbnb_pyspark_jobs_spark.functions.text import (
        stopword_count_from_tokens,
        tokens,
    )

    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("__toks"),
        F.regexp_count(F.col(text_col), F.lit(NON_ASCII_PATTERN))
        .cast("bigint")
        .alias("__n_nonascii"),
        F.length(text_col).cast("bigint").alias("__n_chars"),
    )
    counted = staged.select(
        "doc_id",
        "__n_nonascii",
        "__n_chars",
        F.size("__toks").cast("bigint").alias("n_tokens"),
        *[
            stopword_count_from_tokens(F.col("__toks"), lg).alias(f"__sw_{lg}")
            for lg in LANGID_LANGS
        ],
    )
    nt = F.col("n_tokens").cast("double")
    ratios = counted.select(
        "doc_id",
        "n_tokens",
        *[
            F.round(F.col(f"__sw_{lg}").cast("double") / nt, 6).alias(f"ratio_{lg}")
            for lg in LANGID_LANGS
        ],
        F.round(
            F.col("__n_nonascii").cast("double")
            / F.greatest(F.col("__n_chars"), F.lit(1)).cast("double"),
            6,
        ).alias("non_ascii_ratio"),
    )
    rcols = [F.col(f"ratio_{lg}") for lg in LANGID_LANGS]
    best = F.greatest(*rcols)
    # alphabetical tie-break: first language (in LANGID_LANGS order)
    # reaching the max wins — mirrored verbatim in the oracle CASE chain
    pred = F.lit("und")
    for lg in reversed(LANGID_LANGS):
        pred = F.when(F.col(f"ratio_{lg}") == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best >= F.lit(float(min_ratio)), pred).otherwise(F.lit("und"))
    sorted_r = F.array_sort(F.array(*rcols))
    margin = F.round(
        F.element_at(sorted_r, -1) - F.element_at(sorted_r, -2), 6
    )
    return ratios.select(
        "*",
        pred.alias("pred_lang"),
        margin.alias("margin"),
        ((pred != F.lit("und")) & (margin >= F.lit(float(min_margin)))).alias(
            "reliable"
        ),
    )


def char_bigram_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    low_entropy_threshold: float = 5.8,
) -> DataFrame:
    """Character-bigram Shannon entropy per document — the
    compression-ratio quality proxy (low entropy = repetitive /
    templated / low-information text; the signal compression-based
    filters like those in RefinedWeb-style pipelines approximate with
    zlib). H = log2(N) - (1/N)·Σ c_b·log2(c_b) over bigram counts.

    Cross-engine determinism (the no-float-group-sum rule): the only
    per-group float sum is replaced by an EXACT integer sum —
    log2(c_b) is rounded to 9 decimals and scaled to integer
    nano-units per (doc, bigram) row, so Σ c_b·round(log2(c_b)·1e9)
    is a BIGINT (aggregation-order independent); the final H is two
    libm log2 calls and one division, rounded to 6. Sub-2-char docs
    have no bigrams → entropy 0 (the empty-product convention),
    guarded against the descending-sequence(1,0) trap.

    Returns ``doc_id, n_bigrams, n_distinct_bigrams, entropy,
    low_entropy``. Scale: one explode (n_chars rows/doc) + one
    two-key groupBy — same shape as the shingle operators.
    """
    t = docs.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("__t")
    ).withColumn("__len", F.length("__t").cast("bigint"))
    idx = F.when(
        F.col("__len") >= 2, F.sequence(F.lit(1), (F.col("__len") - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    bg = t.select(
        "doc_id", F.explode(F.transform(idx, lambda i: F.substring("__t", i, 2))).alias("b")
    )
    counts = bg.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("__c"))
    agg = counts.groupBy("doc_id").agg(
        F.sum("__c").cast("bigint").alias("n_bigrams"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_bigrams"),
        F.sum(
            F.col("__c") * F.round(F.log2("__c") * 1e9).cast("bigint")
        )
        .cast("bigint")
        .alias("__s"),
    )
    h = F.round(
        F.log2(F.col("n_bigrams"))
        - F.col("__s").cast("double") / (F.col("n_bigrams").cast("double") * 1e9),
        6,
    )
    out = agg.select(
        "doc_id",
        "n_bigrams",
        "n_distinct_bigrams",
        h.alias("entropy"),
    )
    return (
        t.select("doc_id")
        .join(out, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("n_distinct_bigrams", F.lit(0))
            .cast("bigint")
            .alias("n_distinct_bigrams"),
            F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
        )
        .withColumn(
            "low_entropy", F.col("entropy") < F.lit(float(low_entropy_threshold))
        )
    )


def dsir_importance_weights(
    docs: DataFrame,
    is_target: F.Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    seed: str = "dsir:",
    lw_digits: int = 6,
    score_digits: int = 6,
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023 — public method): featurize every
    document as a bag of HASHED unigrams+bigrams, fit add-1-smoothed
    multinomials over the hash buckets for the TARGET slice (the
    distribution you want more of) and the RAW corpus, and score each
    document by its mean per-feature log-likelihood ratio
    ``ln p_target(b) - ln p_raw(b)``. Positive score = looks more like
    the target than the background; selection keeps the top slice.

    Cross-engine determinism: the bucket is the portable md5 hash mod
    ``buckets`` (non-negative 32-bit, so ``pmod`` == ``%``); each
    ``ln(p)`` is rounded to ``lw_digits`` and cast to DECIMAL before
    the subtraction, so per-bucket weights and per-doc sums are EXACT
    (aggregation-order independent); only the final mean is one double
    division + round.

    Returns ``doc_id, n_ngrams, avg_logratio, keep`` (keep =
    avg_logratio > 0). Scale: the corpus-sized work is one n-gram
    explode (≈2 rows per token) and two groupBys whose outputs are
    bucket-sized (``buckets`` rows); the weight table is broadcast, so
    scoring is a map-side join + one per-doc aggregation. No driver
    actions, no UDFs.
    """
    from airbnb_pyspark_jobs_spark.caching import owned_persist
    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int, tokens

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("__tgt"),
        F.transform(tokens(text_col), lambda x: F.lower(x)).alias("ts"),
    )
    uni = base.select("doc_id", "__tgt", F.explode("ts").alias("g"))
    # sequence(1, 0) is DESCENDING in Spark — guard short docs explicitly.
    bi_idx = F.when(
        F.size("ts") >= 2, F.sequence(F.lit(1), F.size("ts") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bi = base.select(
        "doc_id",
        "__tgt",
        F.explode(
            F.transform(
                bi_idx,
                lambda i: F.concat(
                    F.element_at("ts", i), F.lit(" "), F.element_at("ts", i + 1)
                ),
            )
        ).alias("g"),
    )
    # hashed feeds three consumers (raw counts, target counts, the
    # scoring join) — persist so the explode+md5 pass runs once
    hashed = owned_persist(
        uni.unionByName(bi).select(
            "doc_id",
            "__tgt",
            F.pmod(portable_hash_int(F.col("g"), seed=seed), F.lit(buckets)).alias("b"),
        )
    )
    raw = hashed.groupBy("b").agg(F.count(F.lit(1)).alias("__cq"))
    tgt = (
        hashed.filter(F.col("__tgt"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("__ct"))
    )
    totals = hashed.agg(
        F.count(F.lit(1)).cast("double").alias("__nq"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).cast("double").alias("__nt"),
    )
    k = float(buckets)
    dec = f"decimal(28,{lw_digits})"
    w = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.round(
                    F.log(
                        (F.coalesce(F.col("__ct"), F.lit(0)).cast("double") + 1.0)
                        / (F.col("__nt") + F.lit(k))
                    ),
                    lw_digits,
                ).cast(dec)
                - F.round(
                    F.log(
                        (F.col("__cq").cast("double") + 1.0) / (F.col("__nq") + F.lit(k))
                    ),
                    lw_digits,
                ).cast(dec)
            ).alias("__lw"),
        )
    )
    scored = (
        hashed.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ngrams"),
            F.round(
                F.sum("__lw").cast("double") / F.count(F.lit(1)).cast("double"),
                score_digits,
            ).alias("avg_logratio"),
        )
    )
    return scored.select(
        "doc_id",
        "n_ngrams",
        "avg_logratio",
        (F.col("avg_logratio") > F.lit(0.0)).alias("keep"),
    )


def bigram_interp_logprob_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
    lp_digits: int = 6,
    score_digits: int = 6,
) -> DataFrame:
    """Mean interpolated-bigram log-probability per document — the
    next step up from :func:`unigram_logprob_scores` toward CCNet's
    KenLM perplexity filter: score token i by
    ``ln(lam * p(w_i | w_{i-1}) + (1-lam) * p(w_i))`` (Jelinek-Mercer
    interpolation, MLE counts), first tokens by ``ln(p(w_i))``.
    Better-fit text scores higher; gibberish and shuffled text lose
    the bigram term's mass.

    Cross-engine determinism: the mixture is evaluated in one fixed
    double-op order ``(lam*pb) + ((1-lam)*pu)`` on both engines, then
    ``ln`` is rounded to ``lp_digits`` and cast DECIMAL so per-doc
    sums are exact; the rounded mean is :func:`exact_mean_round`
    (pure-integer round-half-away, see functions/numeric.py).

    Returns ``doc_id, n_tokens, mean_logprob``. Scale: the (term,
    prev) pairs come from an arrays_zip against the shifted token
    array — no window shuffle, no index lambdas (the tokenized frame
    is persisted as the re-inlining barrier); unigram/context tables
    are vocab-sized (broadcast); the bigram join is the one
    corpus-scale equi-join, left to AQE.
    """
    from airbnb_pyspark_jobs_spark.caching import owned_persist
    from airbnb_pyspark_jobs_spark.functions.text import tokens

    base = owned_persist(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.transform(tokens(text_col), lambda x: F.lower(x)).alias("__tk"),
        )
    )
    shifted = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(F.col("__tk"), 1, F.greatest(F.size("__tk") - 1, F.lit(0))),
    )
    pairs = base.select(
        "doc_id",
        F.explode(F.arrays_zip(F.col("__tk").alias("term"), shifted.alias("prev"))).alias(
            "__e"
        ),
    ).select("doc_id", F.col("__e.term").alias("term"), F.col("__e.prev").alias("prev"))
    tf = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("__c"))
    nn = tf.agg(F.sum("__c").cast("double").alias("__n"))
    bf = (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "term")
        .agg(F.count(F.lit(1)).alias("__cb"))
    )
    ctx = bf.groupBy("prev").agg(F.sum("__cb").cast("bigint").alias("__cc"))
    pu = F.col("__c").cast("double") / F.col("__n")
    pb = F.col("__cb").cast("double") / F.col("__cc").cast("double")
    mix = F.when(F.col("prev").isNull(), pu).otherwise(
        F.lit(float(lam)) * pb + F.lit(float(1.0 - lam)) * pu
    )
    scored = (
        pairs.join(F.broadcast(tf), "term")
        .join(bf, ["prev", "term"], "left")
        .join(F.broadcast(ctx), "prev", "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            F.round(F.log(mix), lp_digits).cast(f"decimal(28,{lp_digits})").alias("__lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        exact_mean_round(
            F.sum("__lp"), F.count(F.lit(1)), score_digits, sum_scale=lp_digits
        ).alias("mean_logprob"),
    )


def heldout_unigram_eval(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    seed: str = "",
    id_col: str = "doc_id",
    text_col: str = "text",
    lp_digits: int = 6,
    score_digits: int = 4,
) -> DataFrame:
    """Held-out LM evaluation — the eval-loss shape proper:
    :func:`unigram_logprob_scores` trains and scores on the SAME
    corpus (the filtering use), which cannot see overfitting; this
    trains the unigram LM on the hash-split TRAIN docs only (q43's
    split rule — membership is a pure function of (id, seed)) with
    add-one Laplace smoothing over the train vocabulary, then scores
    EVERY split with it: ``p(term) = (c_train + 1) / (N + V + 1)``,
    unseen terms at ``c_train = 0``. The per-split mean token logprob
    gap between train and val/test is the generalization readout, and
    ``oov_tokens`` counts the val/test tokens outside the train vocab
    (trivially 0 on the train row).

    Same determinism recipe as the LM family: per-token ``ln`` rounded
    to ``lp_digits`` → DECIMAL sums exact → :func:`exact_mean_round`.
    Returns ``split, n_docs, n_tokens, oov_tokens, mean_logprob``.
    Scale: one token pass to train (vocab-sized broadcast LM), one to
    score; the split table joins on doc id.
    """
    from airbnb_pyspark_jobs_spark.functions.numeric import exact_mean_round
    from airbnb_pyspark_jobs_spark.functions.text import tokens
    from airbnb_pyspark_jobs_spark.operators.sampling import hash_split

    fr = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    splits = hash_split(docs.select(F.col(id_col).alias("doc_id")), "doc_id", fr, seed=seed)
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("t")
        )
        .select("doc_id", F.lower("t").alias("term"))
        .join(splits, "doc_id")
    )
    tf = toks.filter(F.col("split") == "train").groupBy("term").agg(
        F.count(F.lit(1)).alias("__c")
    )
    sc = tf.agg(
        F.sum("__c").cast("bigint").alias("__n"),
        F.count(F.lit(1)).cast("bigint").alias("__v"),
    )
    lp = F.round(
        F.log(
            (F.coalesce(F.col("__c"), F.lit(0)) + 1).cast("double")
            / (F.col("__n") + F.col("__v") + 1).cast("double")
        ),
        lp_digits,
    ).cast(f"decimal(28,{lp_digits})")
    scored = (
        toks.join(F.broadcast(tf), "term", "left")
        .crossJoin(F.broadcast(sc))
        .select(
            "split",
            "doc_id",
            lp.alias("__lp"),
            F.when(F.col("__c").isNull(), 1).otherwise(0).alias("__oov"),
        )
    )
    return scored.groupBy("split").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("__oov").cast("bigint").alias("oov_tokens"),
        exact_mean_round(
            F.sum("__lp"), F.count(F.lit(1)), score_digits, sum_scale=lp_digits
        ).alias("mean_logprob"),
    )


def good_turing_bigram_mass(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Good-Turing unseen-mass estimate per source over BIGRAM types —
    "how much probability mass does this source's next crawl put on
    bigrams we have never seen?": the GT estimator is
    ``P(unseen) ≈ N1/N`` (hapax count over token mass) and the
    adjusted expected count of a current hapax is ``r* = 2·N2/N1``
    (Gale & Sampson's Simple GT first step). Unigrams are useless for
    this on a small closed vocabulary (no hapax); bigram types keep a
    live tail at every SF. Per source: one grouped count of bigram
    types, then exact-integer ratios (decimal_ratio_round).

    Returns ``{group_col}, n_bigrams, v_bigrams, n1, n2, p_unseen,
    r_star_singleton`` (``r_star_singleton`` NULL when N1 = 0). Scale:
    one token-pair explode + two keyed aggregates; no collects, no
    windows.
    """
    from airbnb_pyspark_jobs_spark.functions.numeric import decimal_ratio_round
    from airbnb_pyspark_jobs_spark.functions.text import tokens

    # single consumer below — no persist (caching a tokens-array
    # projection with one reader costs executor memory for nothing;
    # ADVICE r9)
    base = docs.select(
        F.col(group_col).alias("__g"), tokens(text_col).alias("__tk")
    )
    pair_len = F.greatest(F.size("__tk") - 1, F.lit(0))
    cur = F.slice(F.col("__tk"), 1, pair_len)
    nxt = F.slice(F.col("__tk"), 2, pair_len)
    bg = base.select(
        "__g",
        F.explode(F.arrays_zip(cur.alias("a"), nxt.alias("b"))).alias("__e"),
    ).select(
        "__g",
        F.concat_ws(" ", F.lower(F.col("__e.a")), F.lower(F.col("__e.b"))).alias(
            "__bg"
        ),
    )
    tf = bg.groupBy("__g", "__bg").agg(F.count(F.lit(1)).alias("__c"))
    agg = tf.groupBy("__g").agg(
        F.sum("__c").cast("bigint").alias("n_bigrams"),
        F.count(F.lit(1)).cast("bigint").alias("v_bigrams"),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("__c") == 2, 1).otherwise(0)).cast("bigint").alias("n2"),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        "n_bigrams",
        "v_bigrams",
        "n1",
        "n2",
        decimal_ratio_round(F.col("n1"), F.col("n_bigrams"), 6).alias("p_unseen"),
        F.when(
            F.col("n1") > 0,
            decimal_ratio_round(2 * F.col("n2"), F.col("n1"), 6),
        ).alias("r_star_singleton"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_digits: int = 6,
) -> DataFrame:
    """BM25 top-k retrieval (Robertson/Spärck Jones probabilistic
    ranking — the lexical half of a RAG retrieval stack): score every
    (query, document) pair by ``Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1
    - b + b·dl/avgdl))`` with ``idf = ln((N - df + 0.5)/(df + 0.5) +
    1)`` and keep the ``top_k`` docs per query.

    Cross-engine determinism: each per-term partial score is computed
    in one fixed double-op order, rounded to ``term_digits`` and cast
    DECIMAL, so per-pair sums are exact; ranking orders by the
    rounded score with doc-id tie-break.

    Returns ``query_id, doc_id, score, rn``. Scale: postings
    (term→doc tf lists) shuffle once on the term key; the query-term
    table and the two scalar aggregates (N, avgdl) broadcast; the
    rank window partitions by query. The corpus never joins itself.
    """
    from airbnb_pyspark_jobs_spark.caching import owned_persist
    from airbnb_pyspark_jobs_spark.functions.text import tokens

    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("t")
    ).select("doc_id", F.lower("t").alias("term"))
    # tf is the postings table every downstream frame derives from
    # (doc lengths, document frequencies, the scoring join) — persist
    # it so the tokenize+explode runs ONCE, not per consumer
    tf = owned_persist(
        toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("__tf"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("__tf").cast("bigint").alias("__dl"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("__df"))
    scal = dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        (F.sum("__dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "__avgdl"
        ),
    )
    qterms = spark.createDataFrame(
        [(qid, w) for qid, text in queries for w in py_query_terms(text)],
        "query_id long, term string",
    ).distinct()
    k1f, bf = float(k1), float(b)
    idf = F.log(
        ((F.col("__n") - F.col("__df").cast("double")) + 0.5)
        / (F.col("__df").cast("double") + 0.5)
        + 1.0
    )
    num = F.col("__tf").cast("double") * F.lit(k1f + 1.0)
    den = F.col("__tf").cast("double") + F.lit(k1f) * (
        F.lit(1.0 - bf) + F.lit(bf) * (F.col("__dl").cast("double") / F.col("__avgdl"))
    )
    part = (
        tf.join(F.broadcast(qterms), "term")
        .join(
            F.broadcast(
                df_t.join(
                    F.broadcast(qterms.select("term").distinct()), "term", "left_semi"
                )
            ),
            "term",
        )
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select(
            "query_id",
            "doc_id",
            F.round(idf * (num / den), term_digits)
            .cast(f"decimal(28,{term_digits})")
            .alias("__sc"),
        )
    )
    scored = part.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("__sc").cast("double"), term_digits).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= top_k)
    )


def coverage_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boolean-coverage retriever: rank documents per query by (distinct
    matched query terms DESC, total matched term frequency DESC, doc_id
    ASC) — the cheap recall-oriented counterpart to BM25, and the
    second list for reciprocal-rank fusion (q303). Integer-only
    ranking, so orders are bit-identical cross-engine by construction.

    Returns ``query_id, doc_id, n_matched, tf_matched, rn``. Scale: one
    (doc, term) count shuffle; the query-term table broadcasts; the
    rank window partitions by query and everything after the ranking is
    Q- and k-bounded."""
    spark = docs.sparkSession
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("t")
        )
        .select("doc_id", F.lower("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__tf"))
    )
    qt = spark.createDataFrame(
        sorted({(qid, w) for qid, text in queries for w in py_query_terms(text)}),
        "query_id long, term string",
    )
    per = (
        tf.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched"),
            F.sum("__tf").cast("bigint").alias("tf_matched"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_matched").desc(), F.col("tf_matched").desc(), F.col("doc_id").asc()
    )
    return (
        per.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= top_k)
    )


def rrf_gain_micros(rrf_k: int, max_rank: int) -> list[int]:
    """Reciprocal-rank-fusion gains in integer MICRO-units:
    ``g[r-1] = round(1e6 / (rrf_k + r))`` for ranks r=1..max_rank.
    Derived once in python and inlined as the SAME literals into the
    Spark plan and the SQL oracle (the dcg_gain_micros recipe) — rank
    positions are bounded, so literals delete float-division parity
    risk entirely."""
    return [int(round(1e6 / (rrf_k + r))) for r in range(1, max_rank + 1)]


def rrf_fuse(
    rankings: list[DataFrame],
    rrf_k: int = 60,
    top_k: int = 5,
    max_rank: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. SIGIR'09): fuse ranked
    lists by ``score(d) = Σ_lists 1/(rrf_k + rank_list(d))`` — the
    standard hybrid-retrieval combiner (BM25 + dense / coverage lists)
    for RAG data curation. Each input frame carries ``query_id, doc_id,
    rn`` (1-based, ≤ ``max_rank``); a doc absent from a list
    contributes nothing.

    Scores are summed in integer micro-units (:func:`rrf_gain_micros`)
    so fusion is exact-integer end to end; the final rank orders by
    (rrf_micro DESC, n_lists DESC, doc_id ASC). Returns ``query_id,
    doc_id, rrf_micro, n_lists, rn``. Scale: the per-list inputs are
    already Q·k-bounded, so the union + one grouped sum + the
    query-partitioned rank window are all tiny regardless of corpus
    size."""
    gains = rrf_gain_micros(rrf_k, max_rank)
    garr = F.array(*[F.lit(g).cast("bigint") for g in gains])
    parts = None
    for df in rankings:
        part = df.select(
            "query_id",
            "doc_id",
            F.element_at(garr, F.col("rn").cast("int")).alias("__g"),
        )
        parts = part if parts is None else parts.unionByName(part)
    fused = parts.groupBy("query_id", "doc_id").agg(
        F.sum("__g").cast("bigint").alias("rrf_micro"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("n_lists").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= top_k)
    )


def lexical_diversity(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group lexical-diversity profile — corpus-health signals a
    mixing pipeline reads before weighting sources: type-token ratio,
    hapax share (types occurring exactly once: the Zipf tail mass) and
    mean word length. All counts are exact BIGINTs aggregated in two
    bounded levels ((group, term) then group) and every reported ratio
    is one exact integer quotient
    (:func:`~airbnb_pyspark_jobs_spark.functions.numeric.decimal_ratio_round`).

    Returns ``{group_col}, n_tokens, n_types, n_hapax, ttr,
    hapax_share, mean_word_len``. Scale: one (group, term) shuffle —
    the same postings shape as the vocabulary build; no windows, no
    collects."""
    from airbnb_pyspark_jobs_spark.functions.numeric import decimal_ratio_round

    term_counts = (
        docs.select(F.col(group_col), F.explode(tokens(text_col)).alias("t"))
        .select(group_col, F.lower("t").alias("term"))
        .groupBy(group_col, "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__tf"))
    )
    agg = term_counts.groupBy(group_col).agg(
        F.sum("__tf").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.when(F.col("__tf") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.sum(F.length("term").cast("bigint") * F.col("__tf"))
        .cast("bigint")
        .alias("__chars"),
    )
    return agg.select(
        group_col,
        "n_tokens",
        "n_types",
        "n_hapax",
        decimal_ratio_round(F.col("n_types"), F.col("n_tokens"), 6).alias("ttr"),
        decimal_ratio_round(F.col("n_hapax"), F.col("n_types"), 6).alias(
            "hapax_share"
        ),
        decimal_ratio_round(F.col("__chars"), F.col("n_tokens"), 6).alias(
            "mean_word_len"
        ),
    )


def heaps_law_fit(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit per group: OLS of ln(V) on
    ln(N) where, scanning documents in ``id_col`` order, N is the
    cumulative token count and V the cumulative distinct-term count —
    the growth exponent β (natural text ≈ 0.4-0.6; β → 1 smells
    boilerplate/ID soup, β → 0 a closed template vocabulary). The
    per-source sibling of the q181 Zipf fit, with the same determinism
    recipe: each ln rounds to 3 decimals and scales to exact integer
    MILLI-units; the regression runs through grouped_trend's exact
    BIGINT moment sums; floats appear only in the final divisions.

    Scale: a term's FIRST occurrence is one (group, term) min-
    aggregate, per-doc token counts one (group, doc) aggregate, and
    the two cumulatives come from ONE grouped two-phase range-bucketed
    cumsum (:func:`~airbnb_pyspark_jobs_spark.operators.sampling.grouped_two_phase_cumsum_multi`)
    — no group-sized window partitions anywhere. Returns ``{group_col},
    n_docs, heaps_beta, heaps_intercept_milli, r2``."""
    from airbnb_pyspark_jobs_spark.operators.sampling import (
        grouped_two_phase_cumsum_multi,
    )
    from airbnb_pyspark_jobs_spark.operators.sketches import grouped_trend

    tr = docs.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__doc"),
        F.explode(tokens(text_col)).alias("t"),
    ).select("__g", "__doc", F.lower("t").alias("term"))
    per_doc = tr.groupBy("__g", "__doc").agg(
        F.count(F.lit(1)).cast("bigint").alias("__ntok")
    )
    first_occ = (
        tr.groupBy("__g", "term")
        .agg(F.min("__doc").alias("__doc"))
        .groupBy("__g", "__doc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__nnew"))
    )
    frame = per_doc.join(first_occ, ["__g", "__doc"], "left").select(
        "__g",
        "__doc",
        "__ntok",
        F.coalesce("__nnew", F.lit(0)).cast("bigint").alias("__nnew"),
    )
    cum = grouped_two_phase_cumsum_multi(
        frame, "__g", "__doc", "__doc", ["__ntok", "__nnew"], ["__cn", "__cv"]
    )
    xy = cum.select(
        "__g",
        F.round(
            F.round(F.log(F.col("__cn").cast("double")), 3) * F.lit(1000)
        ).alias("__x"),
        F.round(
            F.round(F.log(F.col("__cv").cast("double")), 3) * F.lit(1000)
        ).alias("__y"),
    )
    out = grouped_trend(
        xy, "__g", x_col=F.col("__x"), y_cents=F.col("__y"), out_digits=6
    )
    return out.select(
        F.col("__g").alias(group_col),
        F.col("n").alias("n_docs"),
        F.col("slope_cents").alias("heaps_beta"),
        F.col("intercept_cents").alias("heaps_intercept_milli"),
        "r2",
    )


def retrieval_hard_negatives(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hard-negative mining for retrieval training: the top-``k`` BM25
    documents per query that are NOT boolean-AND relevant (don't
    contain every query term) — lexically confusable non-answers, the
    standard negatives for training dense retrievers / rerankers
    (DPR-style BM25 negatives). Relevance is q301's conjunctive ground
    truth; ranking is q122's BM25.

    Returns ``query_id, doc_id, score, rn`` (BM25's rank retained so
    the training set keeps difficulty ordering). Scale: bm25_topk's
    postings shuffle plus ONE scan-side relevance semi-join against the
    broadcast query-term table; the anti-join runs on the Q·k-bounded
    ranked frame."""
    spark = docs.sparkSession
    ranked = bm25_topk(
        docs, queries, k1=k1, b=b, top_k=k, id_col=id_col, text_col=text_col
    )
    dterm = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("t")
        )
        .select("doc_id", F.lower("t").alias("term"))
        .distinct()
    )
    qt = spark.createDataFrame(
        sorted({(qid, w) for qid, text in queries for w in py_query_terms(text)}),
        "query_id long, term string",
    )
    nq = qt.groupBy("query_id").agg(F.count(F.lit(1)).cast("bigint").alias("__nq"))
    rel = (
        dterm.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__m"))
        .join(F.broadcast(nq), "query_id")
        .filter(F.col("__m") == F.col("__nq"))
        .select("query_id", "doc_id")
    )
    return ranked.join(rel, ["query_id", "doc_id"], "left_anti").select(
        "query_id", "doc_id", "score", "rn"
    )


def dcg_gain_micros(k: int) -> tuple[list[int], list[int]]:
    """Binary-relevance DCG gains in integer MICRO-units plus their
    prefix sums: ``g6[i-1] = round(1e6 · 1/log2(i+1))`` for ranks
    i=1..k, ``cum6[r-1] = Σ g6[:r]``. Derived ONCE in python and
    inlined as the SAME literals into the Spark plan and the SQL
    oracle — rank-position gains are the one place libm ln parity
    would otherwise matter, and k is bounded, so literals delete the
    risk entirely (the q92/q138 shared-artifact recipe)."""
    import math

    g6 = [int(round(1e6 * math.log(2.0) / math.log(i + 1.0))) for i in range(1, k + 1)]
    cum6 = [sum(g6[: r + 1]) for r in range(k)]
    return g6, cum6


def retrieval_metrics(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    digits: int = 6,
) -> DataFrame:
    """Ranking-quality metrics for the BM25 retrieval stack — the eval
    step of a RAG / retrieval data-curation pipeline: per query,
    ``MRR@k``, ``nDCG@k`` (binary gains), ``precision_at_k`` and
    ``recall_at_k`` of :func:`bm25_topk`'s ranking against boolean-AND
    relevance (a document is relevant iff it contains EVERY distinct
    query term — the conjunctive ground truth q214 searches).

    Numeric recipe: DCG/IDCG rank gains are the shared integer-micro
    literals of :func:`dcg_gain_micros` summed as BIGINTs; every
    reported ratio (1/first_rank, DCG/IDCG, hits/k, hits/R) is the
    round-half-away integer quotient of
    :func:`~airbnb_pyspark_jobs_spark.functions.numeric.decimal_ratio_round`
    — no float accumulation anywhere.

    Scale: relevance is one scan-side semi-join of the distinct
    (doc, term) pairs against the BROADCAST query-term table (bounded
    by |queries|·|terms|), then |q|-bounded per-(query, doc) counts;
    ranking work is bm25_topk's (postings shuffle once on term);
    everything after is Q- and k-bounded. Returns one row per query:
    ``query_id, n_relevant, n_hits, mrr, ndcg, precision_at_k,
    recall_at_k``.
    """
    from airbnb_pyspark_jobs_spark.functions.numeric import decimal_ratio_round
    from airbnb_pyspark_jobs_spark.functions.text import tokens

    spark = docs.sparkSession
    ranked = bm25_topk(
        docs, queries, k1=k1, b=b, top_k=k, id_col=id_col, text_col=text_col
    )
    dterm = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("t"))
        .select("doc_id", F.lower("t").alias("term"))
        .distinct()
    )
    qt = spark.createDataFrame(
        sorted({(qid, w) for qid, text in queries for w in py_query_terms(text)}),
        "query_id long, term string",
    )
    nq = qt.groupBy("query_id").agg(F.count(F.lit(1)).cast("bigint").alias("__nq"))
    rel = (
        dterm.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__m"))
        .join(F.broadcast(nq), "query_id")
        .filter(F.col("__m") == F.col("__nq"))
        .select("query_id", "doc_id")
    )
    relq = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_relevant")
    )
    g6, cum6 = dcg_gain_micros(k)
    gain = F.element_at(
        F.array(*[F.lit(g).cast("bigint") for g in g6]), F.col("rn").cast("int")
    )
    hits = ranked.join(rel, ["query_id", "doc_id"])
    hagg = hits.groupBy("query_id").agg(
        F.min("rn").cast("bigint").alias("__first"),
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        F.sum(gain).cast("bigint").alias("__dcg6"),
    )
    qframe = spark.createDataFrame(
        sorted({(qid,) for qid, _ in queries}), "query_id long"
    )
    cumarr = F.array(*[F.lit(c).cast("bigint") for c in cum6])
    zero = F.lit(0.0)
    out = (
        qframe.join(F.broadcast(relq), "query_id", "left")
        .join(F.broadcast(hagg), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_relevant", F.lit(0)).cast("bigint").alias("n_relevant"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            "__first",
            "__dcg6",
        )
        .select(
            "query_id",
            "n_relevant",
            "n_hits",
            F.when(
                F.col("__first").isNotNull(),
                decimal_ratio_round(F.lit(1), F.col("__first"), digits),
            )
            .otherwise(zero)
            .alias("mrr"),
            F.when(
                (F.col("n_relevant") > 0) & (F.col("n_hits") > 0),
                decimal_ratio_round(
                    F.col("__dcg6"),
                    F.element_at(
                        cumarr, F.least(F.col("n_relevant"), F.lit(k)).cast("int")
                    ),
                    digits,
                ),
            )
            .otherwise(zero)
            .alias("ndcg"),
            decimal_ratio_round(F.col("n_hits"), F.lit(k), digits).alias(
                "precision_at_k"
            ),
            F.when(
                F.col("n_relevant") > 0,
                decimal_ratio_round(F.col("n_hits"), F.col("n_relevant"), digits),
            )
            .otherwise(zero)
            .alias("recall_at_k"),
        )
    )
    return out


def oov_rates(
    docs: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_digits: int = 6,
) -> DataFrame:
    """Out-of-vocabulary rate per document against a frequency-
    truncated vocabulary (top ``vocab_size`` terms by corpus
    frequency, term tie-break) — the tokenizer-coverage diagnostic
    run before committing to a vocab size: how much of each document
    (and, aggregated, of the corpus) falls outside the proposed vocab.

    Returns ``doc_id, n_tokens, n_oov, oov_rate``. Scale: the vocab
    is a global top-V (TakeOrderedAndProject over the vocab-sized
    term-frequency table, never corpus rows) and broadcasts into a
    left join; counts are exact integers, the rate one division +
    round."""
    from airbnb_pyspark_jobs_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("t")
    ).select("doc_id", F.lower("t").alias("term"))
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("__cf"))
    vocab = (
        tf.orderBy(F.col("__cf").desc(), F.col("term").asc())
        .limit(int(vocab_size))
        .select("term", F.lit(1).alias("__in"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
                rate_digits,
            ).alias("oov_rate"),
        )
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    max_df_ratio: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    w_digits: int = 6,
    cos_digits: int = 4,
) -> DataFrame:
    """Sparse TF-IDF cosine similar pairs — the weighted counterpart
    of the Jaccard shingle join (q44): documents sharing many RARE
    terms score high even when token multisets differ. The classic
    sparse-vector similarity join: weights live term-partitioned, the
    pair dot product is a term equi-join + per-pair sum, and the df
    cap drops stopword-class terms whose df² fan-out carries no
    signal (q44's economics).

    Determinism: per-(doc,term) weights are ``round(tf·ln(N/df),
    w_digits)`` cast DECIMAL; pair dots and per-doc squared norms are
    then EXACT decimal sums (products of two rounded decimals);
    norms take one IEEE sqrt each and the cosine is one division +
    round — no float accumulates anywhere.

    Returns ``doc_id_a, doc_id_b, cos_sim`` (>= threshold). Scale:
    one term-key shuffle for weights, the capped term self-join, a
    pair-key aggregation; per-doc norms broadcast-join back."""
    from airbnb_pyspark_jobs_spark.caching import owned_persist
    from airbnb_pyspark_jobs_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("t")
    ).select("doc_id", F.lower("t").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("__tf"))
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    nd = docs.select(F.countDistinct(id_col).alias("__n"))
    dec = f"decimal(28,{w_digits})"
    w = owned_persist(
        tf.join(dfc, "term")
        .crossJoin(F.broadcast(nd))
        .filter(
            F.col("__df").cast("double")
            <= F.col("__n").cast("double") * F.lit(float(max_df_ratio))
        )
        .select(
            "doc_id",
            "term",
            (
                F.round(
                    F.col("__tf")
                    * F.log(
                        F.col("__n").cast("double") / F.col("__df").cast("double")
                    ),
                    w_digits,
                ).cast(dec)
            ).alias("__w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("__w") * F.col("__w")).cast("double")).alias("__nrm")
    )
    dots = (
        w.alias("a")
        .join(
            w.alias("b"),
            on=[
                F.col("a.term") == F.col("b.term"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .agg(F.sum(F.col("a.__w") * F.col("b.__w")).alias("__dot"))
    )
    return (
        dots.join(
            norms.withColumnsRenamed({"doc_id": "doc_id_a", "__nrm": "__na"}),
            "doc_id_a",
        )
        .join(
            norms.withColumnsRenamed({"doc_id": "doc_id_b", "__nrm": "__nb"}),
            "doc_id_b",
        )
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(
                F.col("__dot").cast("double") / (F.col("__na") * F.col("__nb")),
                cos_digits,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= F.lit(float(threshold)))
    )


def pmi_cooccurrence(
    docs: DataFrame,
    min_pair_docs: int = 5,
    top_k: int = 50,
    max_terms_per_doc: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    pmi_digits: int = 6,
) -> DataFrame:
    """Top-k word associations by document-level PMI:
    ``pmi(a,b) = ln(c_ab·T / (c_a·c_b))`` over document-presence
    counts — the classic collocation/association-mining statistic
    (positive = the pair co-occurs more than independence predicts).

    ``max_terms_per_doc`` bounds the per-doc pair fan-out (the
    quadratic hazard of long documents) by keeping each doc's
    most-frequent terms (tf desc, term asc — deterministic);
    ``min_pair_docs`` is the standard support floor that kills
    one-off coincidences. Counts are exact integers; the PMI is one
    fixed-order double expression + round; top-k orders by (pmi desc,
    a, b) — a heap, not a global sort.

    Returns ``term_a, term_b, n_docs_pair, pmi, rn``."""
    from pyspark.sql.window import Window

    from airbnb_pyspark_jobs_spark.caching import owned_persist
    from airbnb_pyspark_jobs_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("t")
    ).select("doc_id", F.lower("t").alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("__tf"))
    wr = Window.partitionBy("doc_id").orderBy(
        F.col("__tf").desc(), F.col("term").asc()
    )
    kept = owned_persist(
        tf.withColumn("__r", F.row_number().over(wr))
        .filter(F.col("__r") <= max_terms_per_doc)
        .select("doc_id", "term")
    )
    ca = kept.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    t_total = docs.select(F.countDistinct(id_col).cast("double").alias("__t"))
    pairs = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            on=[
                F.col("a.doc_id") == F.col("b.doc_id"),
                F.col("a.term") < F.col("b.term"),
            ],
        )
        .groupBy(F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs_pair"))
        .filter(F.col("n_docs_pair") >= min_pair_docs)
    )
    pmi = F.round(
        F.log(
            (F.col("n_docs_pair").cast("double") * F.col("__t"))
            / (F.col("__ca").cast("double") * F.col("__cb").cast("double"))
        ),
        pmi_digits,
    )
    scored = (
        pairs.join(
            F.broadcast(ca.withColumnsRenamed({"term": "term_a", "__c": "__ca"})),
            "term_a",
        )
        .join(
            F.broadcast(ca.withColumnsRenamed({"term": "term_b", "__c": "__cb"})),
            "term_b",
        )
        .crossJoin(F.broadcast(t_total))
        .select("term_a", "term_b", "n_docs_pair", pmi.alias("pmi"))
    )
    w = Window.orderBy(
        F.col("pmi").desc(), F.col("term_a").asc(), F.col("term_b").asc()
    )
    return (
        scored.orderBy(
            F.col("pmi").desc(), F.col("term_a").asc(), F.col("term_b").asc()
        )
        .limit(top_k)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
    )


def dataset_card(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
    major_lang: str = "en",
) -> DataFrame:
    """Per-source dataset datasheet — the summary table every corpus
    release publishes: document/token volumes, language purity, and
    exact-duplicate involvement per source. One scan-side projection
    (fingerprint + token count), one fingerprint-count join (the q41
    exact-dedup shuffle), one per-source aggregate; the output is
    source-dimension sized.

    Returns ``source, n_docs, total_tokens, avg_doc_tokens, pct_major,
    dup_doc_rate`` where dup_doc_rate = fraction of the source's docs
    whose normalized fingerprint occurs ≥ 2 times CORPUS-wide (dup
    involvement measures cross-source boilerplate too, not just
    within-source copies)."""
    from airbnb_pyspark_jobs_spark.functions.text import fingerprint, tokens

    staged = docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("__lang"),
        fingerprint(F.col(text_col)).alias("__f"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("__n_tok"),
    )
    fc = staged.groupBy("__f").agg(F.count(F.lit(1)).alias("__c"))
    base = staged.join(fc, "__f").select(
        "source",
        "__n_tok",
        (F.col("__lang") == major_lang).cast("int").alias("__is_major"),
        (F.col("__c") >= 2).cast("int").alias("__dup"),
    )
    n = F.count(F.lit(1))
    return base.groupBy("source").agg(
        n.cast("bigint").alias("n_docs"),
        F.sum("__n_tok").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum("__n_tok").cast("double") / n.cast("double"), 2
        ).alias("avg_doc_tokens"),
        F.round(
            F.sum("__is_major").cast("double") / n.cast("double"), 4
        ).alias("pct_major"),
        F.round(
            F.sum("__dup").cast("double") / n.cast("double"), 4
        ).alias("dup_doc_rate"),
    )


def source_kl_divergence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    ln_digits: int = 6,
    term_digits: int = 12,
    out_digits: int = 6,
) -> DataFrame:
    """Per-source vocabulary drift: KL(P_source ‖ P_corpus) over the
    unigram distributions — the data-mixing diagnostic that says WHICH
    source's language diverges from the pool (high KL = niche
    vocabulary; near 0 = redundant with the mix). Pairs with the q158
    mixture weights: excess loss says how hard a source is, KL says how
    different it is.

    Determinism recipe (the q96/q151 discipline): the per-term log
    ratio ``ln(p_s/p_g)`` is computed as one double expression with a
    FIXED operand order — ``(c_st·n)/(n_s·c_t)`` with every count cast
    to double BEFORE multiplying (the products overflow int64 at corpus
    scale) — rounded to ``ln_digits``; each term's contribution
    ``p_s·lnr`` is rounded to ``term_digits`` and summed as DECIMAL
    (order-independent), then ONE final round. Scale: two token-scale
    groupBys (source×term, term); everything joined back is vocab- or
    sources-sized (broadcast).

    Returns ``source, n_tokens, n_terms, kl_divergence``.
    """
    from airbnb_pyspark_jobs_spark.functions.text import tokens

    toks = docs.select(
        F.col(source_col).alias("source"), F.explode(tokens(text_col)).alias("t")
    ).select("source", F.lower("t").alias("term"))
    st = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("__cst"))
    s_tot = st.groupBy("source").agg(F.sum("__cst").cast("bigint").alias("__ns"))
    g = st.groupBy("term").agg(F.sum("__cst").cast("bigint").alias("__ct"))
    n = g.agg(F.sum("__ct").cast("bigint").alias("__n"))
    joined = (
        st.join(F.broadcast(s_tot), "source")
        .join(F.broadcast(g), "term")
        .crossJoin(F.broadcast(n))
    )
    lnr = F.round(
        F.log(
            (F.col("__cst").cast("double") * F.col("__n").cast("double"))
            / (F.col("__ns").cast("double") * F.col("__ct").cast("double"))
        ),
        ln_digits,
    )
    contrib = F.round(
        (F.col("__cst").cast("double") / F.col("__ns").cast("double")) * lnr,
        term_digits,
    ).cast(f"decimal(32,{term_digits})")
    return (
        joined.select("source", "__ns", contrib.alias("__kt"))
        .groupBy("source")
        .agg(
            F.max("__ns").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.round(F.sum("__kt").cast("double"), out_digits).alias(
                "kl_divergence"
            ),
        )
        .select("source", "n_tokens", "n_terms", "kl_divergence")
    )


def kneser_ney_bigram_scores(
    docs: DataFrame,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    lp_digits: int = 6,
    score_digits: int = 6,
) -> DataFrame:
    """Per-document mean log-probability under an absolute-discount
    Kneser-Ney bigram LM trained on the corpus itself — the standard
    smoothed-LM quality signal (KenLM-style perplexity filtering, as
    in CCNet) one rung above q117's Jelinek-Mercer mixture: the
    backoff distribution is the CONTINUATION probability ``P_cont(w)
    = N1+(·w)/N1+(··)`` (how many contexts a word follows), not the
    raw unigram — so function words that appear often in one context
    stop dominating the backoff.

    ``P(w|u) = max(c(uw)−D, 0)/c(u·) + D·N1+(u·)/c(u·) · P_cont(w)``,
    scored over the training corpus (every scored bigram has c ≥ 1,
    so no zero-probability path; a doc's FIRST token scores
    ``P_cont(w)`` directly). All counts are exact integers;
    cross-engine determinism follows q117: the probability is one
    fixed double-op order, ``ln`` rounded to ``lp_digits`` and cast
    DECIMAL so per-doc sums are order-independent; the rounded mean
    is :func:`exact_mean_round` (pure-integer round-half-away — the
    double-division round flipped at sf0.01's -3.6420435 boundary).

    Returns ``doc_id, n_tokens, kn_logprob``. Scale: pairs from
    arrays_zip (no window); bigram counts are the one corpus-scale
    groupBy; context/continuation tables are vocab-sized
    (broadcast, the DSIR weight-table pattern); the scoring join on
    (prev, term) is left to AQE.
    """
    from airbnb_pyspark_jobs_spark.caching import owned_persist
    from airbnb_pyspark_jobs_spark.functions.text import tokens

    base = owned_persist(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.transform(tokens(text_col), lambda x: F.lower(x)).alias("__tk"),
        )
    )
    shifted = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(F.col("__tk"), 1, F.greatest(F.size("__tk") - 1, F.lit(0))),
    )
    pairs = base.select(
        "doc_id",
        F.explode(
            F.arrays_zip(F.col("__tk").alias("term"), shifted.alias("prev"))
        ).alias("__e"),
    ).select("doc_id", F.col("__e.term").alias("term"), F.col("__e.prev").alias("prev"))
    bf = owned_persist(
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "term")
        .agg(F.count(F.lit(1)).alias("__cb"))
    )
    # context totals c(u·) and distinct-continuation counts N1+(u·)
    ctx = bf.groupBy("prev").agg(
        F.sum("__cb").cast("bigint").alias("__cc"),
        F.count(F.lit(1)).cast("bigint").alias("__n1u"),
    )
    # continuation counts N1+(·w) and the bigram-type total N1+(··)
    cont = bf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("__n1w"))
    n1_all = bf.agg(F.count(F.lit(1)).cast("double").alias("__n1all"))
    d_lit = F.lit(float(discount))
    pcont = F.col("__n1w").cast("double") / F.col("__n1all")
    p = F.when(F.col("prev").isNull(), pcont).otherwise(
        F.greatest(F.col("__cb").cast("double") - d_lit, F.lit(0.0))
        / F.col("__cc").cast("double")
        + (d_lit * F.col("__n1u").cast("double") / F.col("__cc").cast("double"))
        * pcont
    )
    scored = (
        pairs.join(F.broadcast(cont), "term")
        .join(bf, ["prev", "term"], "left")
        .join(F.broadcast(ctx), "prev", "left")
        .crossJoin(F.broadcast(n1_all))
        .select(
            "doc_id",
            F.round(F.log(p), lp_digits)
            .cast(f"decimal(28,{lp_digits})")
            .alias("__lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        exact_mean_round(
            F.sum("__lp"), F.count(F.lit(1)), score_digits, sum_scale=lp_digits
        ).alias("kn_logprob"),
    )
