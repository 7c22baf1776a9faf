"""Composed streaming corpus-ingest pipeline: dedup-on-ingest →
quality gate → incremental PSI drift partials → shard assignment, all
inside ONE foreachBatch (VERDICT r6 #5 — the streaming twins are each
parity-tested in isolation; this composes them end to end).

Per micro-batch:

1. **Dedup-on-ingest** (:func:`streaming.dedupe.dedup_batch`): the
   batch is banded and joined against the PERSISTED MinHash band index
   of everything accepted so far; survivors extend
   ``{warehouse}/accepted|index|dups`` exactly as the standalone
   dedup stream does.
2. **Quality gate**: Gopher-style :func:`operators.corpus.quality_filter`
   over the batch's SURVIVORS only — a pure function of each doc, so
   per-batch gating composes to the batch gate over the final corpus.
   Gated docs land in ``{warehouse}/gated/batch_id=N``.
3. **Incremental PSI**: the gated docs' token counts feed
   :func:`streaming.aggregates.psi_bucket_counts` against FROZEN
   reference edges — mergeable per-batch partial histograms under
   ``{warehouse}/psi/batch_id=N`` (read side:
   :func:`streaming.aggregates.read_psi_drift`).
4. **Shard assignment**: :func:`operators.sampling.hash_split` over the
   gated survivors — membership depends only on (doc_id, seed), so
   per-batch assignment equals batch assignment over the union.
   Rows land in ``{warehouse}/shards/batch_id=N``.

Replay semantics are the dedup stream's: every write overwrites its own
``batch_id=N`` partition dir and every stage is a pure function of
(committed history, batch content) — a batch replayed after a
mid-PIPELINE crash (e.g. gated written, shards not) recomputes
identical survivors from the pruned state reads and rewrites the same
paths. Exactly-once state on plain parquet, end to end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.corpus import quality_filter
from airbnb_pyspark_jobs_spark.operators.sampling import hash_split
from airbnb_pyspark_jobs_spark.streaming.aggregates import psi_bucket_counts
from airbnb_pyspark_jobs_spark.streaming.dedupe import dedup_batch

_DEFAULT_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def streaming_corpus_pipeline(
    doc_stream: DataFrame,
    warehouse: str,
    checkpoint: str,
    psi_mn_cents: int,
    psi_ext_cents: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    threshold: float = 0.5,
    min_tokens: int = 5,
    n_buckets: int = 10,
    split_fractions: dict[str, float] | None = None,
    split_seed: str = "pipeline",
):
    """Start the composed ingest pipeline; returns the StreamingQuery.

    ``psi_mn_cents`` / ``psi_ext_cents`` are the FROZEN reference
    histogram edges (min·100 and extent·100 of the profiled token-count
    distribution) — captured once at profiling time, like q251's
    reference window.
    """
    fractions = split_fractions or dict(_DEFAULT_SPLITS)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from airbnb_pyspark_jobs_spark.caching import release_owned_caches

        accepted = dedup_batch(
            batch_df,
            warehouse,
            batch_id,
            id_col=id_col,
            text_col=text_col,
            n=n,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
        )
        if accepted is None:
            return
        part = f"batch_id={batch_id}"
        gated = (
            accepted.join(
                quality_filter(accepted, min_tokens=min_tokens)
                .filter(F.col("keep"))
                .select("doc_id"),
                "doc_id",
                "left_semi",
            )
            .localCheckpoint()  # three consumers below
        )
        gated.write.mode("overwrite").parquet(
            os.path.join(warehouse, "gated", part)
        )
        from airbnb_pyspark_jobs_spark.functions.text import token_count

        vals = gated.select(
            F.lit("doc_tokens").alias("event_type"),
            token_count("text").cast("double").alias("value"),
        )
        psi_bucket_counts(
            vals, psi_mn_cents, psi_ext_cents, n_buckets
        ).write.mode("overwrite").parquet(os.path.join(warehouse, "psi", part))
        hash_split(
            gated.select("doc_id"), "doc_id", fractions, seed=split_seed
        ).write.mode("overwrite").parquet(os.path.join(warehouse, "shards", part))
        release_owned_caches()

    return (
        doc_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
