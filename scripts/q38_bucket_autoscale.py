"""q38 digest-bucket auto-scaling evidence (VERDICT r6 "Next round" #1).

Plants a stopword-grade term (df = n) at growing corpus sizes and
measures the WORST level-1 digest buffer (max doc-ids in one (term,
bucket) group) under the derived ``B = max(64, ceil(n / target))``
versus the old fixed B=64. With the derived B the worst buffer stays
FLAT at ~target ids while the fixed-B buffer grows linearly with the
corpus — the absolute bound the round-6 verdict asked for. Uses
target_ids_per_bucket=1000 so the derivation actually engages at
measurable sizes (the production default 100k engages at 6.4M docs).

Usage: python scripts/q38_bucket_autoscale.py  (results -> SCALE_NOTES)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from airbnb_pyspark_jobs_spark.caching import release_owned_caches  # noqa: E402
from airbnb_pyspark_jobs_spark.operators.corpus import (  # noqa: E402
    derive_digest_buckets,
    vocabulary,
)
from airbnb_pyspark_jobs_spark.session import get_spark  # noqa: E402
from airbnb_pyspark_jobs_spark.sources.synthetic import register  # noqa: E402
from scripts.heavy_family_scaling import hot_corpus  # noqa: E402

SIZES = [100_000, 300_000, 1_000_000]
TARGET = 1000


def worst_bucket(docs, buckets: int) -> int:
    """Max doc-ids landing in ONE (term, bucket) level-1 group for the
    planted hot term — the buffer the tree digest bounds."""
    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int, tokens

    rows = (
        docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.pmod(portable_hash_int(F.col("doc_id").cast("string")), F.lit(buckets)).alias("__b"),
            F.explode(tokens("text")).alias("t"),
        )
        .filter(F.lower("t") == "hotly")
        .groupBy("__b")
        .agg(F.countDistinct("doc_id").alias("c"))
        .agg(F.max("c").alias("m"))
        .first()
    )
    return int(rows.m)


def main() -> None:
    spark = get_spark(app_name="q38_bucket_autoscale", profile="local")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    print("| n docs | derived B | worst buffer (derived) | worst buffer (fixed 64) | build s |")
    for n in SIZES:
        spark.catalog.clearCache()
        release_owned_caches()
        docs = hot_corpus(spark, n)
        b = derive_digest_buckets(n, TARGET)
        t0 = time.perf_counter()
        vocabulary(docs, target_ids_per_bucket=TARGET).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        wb = worst_bucket(docs, b)
        wb64 = worst_bucket(docs, 64)
        print(f"| {n} | {b} | {wb} | {wb64} | {dt:.1f} |", flush=True)
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
