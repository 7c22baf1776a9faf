"""Scaling exponents for the round-5 corpus ops (q196 novelty shape).

Same method as scripts/dedup_scaling.py: synthetic Zipfian corpora at
growing sizes, fit alpha = log(t2/t1)/log(n2/n1) between consecutive
sizes. The novelty pipeline is the shingle df groupBy + the min-doc
attribution aggregate — expected shuffle-bound alpha ~= 1.

Usage: python scripts/novelty_scaling.py [sizes_csv]  (default 100000,300000,1000000)
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

from airbnb_pyspark_jobs_spark.caching import (  # noqa: E402
    owned_persist,
    release_owned_caches,
)
from airbnb_pyspark_jobs_spark.functions.numeric import exact_mean_round  # noqa: E402
from airbnb_pyspark_jobs_spark.operators import dedupe as DD  # noqa: E402
from airbnb_pyspark_jobs_spark.session import get_spark  # noqa: E402
from airbnb_pyspark_jobs_spark.sources.synthetic import register  # noqa: E402

SIZES = (
    [int(x) for x in sys.argv[1].split(",")]
    if len(sys.argv) > 1
    else [100_000, 300_000, 1_000_000]
)


def corpus(spark, n: int):
    return (
        spark.read.format("synthetic_docs")
        .option("n", n)
        .option("partitions", 32)
        .option("dup_every", 10)
        .option("vocab_size", 5000)
        .option("zipf_s", 1.1)
        .load()
        .localCheckpoint()
    )


def novelty(docs):
    sh = owned_persist(DD.shingle_table(docs, "doc_id", "text", 3))
    tot = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    nov = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("__d"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("__d") == 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_novel"))
    )
    return tot.join(nov, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        exact_mean_round(
            F.coalesce("n_novel", F.lit(0)).cast("decimal(18,6)"),
            F.col("n_shingles"),
            6,
        ).alias("novelty"),
    )


def main() -> None:
    spark = get_spark(app_name="novelty_scaling", profile="local")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    walls: dict[int, float] = {}
    for n in SIZES:
        docs = corpus(spark, n)
        t0 = time.perf_counter()
        novelty(docs).write.format("noop").mode("overwrite").save()
        walls[n] = time.perf_counter() - t0
        release_owned_caches()
        print(f"n={n}: {walls[n]:.1f}s", flush=True)
    pairs = list(zip(SIZES, SIZES[1:]))
    for a, b in pairs:
        alpha = math.log(walls[b] / walls[a]) / math.log(b / a)
        print(f"alpha {a}->{b}: {alpha:.2f}", flush=True)


if __name__ == "__main__":
    main()
