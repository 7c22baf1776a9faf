"""Dedup-family scaling exponents (VERDICT r4 ask #8).

Runs the four scale-path dedup operators on synthetic corpora of
growing size and fits the per-op growth exponent
``alpha = log(t2/t1) / log(n2/n1)`` between consecutive sizes —
the explicit 100×-scale evidence: alpha ≈ 1 is linear (shuffle-bound),
alpha ≫ 1 flags a super-linear op.

Usage: python scripts/dedup_scaling.py [sizes_csv]   (default 100000,300000,1000000)
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from airbnb_pyspark_jobs_spark.caching import release_owned_caches  # noqa: E402
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


def run(label: str, thunk) -> float:
    t0 = time.perf_counter()
    thunk().write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"  {label}: {wall:.1f}s", flush=True)
    return wall


def main() -> None:
    spark = get_spark(app_name="dedup_scaling", profile="local")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    results: dict[str, dict[int, float]] = {}
    for n in SIZES:
        print(f"== n={n} ==", flush=True)
        docs = corpus(spark, n)
        # q45 banded LSH (build + band join + verify)
        spark.catalog.clearCache(); release_owned_caches()
        results.setdefault("q45_lsh", {})[n] = run(
            "q45 lsh", lambda: DD.minhash_lsh_pairs(docs, num_hashes=8, bands=2)
        )
        # q111 incremental: 10% batch vs 90% stored index. Index build
        # is the amortized one-off — timed run is batch-vs-index only.
        spark.catalog.clearCache(); release_owned_caches()
        cut = int(n * 0.9)
        old = docs.filter(f"doc_id < {cut}")
        new = docs.filter(f"doc_id >= {cut}")
        idx = DD.minhash_band_index(old).localCheckpoint()
        results.setdefault("q111_incremental", {})[n] = run(
            "q111 incremental(10% batch)",
            lambda: DD.incremental_minhash_pairs(new, old, idx),
        )
        # q58 components: pointer jumping over the LSH pair list
        # (pairs precomputed+checkpointed so this times components only)
        spark.catalog.clearCache(); release_owned_caches()
        pairs = DD.minhash_lsh_pairs(docs, num_hashes=8, bands=2).localCheckpoint()
        results.setdefault("q58_components", {})[n] = run(
            "q58 components", lambda: DD.dedup_components(docs, pairs)
        )
        # q107 exact-substring cut
        spark.catalog.clearCache(); release_owned_caches()
        results.setdefault("q107_cut", {})[n] = run(
            "q107 substring cut", lambda: DD.cut_duplicated_spans(docs)
        )
        docs.unpersist()
    print("\n| op | " + " | ".join(f"n={n}" for n in SIZES) + " | exponents |")
    for op, times in results.items():
        ts = [times[n] for n in SIZES]
        exps = [
            round(
                math.log(ts[i + 1] / ts[i]) / math.log(SIZES[i + 1] / SIZES[i]),
                2,
            )
            for i in range(len(SIZES) - 1)
        ]
        print(
            f"| {op} | "
            + " | ".join(f"{t:.1f}s" for t in ts)
            + f" | {exps} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
