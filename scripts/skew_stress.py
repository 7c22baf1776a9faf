"""Skew stress for the dedup self-joins (VERDICT r4 ask #6).

The LSH band join (q45 shape) and the prefix-filter join (q127 shape)
hash-partition on band/shingle keys; a Zipfian corpus (`zipf_s`) skews
those keys. This script runs both operators on a synthetic Zipf corpus
and reports PER-STAGE task-time quantiles from the Spark REST API —
the straggler evidence the SCALE_NOTES table wants.

Usage: python scripts/skew_stress.py [n_docs] [zipf_s]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from airbnb_pyspark_jobs_spark.caching import release_owned_caches  # noqa: E402
from airbnb_pyspark_jobs_spark.operators import dedupe as DD  # noqa: E402
from airbnb_pyspark_jobs_spark.session import get_spark  # noqa: E402
from airbnb_pyspark_jobs_spark.sources.synthetic import register  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
ZIPF_S = float(sys.argv[2]) if len(sys.argv) > 2 else 1.1
QUANTILES = "0.5,0.95,0.99"


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def _completed_stage_ids(spark) -> set[int]:
    try:
        return {s["stageId"] for s in _api(spark, "/stages?status=complete")}
    except Exception:
        return set()


def _report_stages(spark, before: set[int], label: str) -> None:
    stages = [
        s
        for s in _api(spark, "/stages?status=complete")
        if s["stageId"] not in before
    ]
    rows = []
    for s in stages:
        sid, att = s["stageId"], s["attemptId"]
        try:
            summ = _api(
                spark, f"/stages/{sid}/{att}/taskSummary?quantiles={QUANTILES}"
            )
        except Exception:
            continue
        run = [v / 1000.0 for v in summ["executorRunTime"]]
        rows.append(
            {
                "stage": sid,
                "tasks": s["numCompleteTasks"],
                "p50": round(run[0], 3),
                "p95": round(run[1], 3),
                "p99": round(run[2], 3),
                "shuffle_read_mb": round(
                    s.get("shuffleReadBytes", 0) / 2**20, 1
                ),
                "name": s["name"].split("\n")[0][:60],
            }
        )
    rows.sort(key=lambda r: -r["p99"])
    print(f"== {label}: top stages by p99 task time ==")
    for r in rows[:8]:
        straggle = (r["p99"] / r["p50"]) if r["p50"] > 0 else float("inf")
        flag = "  <-- STRAGGLER" if r["p99"] > 1.0 and straggle > 5 else ""
        print(
            f"  stage {r['stage']:4d} tasks={r['tasks']:4d} "
            f"p50={r['p50']:7.3f}s p95={r['p95']:7.3f}s p99={r['p99']:7.3f}s "
            f"shufRd={r['shuffle_read_mb']:8.1f}MB {r['name']}{flag}"
        )


def main() -> None:
    spark = get_spark(app_name="skew_stress", profile="local")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)
    corpus = (
        spark.read.format("synthetic_docs")
        .option("n", N_DOCS)
        .option("partitions", 32)
        .option("dup_every", 10)
        .option("vocab_size", 5000)
        .option("zipf_s", ZIPF_S)
        .load()
        .localCheckpoint()  # measure the joins, not doc generation
    )
    print(f"corpus: n={N_DOCS} zipf_s={ZIPF_S} vocab=5000 dup_every=10")
    for label, fn in [
        (
            "q45 minhash_lsh_pairs",
            lambda: DD.minhash_lsh_pairs(corpus, num_hashes=8, bands=2),
        ),
        (
            "q127 prefix_filter_jaccard_pairs",
            lambda: DD.prefix_filter_jaccard_pairs(
                corpus, threshold_num=1, threshold_den=2
            ),
        ),
    ]:
        spark.catalog.clearCache()
        release_owned_caches()
        before = _completed_stage_ids(spark)
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        print(f"{label}: wall {wall:.2f}s")
        _report_stages(spark, before, label)
    spark.stop()


if __name__ == "__main__":
    main()
