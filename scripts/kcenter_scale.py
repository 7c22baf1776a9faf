"""k-center scaling sweep: run kcenter_coreset over synthetic in-plan
embeddings at growing n, fit the growth exponent (expected ~1.0 —
each of the k-1 rounds is one narrow scan + TakeOrdered(1)).

Synthetic vectors: dim d component of row i =
(xxhash64(i, d) % 1000) / 1000 - 0.5 — JVM-side generation, no data
files needed. Usage: python scripts/kcenter_scale.py [n1 n2 ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from airbnb_pyspark_jobs_spark.operators.similarity import kcenter_coreset  # noqa: E402
from airbnb_pyspark_jobs_spark.session import get_spark  # noqa: E402

DIMS = 16
K = 8


def synth_vectors(spark, n: int):
    df = spark.range(n).select(F.col("id").alias("vec_id"))
    comps = [
        (
            (F.xxhash64(F.col("vec_id"), F.lit(d)) % 1000).cast("double") / 1000.0
            - 0.5
        )
        for d in range(DIMS)
    ]
    return df.select("vec_id", F.array(*comps).alias("embedding"))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [5_000, 50_000, 500_000]
    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in sizes:
        emb = synth_vectors(spark, n)
        t0 = time.monotonic()
        out = kcenter_coreset(emb, k=K)
        cnt = out.count()
        dt = time.monotonic() - t0
        rows.append({"n": n, "k": K, "rows": cnt, "sec": round(dt, 2)})
        print(json.dumps(rows[-1]))
    for a, b in zip(rows, rows[1:]):
        if a["sec"] <= 0 or b["sec"] <= 0:
            print(f"alpha {a['n']}->{b['n']}: n/a (sub-10ms timing)")
            continue
        alpha = math.log(b["sec"] / a["sec"]) / math.log(b["n"] / a["n"])
        print(
            f"alpha {a['n']}->{b['n']}: {alpha:.2f}"
        )


if __name__ == "__main__":
    main()
