"""Physical join-strategy A/B: the same logical join under BROADCAST /
MERGE (sort-merge) / SHUFFLE_HASH hints plus AQE auto, timed and
value-checked against each other. Records WHY the engine's default is
(or isn't) the right call at each dim size — evidence for the
SCALE_NOTES join-strategy table.

Usage: python scripts/join_strategies.py  (SPARK_GRAFT_SF_DIR honors
the bench convention; local[32] from the shared session helper).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from airbnb_pyspark_jobs_spark.session import get_spark  # noqa: E402
from airbnb_pyspark_jobs_spark.sources.registry import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HINTS = ["BROADCAST", "MERGE", "SHUFFLE_HASH"]


def shape(spark, dim_name, dim_key, fact_key, amplify=1, aqe=True):
    fact = load_table(spark, "lineitem", SF_DIR)
    if amplify > 1:
        # synthetic fan-out: replicate the fact rows (distinct keys kept)
        fact = fact.crossJoin(
            spark.range(amplify).select(F.col("id").alias("__rep"))
        ).drop("__rep")
    dim = load_table(spark, dim_name, SF_DIR)
    spark.conf.set("spark.sql.adaptive.enabled", "true" if aqe else "false")
    out = {}
    for hint in HINTS + ["auto"]:
        d = dim if hint == "auto" else dim.hint(hint)
        j = (
            fact.join(d, fact[fact_key] == d[dim_key])
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                    "cents"
                ),
            )
        )
        times = []
        rows = None
        for _ in range(2):
            t0 = time.time()
            rows = sorted(map(tuple, j.collect()))
            times.append(round(time.time() - t0, 3))
        # read the plan AFTER execution: with AQE on, the final adaptive
        # plan can differ from the hinted initial plan (SMJ -> BHJ)
        plan = j._jdf.queryExecution().executedPlan().toString()
        phys = (
            "BroadcastHashJoin"
            if "BroadcastHashJoin" in plan
            else "ShuffledHashJoin"
            if "ShuffledHashJoin" in plan
            else "SortMergeJoin"
            if "SortMergeJoin" in plan
            else "?"
        )
        out[hint] = {"physical": phys, "sec_min": min(times), "rows": rows}
    checks = {k: v["rows"] for k, v in out.items()}
    base = next(iter(checks.values()))
    assert all(v == base for v in checks.values()), "strategy changed VALUES"
    return {k: {"physical": v["physical"], "sec_min": v["sec_min"]} for k, v in out.items()}


def main():
    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    report = {
        "sf_dir": SF_DIR,
        "lineitem_x_orders(150k dim)": shape(spark, "orders", "o_orderkey", "l_orderkey"),
        "lineitem_x_part(20k dim)": shape(spark, "part", "p_partkey", "l_partkey"),
        "lineitem_x_supplier(1k dim)": shape(
            spark, "supplier", "s_suppkey", "l_suppkey"
        ),
        "8x_lineitem_x_orders(150k dim)": shape(
            spark, "orders", "o_orderkey", "l_orderkey", amplify=8
        ),
        "8x_lineitem_x_part(20k dim)": shape(
            spark, "part", "p_partkey", "l_partkey", amplify=8
        ),
        "8x_orders_AQE_OFF": shape(
            spark, "orders", "o_orderkey", "l_orderkey", amplify=8, aqe=False
        ),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
