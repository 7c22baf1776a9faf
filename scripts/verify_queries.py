"""Driver-mimic oracle compare for a subset of registry queries.

Usage: ``python scripts/verify_queries.py q141_rfm_segments [q94_...]``
(no args = full registry). Mirrors `.claude/skills/verify/SKILL.md` §1:
runs each `queries()` entry at sf0.01 next to its `oracle_sql()` in
DuckDB, sorts columns by name and rows by repr, prints MATCH/MISMATCH.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402
from airbnb_pyspark_jobs_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (pd.Timestamp, dt.datetime, dt.date)):
        return v.isoformat()
    # type-STRICT numbers: the driver hashes values, so int 5 != float
    # 5.0 there — python tuple equality would silently pass it here
    # (q260 shipped a BIGINT-vs-DOUBLE oracle mismatch that only the
    # strict pytest harness caught).
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int,)):
        return ("i", v)
    if isinstance(v, float):
        return ("f", v)
    return v


def main() -> int:
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    qs, os_ = E.queries(), E.oracle_sql()
    wanted = sys.argv[1:] or sorted(qs)
    bad = 0
    for name in wanted:
        if name not in qs:
            print(f"{name}: NOT-IN-REGISTRY")
            bad += 1
            continue
        try:
            sdf = qs[name](spark, SF).toPandas()
        except Exception as e:
            print(f"{name}: SPARK-ERR {type(e).__name__}: {e}"[:300])
            bad += 1
            continue
        if name not in os_:
            print(f"{name}: NO-ORACLE rows={len(sdf)}")
            continue
        ddf = con.execute(os_[name]).fetchdf()
        sc, dc = sorted(sdf.columns), sorted(ddf.columns)
        srows = sorted(
            [tuple(norm(v) for v in r) for r in sdf[sc].itertuples(index=False)],
            key=repr,
        )
        drows = sorted(
            [tuple(norm(v) for v in r) for r in ddf[dc].itertuples(index=False)],
            key=repr,
        )
        cols_ok = sc == dc
        vals_ok = srows == drows
        print(
            name,
            "cols", "OK" if cols_ok else (sc, dc),
            "vals", "MATCH" if vals_ok else "MISMATCH",
            f"rows={len(srows)}/{len(drows)}",
        )
        if not (cols_ok and vals_ok):
            bad += 1
            for i, (s, d) in enumerate(zip(srows, drows)):
                if s != d:
                    print("  first-diff", i, "spark:", s, "oracle:", d)
                    break
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
