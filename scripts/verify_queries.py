"""Driver-mimic oracle compare for a subset of registry queries.

Usage:
  python scripts/verify_queries.py q141_rfm_segments [q94_...]   # serial
  python scripts/verify_queries.py --workers 4 [names...]        # parallel
  (no names = full registry)

Mirrors `.claude/skills/verify/SKILL.md` §1: runs each `queries()`
entry at sf0.01 next to its `oracle_sql()` in DuckDB, sorts columns by
name and rows by repr, prints MATCH/MISMATCH (one line per query —
`scripts/build_correctness_artifacts.py` parses this format).

Parallel mode (VERDICT r6 #6): the full matrix is embarrassingly
parallel across queries but the @query cache-release protocol is NOT
thread-safe inside one session (query N+1's invocation unpersists
query N's owned caches — racing threads would unpersist LIVE frames),
so sharding uses N subprocesses, each with its own Spark session over
``total_cpus // N`` cores and its own DuckDB connection. Registry
queries perform no writes, so shards cannot collide. Output order is
deterministic: the parent buffers each shard and prints shard 0..N-1.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    import pandas as pd

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


def run_serial(wanted: list[str] | None, lines: list[str] | None = None) -> int:
    import builtins
    import duckdb

    import __spark_entry__ as E
    from airbnb_pyspark_jobs_spark.session import get_spark

    _print = builtins.print

    def print(*a, **kw):  # noqa: A001 - tee result lines for --record
        _print(*a, **kw)
        if lines is not None:
            lines.append(" ".join(str(x) for x in a))

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    qs, os_ = E.queries(), E.oracle_sql()
    wanted = wanted or sorted(qs)
    bad = 0
    for name in wanted:
        if name not in qs:
            print(f"{name}: NOT-IN-REGISTRY", flush=True)
            bad += 1
            continue
        try:
            sdf = qs[name](spark, SF).toPandas()
        except Exception as e:
            print(f"{name}: SPARK-ERR {type(e).__name__}: {e}"[:300], flush=True)
            bad += 1
            continue
        if name not in os_:
            print(f"{name}: NO-ORACLE rows={len(sdf)}", flush=True)
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
            flush=True,
        )
        if not (cols_ok and vals_ok):
            bad += 1
            for i, (s, d) in enumerate(zip(srows, drows)):
                if s != d:
                    print("  first-diff", i, "spark:", s, "oracle:", d)
                    break
    return 1 if bad else 0


def run_parallel(workers: int, wanted: list[str] | None) -> int:
    if wanted is None:
        from airbnb_pyspark_jobs_spark.plans import QUERIES

        wanted = sorted(QUERIES)
    shards = [wanted[i::workers] for i in range(workers)]
    total_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(max(4, total_cpus // workers))
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), *shard],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
            text=True,
        )
        for shard in shards
        if shard
    ]
    rc = 0
    for p in procs:
        out, _ = p.communicate()
        sys.stdout.write(out)
        rc |= p.returncode
    return rc


def record_results(lines: list[str]) -> None:
    """Merge this run's per-query outcomes into the LATEST
    ``docs/correctness_local_r*.json`` (VERDICT r10 #6: q346 reached
    HEAD with zero recorded verification because registration and the
    sweep artifact were separate manual steps —
    ``tests/test_registry_catalog.py::test_every_registered_query_is_swept``
    now fails pytest for any registered-but-unrecorded query, and this
    flag makes recording a one-command step:
    ``python scripts/verify_queries.py --record <new_query>``).

    Only green outcomes are merged (MATCH, or NO-ORACLE for the
    rows-only-by-design queries); a MISMATCH/SPARK-ERR line is NOT
    recorded — the artifact must never claim verification that
    failed. Counts are recomputed from the merged results."""
    import glob
    import json

    from scripts.build_correctness_artifacts import parse as _parse
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
        fh.write("\n".join(l for l in lines if not l.startswith(" ")))
        tmp = fh.name
    parsed = _parse(tmp)
    os.unlink(tmp)
    green = {
        k: v
        for k, v in parsed.items()
        if v.get("hash_match") or v.get("rows_only")
    }
    dropped = sorted(set(parsed) - set(green))
    files = sorted(glob.glob(os.path.join(REPO, "docs", "correctness_local_r*.json")))
    if not files:
        raise SystemExit("--record: no docs/correctness_local_r*.json to update")
    path = files[-1]
    art = json.load(open(path))
    art["results"].update(green)
    res = art["results"]
    art["n_queries"] = len(res)
    art["n_match"] = sum(1 for r in res.values() if r.get("hash_match"))
    art["n_rows_only"] = sum(1 for r in res.values() if r.get("rows_only"))
    art["n_mismatch"] = art["n_queries"] - art["n_match"] - art["n_rows_only"]
    with open(path, "w") as fh:
        json.dump(art, fh, indent=1)
    print(
        f"--record: merged {len(green)} green result(s) into {os.path.basename(path)}"
        + (f"; NOT recorded (non-green): {dropped}" if dropped else "")
    )


def main() -> int:
    args = sys.argv[1:]
    workers = 0
    record = False
    if args and args[0] == "--record":
        record = True
        args = args[1:]
    if args and args[0] == "--workers":
        workers = int(args[1])
        args = args[2:]
    wanted = args or None
    if workers > 1:
        return run_parallel(workers, wanted)
    lines: list[str] | None = [] if record else None
    rc = run_serial(wanted, lines)
    if record:
        record_results(lines)
    return rc


if __name__ == "__main__":
    sys.exit(main())
