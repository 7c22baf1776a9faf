"""Build docs/correctness_multi_sf_r{N}.json (and the sf0.01 local
artifact) from scripts/verify_queries.py sweep outputs.

Usage:
  python scripts/build_correctness_artifacts.py ROUND \
      sf0.001=/tmp/verify_sf0.001.txt sf0.01=... sf0.1=...

Each line of a sweep file is one of:
  <name> cols OK vals MATCH rows=X/Y
  <name> cols OK vals MISMATCH rows=X/Y
  <name>: NO-ORACLE rows=N
  <name>: SPARK-ERR ...
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LINE = re.compile(
    r"^(?P<name>\S+) cols (?P<cols>OK|\S.*?) vals (?P<vals>MATCH|MISMATCH)"
    r" rows=(?P<sr>\d+)/(?P<dr>\d+)$"
)


def parse(path: str) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        m = _LINE.match(line)
        if m:
            out[m["name"]] = {
                "rows_match": m["sr"] == m["dr"],
                "schema_match": m["cols"] == "OK",
                "hash_match": m["vals"] == "MATCH",
                "spark_rows": int(m["sr"]),
                "oracle_rows": int(m["dr"]),
                "err": None,
            }
        elif ": NO-ORACLE" in line:
            name = line.split(":")[0]
            rows = int(line.rsplit("rows=", 1)[1])
            out[name] = {
                "rows_match": None,
                "schema_match": None,
                "hash_match": None,
                "spark_rows": rows,
                "oracle_rows": None,
                "err": None,
                "rows_only": True,
            }
        else:
            name = line.split(":")[0]
            out[name] = {"err": line.split(":", 1)[1].strip()[:200]}
    return out


def main() -> None:
    rnd = int(sys.argv[1])
    sweeps = dict(arg.split("=", 1) for arg in sys.argv[2:])
    summary: dict[str, dict] = {}
    local_results = None
    for sf_label, path in sorted(sweeps.items()):
        res = parse(path)
        match = sum(1 for r in res.values() if r.get("hash_match"))
        rows_only = sum(1 for r in res.values() if r.get("rows_only"))
        other = [
            k
            for k, r in res.items()
            if not r.get("hash_match") and not r.get("rows_only")
        ]
        summary[sf_label.replace("sf", "")] = {
            "n": len(res),
            "match": match,
            "rows_only": rows_only,
            "other": sorted(other),
        }
        if sf_label == "sf0.01":
            local_results = res
    multi = {
        "note": (
            "full-registry driver-mimic oracle compare at three scale "
            "factors (scripts/verify_queries.py --workers 4: process-"
            "sharded, each shard its own Spark session + DuckDB "
            "connection, type-strict norm); q65 is rows-only by design "
            "(Spark-internal DataSketches HLL has no DuckDB twin)"
        ),
        "summary": summary,
    }
    with open(
        os.path.join(REPO, "docs", f"correctness_multi_sf_r{rnd:02d}.json"), "w"
    ) as fh:
        json.dump(multi, fh, indent=1)
    if local_results is not None:
        s = summary["0.01"]
        local = {
            "round": rnd,
            "sf": 0.01,
            "n_queries": s["n"],
            "n_match": s["match"],
            "n_rows_only": s["rows_only"],
            "n_mismatch": len(s["other"]),
            "note": (
                "end-of-session driver-mimic oracle compare (verify skill "
                "recipe, type-strict norm), full registry"
            ),
            "results": local_results,
        }
        with open(
            os.path.join(REPO, "docs", f"correctness_local_r{rnd:02d}.json"), "w"
        ) as fh:
            json.dump(local, fh, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
