"""docs/REGISTRY.md must stay current with the @query registry —
regenerate-and-diff (VERDICT r6 #7: the hand-maintained SURVEY §2.11
table drifted; this catalog cannot)."""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_catalog_is_current():
    from scripts.gen_registry_catalog import build

    with open(os.path.join(REPO, "docs", "REGISTRY.md")) as fh:
        checked_in = fh.read()
    assert checked_in == build(), (
        "docs/REGISTRY.md is stale — run `python scripts/gen_registry_catalog.py`"
    )


def test_registry_catalog_covers_every_query():
    from airbnb_pyspark_jobs_spark.plans import QUERIES

    with open(os.path.join(REPO, "docs", "REGISTRY.md")) as fh:
        text = fh.read()
    for name in QUERIES:
        assert f"| {name} |" in text, name


def test_every_registered_query_is_swept():
    """VERDICT r10 #6: q346 reached HEAD with zero recorded
    verification because registration and the sweep artifacts were
    separate manual steps. Every name in the @query registry must
    appear GREEN (hash-matched, or rows-only-by-design) in the latest
    docs/correctness_local_r*.json — so an unswept or failing query
    fails pytest locally before it ships. Record a new query with
    `python scripts/verify_queries.py --record <name>` (only green
    outcomes merge; a MISMATCH/SPARK-ERR is never recorded)."""
    import glob
    import json

    from airbnb_pyspark_jobs_spark.plans import QUERIES

    files = sorted(glob.glob(os.path.join(REPO, "docs", "correctness_local_r*.json")))
    assert files, "no correctness_local artifact — run the verify skill sweep"
    art = json.load(open(files[-1]))
    results = art["results"]
    unswept = sorted(set(QUERIES) - set(results))
    assert not unswept, (
        f"registered but never recorded in {os.path.basename(files[-1])}: "
        f"{unswept} — run `python scripts/verify_queries.py --record "
        f"{' '.join(unswept)}`"
    )
    not_green = sorted(
        n
        for n in QUERIES
        if not (results[n].get("hash_match") or results[n].get("rows_only"))
    )
    assert not not_green, (
        f"recorded but not green in {os.path.basename(files[-1])}: {not_green}"
    )
