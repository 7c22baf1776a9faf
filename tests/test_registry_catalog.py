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
