"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This mirrors the driver's t2 correctness gate (row-count + schema +
order-insensitive value compare with columns sorted by name) so failures
are caught locally before a round is submitted.
"""

from __future__ import annotations

import pytest

from airbnb_pyspark_jobs_spark.plans import ORACLES, QUERIES
from airbnb_pyspark_jobs_spark.plans.queries import QUERY_FAMILIES
from tests.conftest import SF_DIR, assert_matches_oracle


def _family_params(names):
    """Parametrize with family markers so `pytest -m dedup` (etc.)
    selects one family instead of the full ~18-min matrix."""
    return [
        pytest.param(
            n,
            marks=[
                getattr(pytest.mark, fam)
                for fam in sorted(QUERY_FAMILIES.get(n, ()))
            ],
        )
        for n in sorted(names)
    ]


@pytest.mark.parametrize("name", _family_params(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", _family_params(set(QUERIES) - set(ORACLES)))
def test_query_without_oracle_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
