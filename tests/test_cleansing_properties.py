"""Property-based cleansing tests (SURVEY §5.4): totality and round-trip
invariants of the conformance operators, via Hypothesis.

One Spark job per property (the generated cases are batched into a
single DataFrame) — property testing against a cluster engine must not
launch a job per example.
"""

from __future__ import annotations

import decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.functions.cleansing import (
    clamp_non_negative,
    clean_money,
    coerce_boolean,
)

# money strings like "$1,234.56", "1234.5", "$0.07"
_money_values = st.decimals(
    min_value=0, max_value=99_999_999, places=2, allow_nan=False, allow_infinity=False
)


@settings(max_examples=10, deadline=None)
@given(st.lists(_money_values, min_size=1, max_size=200))
def test_clean_money_round_trip(spark, values):
    """Any $-and-comma formatting of a 2-decimal amount parses back."""
    formatted = []
    for i, v in enumerate(values):
        s = f"{v:,.2f}"
        formatted.append((i, f"${s}" if i % 2 == 0 else s))
    df = spark.createDataFrame(formatted, "i int, raw string")
    out = {r.i: r.parsed for r in df.select("i", clean_money("raw").alias("parsed")).collect()}
    for i, v in enumerate(values):
        assert out[i] == decimal.Decimal(v).quantize(decimal.Decimal("0.01"))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1)),
        min_size=1,
        max_size=300,
    )
)
def test_clamp_total_and_idempotent(spark, values):
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "i int, x int")
    once = clamp_non_negative(df, ["x"])
    twice = clamp_non_negative(once, ["x"])
    got = {r.i: r.x for r in twice.collect()}
    for i, v in enumerate(values):
        expect = None if v is None else max(v, 0)
        assert got[i] == expect


@settings(max_examples=10, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=8)), min_size=1, max_size=300))
def test_coerce_boolean_total(spark, values):
    """Every string (any unicode, any case) maps to a non-null bool under
    the default policy; only t/true (case-insensitive) map to True."""
    rows = [(i, v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "i int, s string")
    got = {r.i: r.b for r in df.select("i", coerce_boolean("s").alias("b")).collect()}
    for i, v in enumerate(values):
        assert got[i] is (v is not None and v.lower() in ("t", "true"))
