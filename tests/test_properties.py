"""Hypothesis property tests for the session's invariant-heavy
operators: bloom semi-join exactness and CDC chunk reassembly must
hold for ARBITRARY inputs, not just the corpus shapes."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from airbnb_pyspark_jobs_spark.operators.bloom import bloom_semi_join
from airbnb_pyspark_jobs_spark.operators.corpus import cdc_chunks

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    fact_keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    dim_keys=st.lists(st.integers(-1000, 1000), max_size=30),
    num_bits=st.sampled_from([64, 512, 1 << 12]),
)
@_slow
def test_bloom_semi_join_always_exact(spark, fact_keys, dim_keys, num_bits):
    fact = spark.createDataFrame([(k,) for k in fact_keys], "k long")
    dim = spark.createDataFrame([(k,) for k in dim_keys], "dk long") if dim_keys else None
    if dim is None:
        return
    got = sorted(
        r.k for r in bloom_semi_join(fact, dim, "k", "dk", num_bits=num_bits, num_hashes=3).collect()
    )
    want = sorted(k for k in fact_keys if k in set(dim_keys))
    assert got == want


@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        min_size=1,
        max_size=300,
    ),
    divisor=st.sampled_from([16, 64]),
)
@_slow
def test_cdc_chunks_reassemble_losslessly(spark, text, divisor):
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.chunk_idx, r.chunk_text, r.n_chars)
        for r in cdc_chunks(docs, k=4, divisor=divisor).collect()
    )
    assert [i for i, _t, _n in rows] == list(range(len(rows)))  # dense idxs
    assert "".join(t for _i, t, _n in rows) == text  # lossless, in order
    assert all(n == len(t) for _i, t, n in rows)
