"""Vector math over array columns — JVM-side, no UDFs.

``F.zip_with`` + ``F.aggregate`` fold in array-index order with a double
accumulator, which matches an in-order SQL summation — the basis for the
cross-engine-reproducible similarity oracles. Elements are cast to
double FIRST so both engines accumulate in float64.

Scale: these run inside whole-stage codegen per row; for very wide
vectors (>4k dims) a vectorized Pandas UDF over Arrow batches becomes
competitive — provided as ``cosine_pandas`` in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sum over zip_with products, folded in index order (float64)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
