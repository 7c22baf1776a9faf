"""Python UDF surfaces beyond scalar Pandas UDFs: user-defined TABLE
functions (UDTF) and grouped-aggregate Pandas UDFs (vectorized UDAF).

Policy (SCALE_NOTES / CLAUDE.md): built-in JVM expressions first,
Arrow-batched Pandas UDFs where Python is genuinely needed, row-python
never on the hot path. These two exist for the cases the built-ins
can't express:

- UDTF — one input row → VARIABLE number of typed output rows where
  the expansion logic needs Python (stateful regex scanning with
  offsets here; tokenizers/parsers in general). The JVM alternative
  (explode over regexp_extract_all) loses match positions.
- grouped-agg Pandas UDF — a per-group scalar whose math wants NumPy
  (iterative/linear-algebra aggregations). The example below IS
  expressible with built-ins and the unit test asserts equality with
  that exact built-in form — the point is the API contract, and that
  custom UDAF logic slots in without changing the groupBy plan shape
  (one shuffle, Arrow-batched transfer).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.functions.text import (
    EMAIL_PATTERN,
    IPV4_PATTERN,
    PHONE_PATTERN,
)

_SPAN_RULES = (
    ("email", EMAIL_PATTERN),
    ("ip", IPV4_PATTERN),
    ("phone", PHONE_PATTERN),
)


@F.udtf(returnType="span_type string, start int, end int, excerpt string")
class PiiSpansUDTF:
    """Table function: one document in → one row per PII match with its
    character offsets — the span-level detail `text.pii_counts` (scalar
    counts) and `redact_pii` (replacement) can't return. Patterns are
    the SAME lookaround-free regexes the JVM/oracle paths use; earlier
    rule wins overlapping spans (email before ip before phone),
    mirroring `redact_pii`'s replacement order.
    """

    def eval(self, text: str):  # noqa: D102 — contract defined by Spark
        if text is None:
            return
        taken: list[tuple[int, int]] = []
        for span_type, pattern in _SPAN_RULES:
            for m in re.finditer(pattern, text):
                s, e = m.span()
                if any(s < te and ts < e for ts, te in taken):
                    continue
                taken.append((s, e))
                yield span_type, s, e, m.group(0)


@F.pandas_udf("double")
def weighted_mean_udaf(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-aggregate Pandas UDF: Σ(v·w)/Σ(w) per group, NumPy-
    vectorized over Arrow batches. Equals the built-in
    ``sum(v*w)/sum(w)`` (asserted in tests); swap the body for math
    that built-ins can't express and the plan shape doesn't change."""
    denom = weights.sum()
    return float((values * weights).sum() / denom) if denom else None
