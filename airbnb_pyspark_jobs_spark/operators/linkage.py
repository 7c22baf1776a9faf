"""Record linkage / entity resolution: fuzzy string matching at scale.

The naive fuzzy join is O(n²) levenshtein evaluations — the same
scale-killer shape as all-pairs dedup, solved the same way: a cheap
BLOCKING key turns the cross join into per-block equi-joins (cost =
Σ block², the LSH-banding economics), then the exact edit distance
verifies candidates so precision is always 1.0. Recall is bounded by
the blocking key — pairs in different blocks are never compared — which
is the documented, standard ER tradeoff (choose keys like normalized
first token, phonetic code, sorted-token prefix; stack several blocking
passes and union for higher recall).

Everything is built-in JVM expressions (``levenshtein``, string fns) —
no UDFs — and md5-free, so the DuckDB oracle replays it verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    records: DataFrame,
    col: str,
    block: Column | str | None = None,
    max_distance: int = 3,
) -> DataFrame:
    """All pairs of distinct ``col`` values with the same blocking key
    and ``levenshtein <= max_distance``. Returns ``(name_a, name_b,
    lev)`` with ``name_a < name_b``.

    ``block`` defaults to the lowercased first whitespace token — the
    classic name-matching key. Pass any Column for custom keys (soundex,
    zip code, sorted-token prefix); union multiple calls with different
    keys for multi-pass blocking.
    """
    if block is None:
        block_expr = F.lower(F.split(F.col(col), r"\s+").getItem(0))
    else:
        block_expr = F.col(block) if isinstance(block, str) else block
    d = records.select(F.col(col).alias("name"), block_expr.alias("__b")).distinct()
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.__b") == F.col("b.__b"),
                F.col("a.name") < F.col("b.name"),
            ],
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).cast("bigint").alias("lev"),
        )
        .filter(F.col("lev") <= max_distance)
    )
