"""Bloom-filter runtime pruning for semi-joins against medium dimensions.

The scale problem: a 100 TB fact semi-joined to a dim whose distinct
keys are too many to broadcast EXACTLY (a broadcast hash join needs the
full key set in memory) still pays a full shuffle of every fact row —
including the vast majority that match nothing. The standard fix (what
Spark's own AQE runtime filters and Parquet bloom filters do under the
hood) is a Bloom filter of the dim keys pushed to the fact scan: a
1M-bit bloom is 128 KiB regardless of key count, so it broadcasts for
free, and fact rows failing `might_contain` never enter the shuffle.

This module makes that pattern an explicit, composable operator:

1. build — hash every dim key to ``num_hashes`` bit positions JVM-side
   (`xxhash64(i, key) mod num_bits`), explode + distinct (the only
   shuffle, bounded by ``num_bits`` rows), collect the distinct
   positions into a packed numpy bitset. The collect is a bounded
   planning action: ≤ num_bits positions ≈ the bitmap itself.
2. probe — the fact computes the SAME positions JVM-side; an
   Arrow-batched pandas UDF tests them against the broadcast bitset
   (numpy gather, no per-row Python).
3. verify — bloom hits are a superset of true matches (false positives,
   never false negatives), so an exact left_semi join over the pruned
   remnant restores exact semantics; the shuffle now carries only
   bloom survivors.

Correctness contract: ``bloom_semi_join(..., exact=True)`` ≡ plain
``left_semi`` for ANY num_bits/num_hashes (the bloom only prunes, the
join decides) — that identity is the q77 oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_positions(key: Column, num_hashes: int, num_bits: int) -> list[Column]:
    """k bloom positions per key, all JVM-side: xxhash64 seeded by the
    hash index via an extra literal argument (xxhash64 is variadic and
    folds each argument into the state, so (i, key) ≠ (j, key))."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits)) for i in range(num_hashes)
    ]


def build_bloom_bits(
    keys: DataFrame, key_col: str, num_bits: int = 1 << 20, num_hashes: int = 5
) -> np.ndarray:
    """Packed uint8 bitset (little-endian within a byte) of the bloom
    over ``keys[key_col]``. One explode + distinct shuffle; the driver
    materializes at most ``num_bits`` distinct positions."""
    pos = (
        keys.select(
            F.explode(
                F.array(*_bit_positions(F.col(key_col), num_hashes, num_bits))
            ).alias("p")
        )
        .distinct()
        .toPandas()["p"]
        .to_numpy()
    )
    bits = np.zeros((num_bits + 7) // 8, dtype=np.uint8)
    # distinct positions can still share a byte — OR in place, don't assign
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    exact: bool = True,
) -> DataFrame:
    """Semi-join ``fact`` to ``keys`` with a bloom pre-filter on the scan.

    ``exact=True`` (default) follows the bloom with a real left_semi
    join — result is exactly ``fact ⋉ keys`` with only bloom survivors
    shuffled. ``exact=False`` returns the bloom superset (useful when a
    downstream exact join exists anyway).
    """
    dim_key = dim_key or fact_key
    bits = build_bloom_bits(keys, dim_key, num_bits, num_hashes)
    bc = fact.sparkSession.sparkContext.broadcast(bits)

    @F.pandas_udf("boolean")
    def might_contain(pos: pd.Series) -> pd.Series:
        b = bc.value
        mat = np.vstack(pos.to_numpy())  # (batch, num_hashes) int64
        hit = (b[mat >> 3] >> (mat & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    pos_col = F.array(*_bit_positions(F.col(fact_key), num_hashes, num_bits))
    pruned = fact.filter(might_contain(pos_col))
    if not exact:
        return pruned
    return pruned.join(
        keys.select(dim_key).distinct(),
        on=F.col(fact_key) == F.col(dim_key),
        how="left_semi",
    )


def bloom_params(expected_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook bloom sizing: bits m = −n·ln p / (ln 2)², hashes
    k = (m/n)·ln 2. Returns (num_bits, num_hashes) to pass to
    :func:`bloom_semi_join` — e.g. 1M keys at 1% fpp → ~9.6M bits
    (1.2 MiB) and 7 hashes; at 100 TB the bitmap broadcast stays
    megabytes while an exact key broadcast would be gigabytes."""
    import math

    if expected_keys <= 0:
        raise ValueError("expected_keys must be positive")
    if not 0.0 < fpp < 1.0:
        raise ValueError("fpp must be in (0, 1)")
    num_bits = max(64, int(-expected_keys * math.log(fpp) / (math.log(2) ** 2)))
    num_hashes = max(1, round(num_bits / expected_keys * math.log(2)))
    return num_bits, num_hashes
