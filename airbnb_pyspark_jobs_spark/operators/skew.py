"""Skew mitigation: salted joins for pathological hot keys.

AQE's skew-join splitting (enabled in every profile, SURVEY §4) handles
most skew at runtime by splitting oversized partitions. Salting is the
explicit fallback for the pathological case AQE can't fix — a SINGLE
join key holding a double-digit percentage of the rows:

- the skewed (big) side gets a random-ish salt in [0, salt_factor) —
  derived from a stable row expression, not rand(), so re-runs are
  deterministic;
- the small side is EXPLODED salt_factor times (one copy per salt);
- the join key becomes (key, salt): the hot key's rows spread over
  salt_factor reducers.

Cost: small side × salt_factor. Use only for keys AQE reports as
irreducibly skewed; keep salt_factor minimal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def add_salt(df: DataFrame, salt_factor: int, stable_cols: list[str] | None = None) -> DataFrame:
    """Salt in [0, salt_factor). Deterministic when ``stable_cols`` given
    (hash-based); otherwise uses rand() (fine when re-run determinism is
    not required)."""
    if stable_cols:
        salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in stable_cols])), F.lit(salt_factor))
    else:
        salt = (F.rand() * salt_factor).cast("int")
    return df.withColumn(SALT_COL, salt.cast("int"))


def explode_salt(df: DataFrame, salt_factor: int) -> DataFrame:
    """Replicate each row once per salt value (the small side)."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_factor: int = 8,
    how: str = "inner",
    stable_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Semantically identical to ``big.join(small, on, how)`` for inner and
    left joins ONLY (each big-side row matches exactly its salt's copy).
    Right/full-outer would emit every unmatched small-side row once per
    replicated salt copy — silently wrong — so those are rejected.
    """
    if how.lower().replace("_", "") not in {"inner", "left", "leftouter"}:
        raise ValueError(
            f"salted_join supports inner/left joins only, got how={how!r}: "
            "outer joins would duplicate unmatched small-side rows "
            "salt_factor times"
        )
    b = add_salt(big, salt_factor, stable_cols=stable_cols or on)
    s = explode_salt(small, salt_factor)
    out = b.join(s, on=[*on, SALT_COL], how=how)
    return out.drop(SALT_COL)
