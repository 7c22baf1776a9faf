"""Star-schema fact assembly — declarative dim-join chain.

The reference's fact job (``jobs/final_fact_load.py:20-165`` in
/root/reference) is a hand-written 4-stage join chain: clean the base
(calendar), guard that keys overlap, broadcast-join three dimensions
(J6-J9 in SURVEY §2.4), then project surrogate FKs + derived categorical
measures. This module generalizes it: a fact is declared as a base
DataFrame + a list of :class:`DimJoin` specs + derived columns.

Scale design:
- each :class:`DimJoin` may request an explicit ``broadcast`` (the
  reference broadcasts all three dims; correct when dims are orders of
  magnitude smaller than the fact base) — otherwise Catalyst/AQE picks
  sort-merge vs broadcast at runtime;
- the base is optionally pre-partitioned on the first join key
  (reference: ``repartition(100, "listing_id")``, ``:44``) — at 100 TB
  this aligns the big side once and AQE coalesces after;
- the key-overlap guard is a cheap ``left_semi`` + ``isEmpty`` rather
  than a full inner-join ``count()`` (the reference's guard recomputes a
  distinct-join, ``:47-58``);
- the fact surrogate id defaults to a content hash of the declared grain
  (deterministic, re-run stable) instead of
  ``monotonically_increasing_id`` (``:123``), which is partition-layout
  dependent and not reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.functions.hashing import md5_hex_key, surrogate_key_hash


@dataclass(frozen=True)
class DimJoin:
    """One dimension join: ``on`` maps fact-side col -> dim-side col."""

    dim: DataFrame
    on: Mapping[str, str]
    take: Sequence[str] = field(default_factory=tuple)  # dim columns to carry
    how: str = "inner"
    broadcast: bool = True


class EmptyFactError(RuntimeError):
    """Raised when the fact base shares no keys with a required dimension
    (the reference exits(1) on this, jobs/final_fact_load.py:56-58)."""


def check_key_overlap(base: DataFrame, dim: DataFrame, on: Mapping[str, str]) -> None:
    """Guard: at least one base row must match the dimension."""
    cond = [F.col(f"b.{bk}") == F.col(f"d.{dk}") for bk, dk in on.items()]
    matched = base.alias("b").join(dim.alias("d"), on=cond, how="left_semi")
    if matched.isEmpty():
        raise EmptyFactError(f"no fact keys overlap dimension on {dict(on)}")


def build_fact(
    base: DataFrame,
    dims: Sequence[DimJoin],
    grain: Sequence[str],
    derived: Mapping[str, Column] | None = None,
    keep: Sequence[str] | None = None,
    fact_id_col: str = "fact_id",
    portable_hash: bool = False,
    pre_partition: tuple[int, str] | None = None,
    guard_first_join: bool = True,
) -> DataFrame:
    """Assemble a fact table from a base + dimension join specs.

    ``grain`` names the base columns that uniquely identify a fact row;
    the fact surrogate id is a content hash of the grain. ``derived``
    adds computed measure/category columns after all joins. ``keep``
    restricts base columns carried into the output (default: all).
    """
    fact = base
    if pre_partition is not None:
        n, key = pre_partition
        fact = fact.repartition(n, key)

    if dims and guard_first_join:
        check_key_overlap(fact, dims[0].dim, dims[0].on)

    for spec in dims:
        dim_df = spec.dim
        if spec.take:
            need = {*spec.take, *spec.on.values()}
            dim_df = dim_df.select(*[c for c in dim_df.columns if c in need])
        right = F.broadcast(dim_df) if spec.broadcast else dim_df
        cond = None
        for bk, dk in spec.on.items():
            c = fact[bk] == dim_df[dk]
            cond = c if cond is None else (cond & c)
        joined = fact.join(right, on=cond, how=spec.how)
        # drop dim-side join keys (keep the fact-side ones)
        for dk in spec.on.values():
            if dk not in spec.take:
                joined = joined.drop(dim_df[dk])
        fact = joined

    key_fn = md5_hex_key if portable_hash else surrogate_key_hash
    fact = fact.withColumn(fact_id_col, key_fn(*grain))

    if derived:
        fact = fact.withColumns(dict(derived))

    if keep is not None:
        dim_cols = [c for s in dims for c in s.take]
        derived_cols = list(derived.keys()) if derived else []
        fact = fact.select(fact_id_col, *keep, *dim_cols, *derived_cols)
    return fact
