"""Row hashing & surrogate keys (SURVEY §2.8 F10, §7.2).

The reference's change-detection hash is ``md5(concat(coalesce(col,
'NULL')...))`` with NO separator (``jobs/final_dim_load.py:115-123``) —
it conflates ("ab","c") with ("a","bc"). Its surrogate keys come from a
GLOBAL un-partitioned ``row_number()`` (``jobs/final_dim_load.py:153``)
— a single-partition bottleneck at scale (the #1 scale bug called out in
SURVEY §7.2).

Fixes:
- :func:`row_hash` — ``xxhash64`` over a struct of the tracked columns:
  delimiter-safe (struct fields are length-prefixed in the hash), 64-bit,
  JVM-side, ~an order of magnitude cheaper than md5-of-concat.
- :func:`row_hash_md5` — md5 over delimiter-joined null-tagged strings,
  for when a portable (cross-engine reproducible) hash is required.
- :func:`surrogate_key_hash` — content-addressed 64-bit key from the
  natural key (+ optional version timestamp for SCD2 re-versions): fully
  parallel, deterministic, no shuffle, no driver round-trip, no
  single-partition window. Collision odds for 64-bit keys stay below
  ~3e-4 even at 10^8 keys; for warehouse-grade uniqueness use
  :func:`md5_hex_key` (128-bit).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Field separator that cannot collide with real data after null-tagging:
# ASCII unit separator.
_SEP = "\x1f"
_NULL_TAG = "\x00NULL\x00"


def _cols(cols: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def row_hash(*cols: Column | str) -> Column:
    """64-bit change-detection hash over the given columns (xxhash64/struct).

    Null-safe and delimiter-safe: xxhash64 hashes each struct field with
    its type/length, so no concat ambiguity.
    """
    return F.xxhash64(F.struct(*_cols(cols)))


def row_hash_md5(*cols: Column | str) -> Column:
    """Portable 128-bit row hash: md5 of SEP-joined, null-tagged strings.

    Reproducible in any engine with md5 (used by the DuckDB oracle
    checks). Unlike the reference's separator-less concat, this cannot
    conflate ("ab","c") with ("a","bc"), and NULL is distinguishable from
    the string 'NULL'.
    """
    tagged = [F.coalesce(c.cast("string"), F.lit(_NULL_TAG)) for c in _cols(cols)]
    return F.md5(F.concat_ws(_SEP, *tagged))


def surrogate_key_hash(*natural_key: Column | str, version: Column | None = None) -> Column:
    """Scalable surrogate key: xxhash64 of the natural key (+ version).

    Replaces the reference's global ``row_number().over(Window.orderBy(k))``
    + max-offset pattern: content-addressed keys need no global sort, no
    state read, and are stable across re-runs. ``version`` (e.g. the SCD2
    ``start_dt``) disambiguates successive versions of the same natural
    key.
    """
    parts = _cols(natural_key)
    if version is not None:
        parts = [*parts, version]
    return F.xxhash64(F.struct(*parts))


def md5_hex_key(*natural_key: Column | str, version: Column | None = None) -> Column:
    """128-bit portable surrogate key (md5 hex string) — collision-proof at
    warehouse scale and reproducible cross-engine (oracle-comparable)."""
    parts = _cols(natural_key)
    if version is not None:
        parts = [*parts, version]
    tagged = [F.coalesce(p.cast("string"), F.lit(_NULL_TAG)) for p in parts]
    return F.md5(F.concat_ws(_SEP, *tagged))
