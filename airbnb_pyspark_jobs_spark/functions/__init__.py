"""Column-builder function library (driver-side helpers returning Columns).

Everything here composes Catalyst expressions — no Python UDFs — so every
function stays inside whole-stage codegen (the reference follows the same
discipline; see SURVEY §2.8 F16).
"""

from airbnb_pyspark_jobs_spark.functions.cleansing import (
    clamp_non_negative,
    clean_money,
    coerce_boolean,
    fill_defaults,
    impute,
)
from airbnb_pyspark_jobs_spark.functions.hashing import (
    md5_hex_key,
    row_hash,
    row_hash_md5,
    surrogate_key_hash,
)

__all__ = [
    "clamp_non_negative",
    "clean_money",
    "coerce_boolean",
    "fill_defaults",
    "impute",
    "md5_hex_key",
    "row_hash",
    "row_hash_md5",
    "surrogate_key_hash",
]
