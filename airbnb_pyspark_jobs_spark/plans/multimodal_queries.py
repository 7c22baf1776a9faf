"""Multimodal-plumbing query: the Arrow-batched mapInPandas feature
extractor, oracle-checked.

There is no binary testdata table, so payloads are derived
deterministically from `documents` (UTF-8 bytes of the text — ASCII in
this corpus, so byte i == character i). That lets the DuckDB oracle
reproduce the fake decoder (byte-value features) relationally and
value-check the ENTIRE distributed path: binary column construction →
mapInPandas batches → feature arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.multimodal import extract_features
from airbnb_pyspark_jobs_spark.plans.queries import query
from airbnb_pyspark_jobs_spark.sources.registry import load_table

_DIMS = 8

# feature i = byte[(i % n_bytes)] / 255  (operators/multimodal._fake_decode_feature)
_feat_exprs = ",\n      ".join(
    f"round(ord(substr(text, ({i} % length(text)) + 1, 1)) / 255.0, 6) AS f{i}"
    for i in range(_DIMS)
)

_Q70_ORACLE = f"""
SELECT
  doc_id AS media_id,
  CAST(length(text) AS BIGINT) AS n_bytes,
  {_feat_exprs}
FROM documents
"""


@query("q70_multimodal_features", oracle=_Q70_ORACLE)
def q70_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    feats = extract_features(media, feature_dims=_DIMS)
    return feats.select(
        "media_id",
        "n_bytes",
        *[
            F.round(F.col("feature").getItem(i), 6).alias(f"f{i}")
            for i in range(_DIMS)
        ],
    )
