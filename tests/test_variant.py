"""Spark 4 VARIANT surface: parse-once binary JSON + typed gets."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_try_variant_get_missing_and_typed_paths(spark):
    df = spark.createDataFrame(
        [('{"k": 7, "tags": ["a", "b"]}',), ('{"other": 1}',), ("[1, 2, 3]",)],
        "props string",
    ).select(F.parse_json("props").alias("v"))
    assert df.schema["v"].dataType.typeName() == "variant"
    out = df.select(
        F.try_variant_get("v", "$.k", "bigint").alias("k"),
        F.try_variant_get("v", "$.tags[1]", "string").alias("tag1"),
        F.try_variant_get("v", "$[0]", "int").alias("head"),
    ).collect()
    assert [(r.k, r.tag1, r.head) for r in out] == [
        (7, "b", None),
        (None, None, None),
        (None, None, 1),
    ]
