"""airbnb_pyspark_jobs_spark — a PySpark-native analytics engine.

A brand-new, library-style engine with the query and data-processing
capabilities of the reference batch ETL pipeline
(gorozia0709/airbnb-pyspark-jobs — see SURVEY.md), re-expressed as
composable, individually-testable PySpark operators:

- ``sources``   — typed ingestion (CSV→schema→Parquet), parquet scan/sink,
                  write barriers (SURVEY §2.1).
- ``functions`` — cleansing/conformance column builders (boolean coercion,
                  money cleaning, clamping, null policies), hashing &
                  surrogate keys, text analysis, vector math (SURVEY §2.2/2.8).
- ``operators`` — SCD Type-2 merge, date dimension, star-fact assembly,
                  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
                  similarity search, windows/sessionization (SURVEY §2.3-2.6
                  + north-star extensions).
- ``plans``     — named end-to-end analytic queries used by the correctness
                  gate and the benchmark harness.
- ``streaming`` — Structured Streaming surface over the ``events`` table
                  (watermarks, tumbling/sliding/session windows, stateful
                  dedup).

Everything is DataFrame/SQL-first: logical plans are declared via the
public PySpark API and physical strategy is left to Catalyst/AQE, with
explicit broadcast/repartition hints only where profitable at scale.
"""

__version__ = "0.1.0"
