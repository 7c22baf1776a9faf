"""Named analytic queries over the testdata star schema, with DuckDB oracles.

Each entry in ``QUERIES`` is ``name -> callable(spark, sf_dir) -> DataFrame``
and (where SQL-expressible) ``ORACLES[name]`` is the equivalent ANSI SQL
for the DuckDB oracle. The driver compares row-count + schema +
order-insensitive value-hash, with columns sorted by NAME — so every
computed column is aliased identically on both sides.

Cross-engine numeric determinism (the reason for the ``_dec`` casts):
the testdata's double columns hold exactly-2-decimal values, so casting
to a bounded decimal is EXACT in both engines; all sums/products then
happen in exact decimal arithmetic, and only the final aggregate is cast
to double (a single, correctly-rounded conversion) — bitwise identical
between Spark and DuckDB. Naive ``sum(double)`` would differ in the last
ulp because summation order differs.

Scale notes are per-query in the docstrings; the common rules:
- small dims (region, nation) are broadcast explicitly — they are
  constant-size even at 100 TB;
- customer/orders/lineitem joins are left to Catalyst/AQE (sort-merge →
  broadcast at runtime if a side turns out small after filtering);
- aggregations are partial-aggregated map-side by Catalyst automatically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airbnb_pyspark_jobs_spark.functions.hashing import md5_hex_key
from airbnb_pyspark_jobs_spark.operators.dims import date_dimension
from airbnb_pyspark_jobs_spark.operators.facts import DimJoin, build_fact
from airbnb_pyspark_jobs_spark.operators.scd2 import Scd2Spec, scd2_initial, scd2_merge
from airbnb_pyspark_jobs_spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# name -> set of family tags, for `pytest -m <family>` selection (the
# full-registry oracle matrix is ~18 min; a family runs in minutes).
# Module tag from the defining module + semantic tags by name pattern.
QUERY_FAMILIES: dict[str, set[str]] = {}

_MODULE_FAMILY = {
    "queries": "core",
    "text_queries": "text",
    "similarity_queries": "similarity",
    "event_queries": "events",
    "analytics_queries": "analytics",
    "multimodal_queries": "multimodal",
}

import re as _re  # noqa: E402

_SEMANTIC_FAMILIES = {
    "dedup": _re.compile(
        r"dedup|minhash|_dup|dup_|jaccard|containment|substring|winnow"
        r"|keeper|near_dup|transitivity|repetition|chunk"
    ),
    "ann": _re.compile(r"ann_|knn|ivf|lsh|pca|quantization|coreset|mmr|centroid"),
    "sketch": _re.compile(r"hll|kmv|sketch|heavy_hitters|bloom"),
}

# Reentrancy depth of wrapped query invocations — cache release happens
# only at depth 0 (see the `query` decorator).
_ACTIVE_DEPTH = 0


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query (and its DuckDB oracle SQL) under ``name``.

    Invocation releases caches owned by the PREVIOUS query first (see
    ``caching.owned_persist``): by the time query N+1 is built, query
    N's result has been materialized, so its persisted intermediates
    are dead weight in the block manager. This bounds a long query loop
    (the driver runs the whole registry in one session) to at most one
    query's caches at a time."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str, **kwargs) -> DataFrame:
            from airbnb_pyspark_jobs_spark.caching import release_owned_caches

            # Release the PREVIOUS query's caches only at the top-level
            # invocation: composite queries call other registered
            # queries while building (q172 → q156/q169 → q147), and a
            # nested release would unpersist frames the composer just
            # registered for sharing. kwargs pass through so composers
            # can inject shared precomputed frames.
            global _ACTIVE_DEPTH
            if _ACTIVE_DEPTH == 0:
                release_owned_caches()
            _ACTIVE_DEPTH += 1
            try:
                return fn(spark, sf_dir, **kwargs)
            finally:
                _ACTIVE_DEPTH -= 1

        # family resolution BEFORE any registry mutation, so a rejected
        # registration leaves no stray entry behind
        mod = fn.__module__.rsplit(".", 1)[-1]
        if fn.__module__.startswith("airbnb_pyspark_jobs_spark.plans"):
            if mod not in _MODULE_FAMILY:
                # a new plans module must declare its family (and a
                # matching pytest.ini marker) — a silent 'core' default
                # would mislabel every query it registers and quietly
                # grow `pytest -m core`
                raise KeyError(
                    f"query module {mod!r} has no family in _MODULE_FAMILY; "
                    "add it (and a pytest.ini marker) before registering "
                    "queries"
                )
            fams = {_MODULE_FAMILY[mod]}
        else:
            # registrations from outside the plans package (tests,
            # ad-hoc sessions) are tagged external, never a pytest family
            fams = {"external"}
        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn  # source anchor for the catalog generator
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        for fam, pat in _SEMANTIC_FAMILIES.items():
            if pat.search(name):
                fams.add(fam)
        QUERY_FAMILIES[name] = fams
        return wrapped

    return deco


def _dec(col: str, precision: int, scale: int = 2) -> F.Column:
    """Exact decimal view of a 2-decimal double column."""
    return F.col(col).cast(f"decimal({precision},{scale})")


def _money(agg: F.Column, alias: str) -> F.Column:
    """Final money aggregate: round to cents, cast double (deterministic)."""
    return F.round(agg, 2).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# q01 pricing summary (TPC-H Q1 shape): scan-heavy groupBy/agg.
# Scale: single shuffle on a low-cardinality key (6 groups); Catalyst does
# map-side partial aggregation, so the shuffle moves only ~6 rows per task.
# Filter on l_shipdate is pushed into the parquet scan (min/max pruning).
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2)))
                     * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    qty = _dec("l_quantity", 12)
    price = _dec("l_extendedprice", 12)
    disc = _dec("l_discount", 4)
    tax = _dec("l_tax", 4)
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum(qty), "sum_qty"),
            _money(F.sum(price), "sum_base_price"),
            _money(F.sum(price * (F.lit(1) - disc)), "sum_disc_price"),
            _money(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)), "sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(disc).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q05 revenue by region (flagship; TPC-H Q5 shape): 4-way join chain + agg.
# Scale: region/nation are constant-size → explicit broadcast (no shuffle);
# customer is broadcast under the 50MB threshold at bench SF and AQE decides
# at larger SF; the lineitem⨝orders join is the only large shuffle, on the
# join key both sides, and AQE handles skew/coalescing.
# ---------------------------------------------------------------------------
@query(
    "q05_revenue_by_region",
    oracle="""
    SELECT
      r.r_name,
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
      COUNT(*) AS line_count
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q05_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    revenue = _dec("l_extendedprice", 12) * (F.lit(1) - _dec("l_discount", 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            _money(F.sum(revenue), "revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q10 top customers by revenue: agg + deterministic top-k.
# Scale: groupBy on c_custkey shuffles once; top-k is a TakeOrderedAndProject
# (per-partition heap + driver merge of k rows), NOT a global sort.
# Ties broken by c_custkey for cross-engine determinism.
# ---------------------------------------------------------------------------
@query(
    "q10_top_customers",
    oracle="""
    SELECT c_custkey, c_name, revenue, order_cnt FROM (
      SELECT
        c.c_custkey,
        c.c_name,
        CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
        COUNT(*) AS order_cnt,
        SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS revenue_exact
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey, c.c_name
      ORDER BY revenue_exact DESC, c_custkey ASC
      LIMIT 10
    )
    """,
)
def q10_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    agg = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(_dec("o_totalprice", 12)).alias("revenue_exact"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
    )
    return (
        agg.orderBy(F.col("revenue_exact").desc(), F.col("c_custkey").asc())
        .limit(10)
        .select(
            "c_custkey",
            "c_name",
            _money(F.col("revenue_exact"), "revenue"),
            "order_cnt",
        )
    )


# ---------------------------------------------------------------------------
# q04 order priority with semi-join (TPC-H Q4 shape).
# Scale: LEFT SEMI join — probe side only emits matches, no row multiplication;
# the EXISTS subquery never materializes duplicates.
# ---------------------------------------------------------------------------
@query(
    "q04_priority_semijoin",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
    )
    GROUP BY o_orderpriority
    """,
)
def q04_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_discount") > 0.05)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q11 window rank: top-3 orders per customer (partitioned window).
# Scale: window is PARTITIONED by o_custkey (unlike the reference's global
# row_number, SURVEY §7.2) — parallel across the cluster; rank filter is
# evaluated before any further join so only 3 rows/customer survive.
# ---------------------------------------------------------------------------
@query(
    "q11_top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT
        o_custkey, o_orderkey, o_totalprice,
        CAST(ROW_NUMBER() OVER (
          PARTITION BY o_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC
        ) AS BIGINT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def q11_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# q12 market segment stats: simple groupBy over customer.
# ---------------------------------------------------------------------------
@query(
    "q12_mktsegment_stats",
    oracle="""
    SELECT
      c_mktsegment,
      COUNT(*) AS n_customers,
      CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_acctbal,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q12_mktsegment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    bal = _dec("c_acctbal", 12)
    n = F.count(F.lit(1))
    return cust.groupBy("c_mktsegment").agg(
        n.alias("n_customers"),
        _money(F.sum(bal), "total_acctbal"),
        (F.sum(bal).cast("double") / n).alias("avg_acctbal"),
    )


# ---------------------------------------------------------------------------
# q13 events JSON extraction + agg: semi-structured props column.
# Scale: get_json_object is JVM-side (no UDF); one shuffle on event_type.
# ---------------------------------------------------------------------------
@query(
    "q13_events_json",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q13_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    return (
        events.select(
            "event_type",
            "user_id",
            _dec("value", 12).alias("value_dec"),
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _money(F.sum("value_dec"), "total_value"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# q20 date dimension: generator source (reference dim_date,
# jobs/final_dim_load.py:464-485). See operators/dims.py.
# ---------------------------------------------------------------------------
@query(
    "q20_date_dimension",
    oracle="""
    SELECT
      CAST(d AS TIMESTAMP) AS date_id,
      CAST(year(d) AS INT) AS year,
      CAST(quarter(d) AS INT) AS quarter,
      CAST(month(d) AS INT) AS month,
      CAST(weekofyear(d) AS INT) AS week_of_year,
      CAST(dayofmonth(d) AS INT) AS day_of_month,
      CAST(dayofweek(d) + 1 AS INT) AS day_of_week,
      dayname(d) AS day_name,
      (dayofweek(d) + 1) IN (1, 7) AS is_weekend
    FROM generate_series(DATE '2010-01-01', DATE '2030-12-31', INTERVAL 1 DAY) t(d)
    """,
)
def q20_date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    # date_id cast to timestamp: pandas/Arrow have no date dtype, so a
    # DATE column round-trips differently from Spark vs DuckDB in the
    # compare harness; timestamp is unambiguous on both sides.
    return date_dimension(spark, "2010-01-01", "2030-12-31").withColumn(
        "date_id", F.col("date_id").cast("timestamp")
    )


# ---------------------------------------------------------------------------
# q21 SCD2 initial load over customer: cold-start dimension build with
# portable (md5) surrogate keys and a fixed as-of timestamp so the result
# is deterministic and oracle-comparable. See operators/scd2.py for the
# full merge (initial + incremental).
# ---------------------------------------------------------------------------
@query(
    "q21_scd2_initial_customer",
    oracle="""
    SELECT
      md5(CAST(c_custkey AS VARCHAR)) AS customer_key,
      c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      TRUE AS is_valid,
      TIMESTAMP '2026-01-01 00:00:00' AS start_dt,
      CAST(NULL AS TIMESTAMP) AS end_dt
    FROM customer
    """,
)
def q21_scd2_initial_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    return cust.select(
        md5_hex_key("c_custkey").alias("customer_key"),
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit(True).alias("is_valid"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("start_dt"),
        F.lit(None).cast("timestamp").alias("end_dt"),
    )


# ---------------------------------------------------------------------------
# q22 SCD2 incremental merge (operators/scd2.scd2_merge): initial load at T0,
# then a snapshot where customers with acctbal > 5000 move to segment
# 'UPGRADED' — merged at T1. The oracle reconstructs the exact expected
# dimension (kept-current ∪ expired ∪ new-versions) including the portable
# md5 surrogate keys, exercising change-detection, expiry and re-versioning.
# Scale: one natural-key shuffle feeds change detection + expiry + both
# anti-joins; surrogate keys are content-hashes (no global window).
# ---------------------------------------------------------------------------
_SCD2_T0 = "2026-01-01 00:00:00"
_SCD2_T1 = "2026-02-01 00:00:00"

_CUSTOMER_SPEC = Scd2Spec(
    natural_key=("c_custkey",),
    tracked_cols=("c_name", "c_acctbal", "c_mktsegment"),
    surrogate_key="customer_key",
    portable_hash=True,
    audit_col=None,
    extra_cols=("c_nationkey",),
)


@query(
    "q22_scd2_merge_customer",
    oracle=f"""
    WITH base AS (SELECT * FROM customer)
    SELECT
      md5(CAST(c_custkey AS VARCHAR) || chr(31) || '{_SCD2_T0}') AS customer_key,
      c_custkey, c_name, c_acctbal, c_mktsegment, c_nationkey,
      TRUE AS is_valid,
      TIMESTAMP '{_SCD2_T0}' AS start_dt,
      CAST(NULL AS TIMESTAMP) AS end_dt
    FROM base WHERE c_acctbal <= 5000
    UNION ALL
    SELECT
      md5(CAST(c_custkey AS VARCHAR) || chr(31) || '{_SCD2_T0}') AS customer_key,
      c_custkey, c_name, c_acctbal, c_mktsegment, c_nationkey,
      FALSE AS is_valid,
      TIMESTAMP '{_SCD2_T0}' AS start_dt,
      TIMESTAMP '{_SCD2_T1}' AS end_dt
    FROM base WHERE c_acctbal > 5000
    UNION ALL
    SELECT
      md5(CAST(c_custkey AS VARCHAR) || chr(31) || '{_SCD2_T1}') AS customer_key,
      c_custkey, c_name, c_acctbal, 'UPGRADED' AS c_mktsegment, c_nationkey,
      TRUE AS is_valid,
      TIMESTAMP '{_SCD2_T1}' AS start_dt,
      CAST(NULL AS TIMESTAMP) AS end_dt
    FROM base WHERE c_acctbal > 5000
    """,
)
def q22_scd2_merge_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    dim0 = scd2_initial(cust, _CUSTOMER_SPEC, _SCD2_T0)
    snapshot = cust.withColumn(
        "c_mktsegment",
        F.when(F.col("c_acctbal") > 5000, F.lit("UPGRADED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    return scd2_merge(dim0, snapshot, _CUSTOMER_SPEC, _SCD2_T1)


# ---------------------------------------------------------------------------
# q23 SCD2 merge with HARD DELETES (tombstoning): initial load at T0;
# at T1 the snapshot drops every BUILDING-segment customer (fed as
# deleted_keys) and upgrades acctbal > 5000 among the survivors. The
# oracle reconstructs the exact expected dimension: kept-current ∪
# expired+re-versioned (changed) ∪ tombstoned (expired, NO replacement).
# Exercises the deletion flow the reference lacks entirely.
# ---------------------------------------------------------------------------
@query(
    "q23_scd2_merge_with_deletes",
    oracle=f"""
    WITH base AS (SELECT * FROM customer)
    SELECT
      md5(CAST(c_custkey AS VARCHAR) || chr(31) || '{_SCD2_T0}') AS customer_key,
      c_custkey, c_name, c_acctbal, c_mktsegment, c_nationkey,
      TRUE AS is_valid,
      TIMESTAMP '{_SCD2_T0}' AS start_dt,
      CAST(NULL AS TIMESTAMP) AS end_dt
    FROM base WHERE c_mktsegment <> 'BUILDING' AND c_acctbal <= 5000
    UNION ALL
    SELECT
      md5(CAST(c_custkey AS VARCHAR) || chr(31) || '{_SCD2_T0}') AS customer_key,
      c_custkey, c_name, c_acctbal, c_mktsegment, c_nationkey,
      FALSE AS is_valid,
      TIMESTAMP '{_SCD2_T0}' AS start_dt,
      TIMESTAMP '{_SCD2_T1}' AS end_dt
    FROM base WHERE c_mktsegment <> 'BUILDING' AND c_acctbal > 5000
    UNION ALL
    SELECT
      md5(CAST(c_custkey AS VARCHAR) || chr(31) || '{_SCD2_T1}') AS customer_key,
      c_custkey, c_name, c_acctbal, 'UPGRADED' AS c_mktsegment, c_nationkey,
      TRUE AS is_valid,
      TIMESTAMP '{_SCD2_T1}' AS start_dt,
      CAST(NULL AS TIMESTAMP) AS end_dt
    FROM base WHERE c_mktsegment <> 'BUILDING' AND c_acctbal > 5000
    UNION ALL
    SELECT
      md5(CAST(c_custkey AS VARCHAR) || chr(31) || '{_SCD2_T0}') AS customer_key,
      c_custkey, c_name, c_acctbal, c_mktsegment, c_nationkey,
      FALSE AS is_valid,
      TIMESTAMP '{_SCD2_T0}' AS start_dt,
      TIMESTAMP '{_SCD2_T1}' AS end_dt
    FROM base WHERE c_mktsegment = 'BUILDING'
    """,
)
def q23_scd2_merge_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    dim0 = scd2_initial(cust, _CUSTOMER_SPEC, _SCD2_T0)
    survivors = cust.filter(F.col("c_mktsegment") != "BUILDING")
    snapshot = survivors.withColumn(
        "c_mktsegment",
        F.when(F.col("c_acctbal") > 5000, F.lit("UPGRADED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    deleted = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return scd2_merge(dim0, snapshot, _CUSTOMER_SPEC, _SCD2_T1, deleted_keys=deleted)


# ---------------------------------------------------------------------------
# q30 declarative fact build (operators/facts.build_fact): lineitem base,
# three dimension joins (orders -> customer chain + part), content-hashed
# fact id on the declared grain, derived categorical measures — the
# reference's fact pattern (jobs/final_fact_load.py) re-expressed.
# Scale: part/customer broadcast (small dims); orders join left to AQE
# (sort-merge at 100 TB, broadcast at small SF); no monotonically_
# increasing_id (non-reproducible) — grain hash instead.
# ---------------------------------------------------------------------------
@query(
    "q30_fact_lineitem",
    oracle="""
    SELECT
      md5(CAST(l.l_orderkey AS VARCHAR) || chr(31) || CAST(l.l_linenumber AS VARCHAR)) AS fact_id,
      l.l_orderkey, l.l_linenumber, l.l_quantity,
      o.o_custkey, c.c_mktsegment, p.p_brand,
      CAST(ROUND(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
      CASE WHEN l.l_quantity <= 10 THEN 'SMALL'
           WHEN l.l_quantity <= 30 THEN 'MEDIUM'
           ELSE 'LARGE' END AS qty_band,
      l.l_discount > 0.05 AS high_discount
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    """,
)
def q30_fact_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    part = load_table(spark, "part", sf_dir)
    return build_fact(
        base=li,
        dims=[
            DimJoin(dim=orders, on={"l_orderkey": "o_orderkey"}, take=("o_custkey",), broadcast=False),
            DimJoin(dim=cust, on={"o_custkey": "c_custkey"}, take=("c_mktsegment",)),
            DimJoin(dim=part, on={"l_partkey": "p_partkey"}, take=("p_brand",)),
        ],
        grain=("l_orderkey", "l_linenumber"),
        derived={
            "revenue": F.round(
                _dec("l_extendedprice", 12) * (F.lit(1) - _dec("l_discount", 4)), 2
            ).cast("double"),
            "qty_band": F.when(F.col("l_quantity") <= 10, "SMALL")
            .when(F.col("l_quantity") <= 30, "MEDIUM")
            .otherwise("LARGE"),
            "high_discount": F.col("l_discount") > 0.05,
        },
        keep=("l_orderkey", "l_linenumber", "l_quantity"),
        portable_hash=True,
    )


# ---------------------------------------------------------------------------
# q81 SCD2 point-in-time snapshot: rebuild the q22 dimension (T0 load +
# T1 upgrade merge), then reconstruct the state valid at T0 < t < T1 —
# every customer's ORIGINAL version, including the already-expired rows
# of upgraded customers (end_dt = T1 > t) and none of the T1 versions.
# Exercises the NULL-aware validity predicate current rows require
# under NULL end_dt semantics (inclusive start, exclusive end).
# ---------------------------------------------------------------------------
_SCD2_TMID = "2026-01-15 00:00:00"


@query(
    "q81_scd2_asof_snapshot",
    oracle=f"""
    WITH base AS (SELECT * FROM customer)
    SELECT
      md5(CAST(c_custkey AS VARCHAR) || chr(31) || '{_SCD2_T0}') AS customer_key,
      c_custkey, c_name, c_acctbal, c_mktsegment, c_nationkey,
      TRUE AS is_valid,
      TIMESTAMP '{_SCD2_T0}' AS start_dt,
      CAST(NULL AS TIMESTAMP) AS end_dt
    FROM base WHERE c_acctbal <= 5000
    UNION ALL
    SELECT
      md5(CAST(c_custkey AS VARCHAR) || chr(31) || '{_SCD2_T0}') AS customer_key,
      c_custkey, c_name, c_acctbal, c_mktsegment, c_nationkey,
      FALSE AS is_valid,
      TIMESTAMP '{_SCD2_T0}' AS start_dt,
      TIMESTAMP '{_SCD2_T1}' AS end_dt
    FROM base WHERE c_acctbal > 5000
    """,
)
def q81_scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.scd2 import asof_snapshot

    cust = load_table(spark, "customer", sf_dir)
    dim0 = scd2_initial(cust, _CUSTOMER_SPEC, _SCD2_T0)
    snapshot = cust.withColumn(
        "c_mktsegment",
        F.when(F.col("c_acctbal") > 5000, F.lit("UPGRADED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    dim1 = scd2_merge(dim0, snapshot, _CUSTOMER_SPEC, _SCD2_T1)
    return asof_snapshot(dim1, _SCD2_TMID)


# ---------------------------------------------------------------------------
# q132 snapshot diff / reconciliation (the warehouse audit operator):
# old = today's customer snapshot; new = tomorrow's (upgraded
# segments for high balances, every 100th key gone, 50 new keys).
# One full-outer key join, diff-sized output, null-safe compares;
# changed_cols lists differing columns in fixed order.
# ---------------------------------------------------------------------------
@query(
    "q132_snapshot_diff",
    oracle="""
    WITH oldt AS (
      SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
    ),
    newt AS (
      SELECT c_custkey, c_name, c_acctbal,
             CASE WHEN c_acctbal > 5000 THEN 'UPGRADED'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 100 != 0
      UNION ALL
      SELECT c_custkey + 1000000, c_name, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey < 50
    ),
    j AS (
      SELECT o.c_custkey AS ok, n.c_custkey AS nk,
             COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
             CASE WHEN o.c_custkey IS NULL THEN 'added'
                  WHEN n.c_custkey IS NULL THEN 'removed'
                  WHEN (o.c_name IS DISTINCT FROM n.c_name)
                    OR (o.c_acctbal IS DISTINCT FROM n.c_acctbal)
                    OR (o.c_mktsegment IS DISTINCT FROM n.c_mktsegment)
                    THEN 'changed' END AS change_type,
             concat_ws(',',
               CASE WHEN o.c_name IS DISTINCT FROM n.c_name THEN 'c_name' END,
               CASE WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                    THEN 'c_acctbal' END,
               CASE WHEN o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                    THEN 'c_mktsegment' END) AS cc
      FROM oldt o FULL OUTER JOIN newt n ON o.c_custkey = n.c_custkey
    )
    SELECT c_custkey, change_type,
           CASE WHEN change_type = 'changed' THEN cc ELSE '' END AS changed_cols
    FROM j WHERE change_type IS NOT NULL
    """,
)
def q132_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.scd2 import snapshot_diff

    cust = load_table(spark, "customer", sf_dir)
    old = cust.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    mutated = old.filter(F.col("c_custkey") % 100 != 0).withColumn(
        "c_mktsegment",
        F.when(F.col("c_acctbal") > 5000, "UPGRADED").otherwise(
            F.col("c_mktsegment")
        ),
    )
    added = old.filter(F.col("c_custkey") < 50).withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(1000000)
    )
    new = mutated.unionByName(added)
    return snapshot_diff(
        old, new, ["c_custkey"], ["c_name", "c_acctbal", "c_mktsegment"]
    )
