"""Broader analytics surface: set ops, rollup, pivot, outer joins,
window frames, correlated-style subqueries — each with a DuckDB oracle.

These go beyond the reference's operator inventory (SURVEY §2.7 notes it
uses ONLY unionByName; no outer joins, no set ops, no frames) — they
complete the analytics surface a warehouse engine needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airbnb_pyspark_jobs_spark.functions.numeric import (
    decimal_ratio_round_sql,
    exact_mean_round_sql,
)
from airbnb_pyspark_jobs_spark.plans.queries import query, _dec, _money
from airbnb_pyspark_jobs_spark.sources.registry import load_table


# ---------------------------------------------------------------------------
# q14 set ops: customers with orders ∩/∖ customers in BUILDING segment.
# intersect/except are rewritten by Catalyst into semi/anti joins —
# no sort-based set op at scale.
# ---------------------------------------------------------------------------
@query(
    "q14_set_ops",
    oracle="""
    SELECT 'both' AS bucket, COUNT(*) AS n FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders
    )
    UNION ALL
    SELECT 'building_no_orders' AS bucket, COUNT(*) AS n FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders
    )
    """,
)
def q14_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey")
    )
    with_orders = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    both = building.intersect(with_orders).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("bucket"), "n"
    )
    no_orders = building.exceptAll(with_orders).distinct().agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("building_no_orders").alias("bucket"), "n")
    return both.unionByName(no_orders)


# ---------------------------------------------------------------------------
# q15 rollup: revenue by (region, nation) with subtotals + grand total.
# Catalyst expands rollup into a single Expand+Aggregate — one shuffle.
# ---------------------------------------------------------------------------
@query(
    "q15_rollup_revenue",
    oracle="""
    SELECT
      COALESCE(r.r_name, 'ALL') AS region,
      CASE WHEN GROUPING(n.n_name) = 1 THEN 'ALL' ELSE n.n_name END AS nation,
      CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q15_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            _money(F.sum(_dec("o_totalprice", 12)), "revenue"),
            # grouping() is only resolvable inside the rollup aggregate
            F.grouping("n_name").alias("__g_nation"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.when(F.col("__g_nation") == 1, F.lit("ALL"))
            .otherwise(F.col("n_name"))
            .alias("nation"),
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# q16 pivot: event value totals, event_type → columns. Fixed pivot value
# list (required at scale: without it Spark runs an extra distinct scan).
# ---------------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q16_pivot_events",
    oracle=f"""
    SELECT
      user_id % 10 AS user_bucket,
      {", ".join(
        f"CAST(ROUND(COALESCE(SUM(CAST(value AS DECIMAL(12,2))) FILTER (WHERE event_type = '{t}'), 0), 2) AS DOUBLE) AS {t}"
        for t in _EVENT_TYPES
      )}
    FROM events
    GROUP BY 1
    """,
)
def q16_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    out = (
        events.select(
            (F.col("user_id") % 10).alias("user_bucket"),
            "event_type",
            _dec("value", 12).alias("v"),
        )
        .groupBy("user_bucket")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum("v"))
    )
    return out.select(
        "user_bucket",
        *[
            F.round(F.coalesce(F.col(t), F.lit(0)), 2).cast("double").alias(t)
            for t in _EVENT_TYPES
        ],
    )


# ---------------------------------------------------------------------------
# q17 outer join: every customer with order stats, including the
# order-less (left join + null-safe aggregates).
# ---------------------------------------------------------------------------
@query(
    "q17_customer_order_stats",
    oracle="""
    SELECT
      c.c_custkey,
      COUNT(o.o_orderkey) AS n_orders,
      CAST(ROUND(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0), 2) AS DOUBLE) AS total_spend,
      COUNT(o.o_orderkey) = 0 AS is_inactive
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def q17_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    n_orders = F.count(F.col("o_orderkey"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            n_orders.alias("n_orders"),
            F.round(F.coalesce(F.sum(_dec("o_totalprice", 12)), F.lit(0)), 2)
            .cast("double")
            .alias("total_spend"),
            (n_orders == 0).alias("is_inactive"),
        )
    )


# ---------------------------------------------------------------------------
# q18 window frames: running revenue per customer over order date
# (rows between unbounded preceding and current row, deterministic
# tie-break on orderkey).
# ---------------------------------------------------------------------------
@query(
    "q18_running_revenue",
    oracle="""
    SELECT
      o_custkey, o_orderkey, o_orderdate,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend,
      CAST(ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
    FROM orders
    """,
)
def q18_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum(_dec("o_totalprice", 12)).over(run), 2)
        .cast("double")
        .alias("running_spend"),
        F.row_number().over(w).cast("bigint").alias("order_seq"),
    )


# ---------------------------------------------------------------------------
# q19 per-group argmin via window (correlated-subquery shape): cheapest
# part per brand. Window + filter beats a self-join-on-min at scale.
# ---------------------------------------------------------------------------
@query(
    "q19_cheapest_part_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
        ROW_NUMBER() OVER (
          PARTITION BY p_brand ORDER BY p_retailprice ASC, p_partkey ASC) AS rn
      FROM part
    ) WHERE rn = 1
    """,
)
def q19_cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").asc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# q24 monthly revenue trend with month-over-month delta: date_trunc to
# month + lag window. Division avoided in the delta (exact decimal sub).
# ---------------------------------------------------------------------------
@query(
    "q24_monthly_revenue_trend",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT
      month,
      CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
      CAST(ROUND(rev - lag(rev) OVER (ORDER BY month), 2) AS DOUBLE) AS mom_delta
    FROM m
    """,
)
def q24_monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    m = orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.sum(_dec("o_totalprice", 12)).alias("rev")
    )
    # ~84 months total: a single-partition lag window over the AGGREGATED
    # series is fine at any source scale (cardinality is months, not rows)
    w = Window.orderBy("month")
    return m.select(
        "month",
        F.round(F.col("rev"), 2).cast("double").alias("revenue"),
        F.round(F.col("rev") - F.lag("rev").over(w), 2).cast("double").alias("mom_delta"),
    )


# ---------------------------------------------------------------------------
# q27 cube: order counts over ALL subsets of (orderstatus, orderpriority)
# — 4 grouping sets in one Expand+Aggregate pass (one shuffle).
# ---------------------------------------------------------------------------
@query(
    "q27_cube_order_counts",
    oracle="""
    SELECT
      COALESCE(o_orderstatus, 'ALL') AS status,
      CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q27_cube_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("o_orderpriority").alias("__g"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.when(F.col("__g") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# q26 unpivot via stack(): the q16 pivot reversed back to long form —
# (bucket, event_type, total) rows. Pivot + unpivot round-trip closes
# the reshaping surface; stack is pure Project (no shuffle).
# ---------------------------------------------------------------------------
@query(
    "q26_unpivot_events",
    oracle="""
    SELECT
      user_id % 10 AS user_bucket,
      event_type,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q26_unpivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    # Pivot WITHOUT q16's zero-fill: absent (bucket, type) combinations
    # stay NULL and are dropped after the stack, while genuine zero sums
    # (possible with negative event values) survive — matching the
    # long-form GROUP BY, which keeps a row for true zeros but has none
    # for absent combinations.
    wide = (
        events.select(
            (F.col("user_id") % 10).alias("user_bucket"),
            "event_type",
            _dec("value", 12).alias("v"),
        )
        .groupBy("user_bucket")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum("v"))
    )
    stack_expr = "stack({n}, {args}) AS (event_type, total_value)".format(
        n=len(_EVENT_TYPES),
        args=", ".join(f"'{t}', {t}" for t in _EVENT_TYPES),
    )
    return (
        wide.selectExpr("user_bucket", stack_expr)
        .filter(F.col("total_value").isNotNull())
        .select(
            "user_bucket",
            "event_type",
            F.round("total_value", 2).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# q09 exact percentiles: median/p90 order value per priority. Spark's
# exact `percentile` uses the same linear interpolation as DuckDB's
# quantile_cont — verified bitwise-identical on this data.
# ---------------------------------------------------------------------------
@query(
    "q09_order_value_percentiles",
    oracle="""
    SELECT
      o_orderpriority,
      quantile_cont(o_totalprice, 0.5) AS p50,
      quantile_cont(o_totalprice, 0.9) AS p90,
      COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def q09_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# q03 shipping priority (TPC-H Q3 shape): selective date predicates on both
# join sides (pushed into both scans), 3-way join, agg, deterministic top-k.
# ---------------------------------------------------------------------------
@query(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey, revenue, o_orderdate FROM (
      SELECT
        l.l_orderkey,
        CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                       * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
        SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS rev_exact,
        o.o_orderdate
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15'
        AND l.l_shipdate > TIMESTAMP '1998-03-15'
      GROUP BY l.l_orderkey, o.o_orderdate
      ORDER BY rev_exact DESC, l_orderkey ASC
      LIMIT 10
    )
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev = _dec("l_extendedprice", 12) * (F.lit(1) - _dec("l_discount", 4))
    agg = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("rev_exact"))
    )
    return (
        agg.orderBy(F.col("rev_exact").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", _money(F.col("rev_exact"), "revenue"), "o_orderdate")
    )


# ---------------------------------------------------------------------------
# q06 forecast revenue change (TPC-H Q6 shape): pure selective-filter
# aggregate — the predicate-pushdown/row-group-pruning showcase: the plan
# must be FileScan(with PushedFilters) -> partial agg -> final agg.
# ---------------------------------------------------------------------------
@query(
    "q06_forecast_revenue",
    oracle="""
    SELECT
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue_delta,
      COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money(F.sum(_dec("l_extendedprice", 12) * _dec("l_discount", 4)), "revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q07 nation-to-nation trade flows (TPC-H Q7 shape): the SAME dimension
# (nation) joined twice under different aliases — supplier nation ×
# customer nation — plus a year extraction. Exercises supplier.
# ---------------------------------------------------------------------------
@query(
    "q07_nation_trade_flows",
    oracle="""
    SELECT
      sn.n_name AS supp_nation,
      cn.n_name AS cust_nation,
      CAST(year(l.l_shipdate) AS INT) AS ship_year,
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_9', 'NATION_11') AND cn.n_name IN ('NATION_9', 'NATION_11')
      AND sn.n_name <> cn.n_name
    GROUP BY 1, 2, 3
    """,
)
def q07_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_9", "NATION_11"))
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_9", "NATION_11"))
    rev = _dec("l_extendedprice", 12) * (F.lit(1) - _dec("l_discount", 4))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(_money(F.sum(rev), "volume"))
    )


# ---------------------------------------------------------------------------
# q08 array aggregation: per customer segment, the SORTED set of order
# priorities used (collect_set → sort_array for deterministic arrays).
# ---------------------------------------------------------------------------
@query(
    "q08_priority_sets",
    oracle="""
    SELECT
      c.c_mktsegment,
      array_to_string(list_sort(list(DISTINCT o.o_orderpriority)), '|') AS priorities,
      COUNT(DISTINCT o.o_orderpriority) AS n_priorities
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def q08_priority_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            # the sorted set is built as an ARRAY (collect_set+sort_array)
            # and serialized to a string only for the cross-engine compare
            # (array/list dtypes round-trip differently through pandas)
            F.concat_ws("|", F.sort_array(F.collect_set("o_orderpriority"))).alias(
                "priorities"
            ),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
    )


# ---------------------------------------------------------------------------
# q25 ranking/navigation window showcase: lag, lead, ntile, rank,
# dense_rank, percent_rank, cume_dist and a bounded-rows frame min/max
# in ONE pass over one partitioned sort (priority × (price, orderkey) —
# a total order, so peer groups are single rows and every function is
# deterministic cross-engine). One shuffle, no global sort.
# ---------------------------------------------------------------------------
@query(
    "q25_window_showcase",
    oracle="""
    SELECT
      o_orderpriority, o_orderkey, o_totalprice,
      lag(o_totalprice) OVER w AS prev_price,
      lead(o_totalprice) OVER w AS next_price,
      CAST(ntile(4) OVER w AS BIGINT) AS price_quartile,
      CAST(rank() OVER w AS BIGINT) AS price_rank,
      CAST(dense_rank() OVER w AS BIGINT) AS price_dense_rank,
      percent_rank() OVER w AS price_pct_rank,
      cume_dist() OVER w AS price_cume_dist,
      min(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS min_last3,
      max(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS max_last3
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
)
def q25_window_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    frame3 = w.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).cast("bigint").alias("price_quartile"),
        F.rank().over(w).cast("bigint").alias("price_rank"),
        F.dense_rank().over(w).cast("bigint").alias("price_dense_rank"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
        F.min("o_totalprice").over(frame3).alias("min_last3"),
        F.max("o_totalprice").over(frame3).alias("max_last3"),
    )


# ---------------------------------------------------------------------------
# q29 decorrelated scalar subquery: orders strictly above their own
# customer's average order value. The correlated form (one subquery per
# row) decorrelates into a join against a per-customer aggregate —
# Catalyst's own rewrite, expressed explicitly. The average is an exact
# decimal sum cast to double then divided by an exact count, so both
# engines compare against the identical IEEE value — and is emitted
# RAW: rounding a computed double is the one non-portable step (Spark
# rounds via shortest-repr BigDecimal, DuckDB via scaled arithmetic;
# they disagree on half-boundary ulps).
# ---------------------------------------------------------------------------
@query(
    "q29_orders_above_customer_avg",
    oracle="""
    WITH a AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
      FROM orders GROUP BY 1
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           a.avg_price AS cust_avg
    FROM orders o JOIN a ON o.o_custkey = a.o_custkey
    WHERE o.o_totalprice > a.avg_price
    """,
)
def q29_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    avg = orders.groupBy("o_custkey").agg(
        (F.sum(_dec("o_totalprice", 12)).cast("double") / F.count(F.lit(1))).alias(
            "avg_price"
        )
    )
    return (
        orders.join(avg, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("avg_price").alias("cust_avg"),
        )
    )


# ---------------------------------------------------------------------------
# q31 SQL-authored query: the same engine driven entirely through
# spark.sql over registered temp views — the SQL surface is first-class
# next to the DataFrame API (identical Catalyst plan either way).
# ---------------------------------------------------------------------------
@query(
    "q31_sql_surface",
    oracle="""
    SELECT
      n.n_name AS nation,
      COUNT(DISTINCT c.c_custkey) AS n_customers,
      CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    HAVING COUNT(*) >= 10
    """,
)
def q31_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer", "nation"):
        load_table(spark, t, sf_dir).createOrReplaceTempView(f"__q31_{t}")
    return spark.sql(
        """
        SELECT
          n.n_name AS nation,
          COUNT(DISTINCT c.c_custkey) AS n_customers,
          CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
        FROM __q31_orders o
        JOIN __q31_customer c ON o.o_custkey = c.c_custkey
        JOIN __q31_nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        HAVING COUNT(*) >= 10
        """
    )


# ---------------------------------------------------------------------------
# q32 salted join under the oracle gate: the lineitem->orders join runs
# through operators/skew.salted_join (deterministic md5-derived salt on
# the join key, small side exploded 8x) and must produce EXACTLY the
# plain join's aggregate — value-level proof that salting changes the
# shuffle layout, never the result. At scale this is the fallback for
# a hot key AQE can't split.
# ---------------------------------------------------------------------------
@query(
    "q32_salted_join_parity",
    oracle="""
    SELECT
      o.o_orderpriority,
      COUNT(*) AS n_lines,
      CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q32_salted_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.skew import salted_join

    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(li, orders, on=["o_orderkey"], salt_factor=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        _money(F.sum(_dec("l_extendedprice", 12)), "revenue"),
    )


# ---------------------------------------------------------------------------
# q33 data-quality profile (operators/quality.dq_profile): per-column
# row/null/distinct counts from ONE aggregate over one scan + stack to
# long form — the DQ summary every ingest gate runs, without N
# per-column jobs. Counts only (stringified extrema don't round-trip
# engines).
# ---------------------------------------------------------------------------
_DQ_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"]


@query(
    "q33_dq_profile_orders",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column, COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM orders"""
        for c in _DQ_COLS
    ),
)
def q33_dq_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.quality import dq_profile

    return dq_profile(load_table(spark, "orders", sf_dir), _DQ_COLS)


# ---------------------------------------------------------------------------
# q35 GROUPING SETS via the native DataFrame API (Spark 4's
# groupingSets): two disjoint one-dimension aggregates of orders in a
# SINGLE Expand+Aggregate pass — one scan + one shuffle where separate
# groupBys would scan twice and union. grouping() flags disambiguate
# which set a row belongs to (a real NULL in a dim would otherwise be
# indistinguishable from "aggregated over").
# ---------------------------------------------------------------------------
@query(
    "q35_grouping_sets",
    oracle="""
    SELECT
      CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END
        AS priority,
      CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END
        AS status,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
)
def q35_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"]],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money(F.sum(_dec("o_totalprice", 12)), "revenue"),
            F.grouping("o_orderpriority").alias("__gp"),
            F.grouping("o_orderstatus").alias("__gs"),
        )
        .select(
            F.when(F.col("__gp") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            F.when(F.col("__gs") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            "n_orders",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# q74 trailing 7-day revenue via a RANGE-interval window frame (the
# time-based frame q25's ROWS frames don't cover): per-priority daily
# totals, then a calendar-day range frame so gaps in the date series
# are handled by the FRAME, not by spine densification. Spark orders by
# integer epoch-day with rangeBetween(-6, 0) == DuckDB's RANGE BETWEEN
# INTERVAL 6 DAYS PRECEDING. Decimal-exact within the frame, rounded
# once at the end.
# ---------------------------------------------------------------------------
@query(
    "q74_trailing_7d_revenue",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority,
           CAST(d AS TIMESTAMP) AS day,
           CAST(ROUND(rev, 2) AS DOUBLE) AS day_revenue,
           CAST(ROUND(SUM(rev) OVER (
             PARTITION BY o_orderpriority ORDER BY d
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
           ), 2) AS DOUBLE) AS trailing_7d
    FROM daily
    """,
)
def q74_trailing_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, "orders", sf_dir)
    daily = orders.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("d")
    ).agg(F.sum(_dec("o_totalprice", 12)).alias("rev"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "o_orderpriority",
        F.col("d").cast("timestamp").alias("day"),
        _money(F.col("rev"), "day_revenue"),
        _money(F.sum("rev").over(w), "trailing_7d"),
    )


# ---------------------------------------------------------------------------
# q75 fuzzy part-name matching (record linkage): first-token blocking
# turns the O(n^2) levenshtein join into per-block equi-joins; exact
# edit distance verifies candidates (precision 1.0, recall =
# in-block pairs — the documented ER tradeoff). All JVM built-ins.
# ---------------------------------------------------------------------------
@query(
    "q75_fuzzy_part_names",
    oracle="""
    WITH d AS (SELECT DISTINCT p_name AS name FROM part),
    b AS (SELECT name, lower(string_split_regex(name, '\\s+')[1]) AS w FROM d)
    SELECT a.name AS name_a, c.name AS name_b,
           CAST(levenshtein(a.name, c.name) AS BIGINT) AS lev
    FROM b a JOIN b c ON a.w = c.w AND a.name < c.name
    WHERE levenshtein(a.name, c.name) <= 3
    """,
)
def q75_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.linkage import blocked_fuzzy_pairs

    part = load_table(spark, "part", sf_dir)
    return blocked_fuzzy_pairs(part.select("p_name"), "p_name", max_distance=3)


# ---------------------------------------------------------------------------
# q77 bloom-pruned semi-join: lineitems of URGENT orders. The bloom of
# urgent o_orderkeys (128 KiB for 1M bits) prunes the fact scan BEFORE
# the semi-join shuffle; the exact left_semi over survivors makes the
# result identical to a plain semi-join (the oracle) for any bloom size.
# This is the runtime-filter pattern for facts × medium dims whose key
# set outgrows an exact broadcast.
# ---------------------------------------------------------------------------
@query(
    "q77_bloom_semi_join",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag
    """,
)
def q77_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.bloom import bloom_semi_join

    li = load_table(spark, "lineitem", sf_dir)
    urgent = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pruned = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    return pruned.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        _money(F.sum(_dec("l_quantity", 12)), "sum_qty"),
    )


# ---------------------------------------------------------------------------
# q82 argmin join (TPC-H Q2 shape on the tables available): the
# supplier offering each part's cheapest average lineitem unit price,
# with DETERMINISTIC tie-breaks. min_by/arg_min would be
# tie-nondeterministic (2-decimal prices collide); the canonical form
# is a row_number over (part) ordered by (price, suppkey) — a
# PARTITIONED window on the same key the per-(part,supp) aggregate
# shuffles on, so AQE reuses the partitioning. Dims broadcast.
# ---------------------------------------------------------------------------
@query(
    "q82_cheapest_supplier_per_part",
    oracle="""
    WITH offer AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS unit_price
      FROM lineitem
      GROUP BY 1, 2
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_partkey ORDER BY unit_price, l_suppkey) AS rn
      FROM offer
    )
    SELECT p.p_partkey, p.p_brand, s.s_name, b.unit_price
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    WHERE b.rn = 1
    """,
)
def q82_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    offer = li.groupBy("l_partkey", "l_suppkey").agg(
        (
            F.sum(_dec("l_extendedprice", 12)).cast("double")
            / F.sum(_dec("l_quantity", 12)).cast("double")
        ).alias("unit_price")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    best = offer.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_brand", "s_name", "unit_price")
    )


# ---------------------------------------------------------------------------
# q102 exact distributed quantiles of l_extendedprice: the scale-safe
# exact-percentile path (range-bucketed two-phase rank — never a whole
# group's values in one aggregation buffer, never a single-task global
# sort; see operators/sketches.exact_quantiles). The oracle is the
# plain ORDER BY + ROW_NUMBER definition — equality proves the
# distributed decomposition computes textbook type-1 quantiles. One
# output row per requested prob on both sides (colliding ranks fan
# out, never collapse).
# ---------------------------------------------------------------------------
_QUANT_PROBS = [0.25, 0.5, 0.75, 0.9, 0.99]


def _q102_oracle() -> str:
    plist = ", ".join(str(p) for p in _QUANT_PROBS)
    return f"""
    WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS value FROM lineitem),
    r AS (
      SELECT value,
             ROW_NUMBER() OVER (ORDER BY value) AS rank,
             COUNT(*) OVER () AS n
      FROM v
    ),
    t AS (SELECT UNNEST([{plist}]) AS p)
    SELECT CAST(t.p AS DOUBLE) AS p,
           CAST(r.rank AS BIGINT) AS rank, r.value
    FROM t JOIN r ON r.rank = GREATEST(1, CAST(CEIL(CAST(t.p AS DOUBLE) * r.n) AS BIGINT))
    """


@query("q102_exact_quantiles", oracle=_q102_oracle())
def q102_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.sketches import exact_quantiles

    li = load_table(spark, "lineitem", sf_dir)
    return exact_quantiles(li, "l_extendedprice", _QUANT_PROBS)


# ---------------------------------------------------------------------------
# q120 suppliers solely blamed for returns (TPC-H Q21 shape): the
# EXISTS / NOT EXISTS correlated-subquery chain as semi-join +
# anti-join. A supplier is "blamed" for an order when it shipped a
# returned ('R') line in a finished multi-supplier order and NO other
# supplier in that order had a return. Scale: both subqueries are
# equi-joins on l_orderkey (the natural co-partitioning); the
# supplier dim join broadcasts; TakeOrderedAndProject caps the output.
# ---------------------------------------------------------------------------
@query(
    "q120_blamed_suppliers",
    oracle="""
    WITH fo AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'),
    l1 AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN fo ON l.l_orderkey = fo.o_orderkey
      WHERE l.l_returnflag = 'R'
    ),
    blamed AS (
      SELECT l1.l_orderkey, l1.l_suppkey
      FROM l1
      WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM blamed b JOIN supplier s ON b.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 20
    """,
)
def q120_blamed_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    fo = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l1 = (
        li.join(fo, li.l_orderkey == fo.o_orderkey)
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = li.select(
        F.col("l_orderkey").alias("__ok"),
        F.col("l_suppkey").alias("__sk"),
        "l_returnflag",
    )
    with_other = l1.join(
        others,
        (l1.l_orderkey == others.__ok) & (l1.l_suppkey != others.__sk),
        "left_semi",
    )
    blamed = with_other.join(
        others.filter(F.col("l_returnflag") == "R"),
        (with_other.l_orderkey == others.__ok)
        & (with_other.l_suppkey != others.__sk),
        "left_anti",
    )
    return (
        blamed.join(F.broadcast(supp), blamed.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q121 high-balance customers with no failed orders (TPC-H Q22 shape):
# scalar-subquery threshold + NOT EXISTS anti-join. The above-average
# test runs as EXACT cross-multiplication in decimal integers
# (acctbal * n > sum) — no double division anywhere near the
# comparison boundary. Scale: the scalar aggregate broadcasts; the
# anti-join is an equi-join on custkey.
# ---------------------------------------------------------------------------
@query(
    "q121_quiet_rich_customers",
    oracle="""
    WITH t AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0.0
    ),
    q AS (
      SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
      FROM customer c, t
      WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * t.n > t.s
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        )
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS total_acctbal
    FROM q GROUP BY c_mktsegment
    """,
)
def q121_quiet_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    t = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_dec("c_acctbal", 12)).cast("decimal(22,2)").alias("__s"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    failed = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    q = (
        cust.crossJoin(F.broadcast(t))
        .filter(_dec("c_acctbal", 12) * F.col("__n") > F.col("__s"))
        .join(failed, cust.c_custkey == failed.o_custkey, "left_anti")
    )
    return q.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        _money(F.sum(_dec("c_acctbal", 12)), "total_acctbal"),
    )


# ---------------------------------------------------------------------------
# q123 exact equi-depth histogram of l_extendedprice (16 bins): the
# Spark side runs the range-bucketed two-phase rank (no global sort);
# the oracle the textbook ROW_NUMBER ORDER BY — equality proves the
# decomposition. Bin assignment is pure integer arithmetic; per-bin
# aggregates are tie-order independent.
# ---------------------------------------------------------------------------
_HIST_BINS = 16


@query(
    "q123_equi_depth_histogram",
    oracle=f"""
    WITH r AS (
      SELECT l_extendedprice AS v,
             ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rk
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
    b AS (
      SELECT CAST((rk - 1) * {_HIST_BINS} // n.n + 1 AS BIGINT) AS bin, v
      FROM r, n
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(v) AS lo, MAX(v) AS hi,
           round(CAST(SUM(CAST(v AS DECIMAL(22,2))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_value
    FROM b GROUP BY bin
    """,
)
def q123_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.sketches import equi_depth_histogram

    li = load_table(spark, "lineitem", sf_dir)
    return equi_depth_histogram(li, "l_extendedprice", n_bins=_HIST_BINS)


# ---------------------------------------------------------------------------
# q143 referential-integrity audit across the whole star schema: one
# row per FK relation with row/orphan counts — the cross-table
# data-quality gate next to q33's single-table profile (the reference
# validates dimensions before fact assembly; this is that check as a
# first-class query). Each relation is one left-anti equi-join
# against a broadcast-able key set; output is |relations| rows.
# ---------------------------------------------------------------------------
_FK_RELATIONS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _q143_oracle() -> str:
    parts = []
    for i, (ft, fk, dt, dk) in enumerate(_FK_RELATIONS):
        parts.append(
            f"""SELECT CAST({i} AS BIGINT) AS rel_idx,
       '{ft}.{fk} -> {dt}.{dk}' AS relation,
       CAST((SELECT COUNT(*) FROM {ft}) AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(*) FROM {ft}
             WHERE {fk} IS NOT NULL
               AND {fk} NOT IN (SELECT {dk} FROM {dt})) AS BIGINT) AS n_orphans,
       CAST((SELECT COUNT(*) FROM {ft} WHERE {fk} IS NULL) AS BIGINT)
         AS n_null_fk"""
        )
    return "\nUNION ALL\n".join(parts)


@query("q143_referential_integrity", oracle=_q143_oracle())
def q143_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for i, (ft, fk, dt, dk) in enumerate(_FK_RELATIONS):
        fact = load_table(spark, ft, sf_dir)
        dim = load_table(spark, dt, sf_dir).select(F.col(dk).alias("__k")).distinct()
        orphans = (
            fact.filter(F.col(fk).isNotNull())
            .join(F.broadcast(dim), fact[fk] == F.col("__k"), "left_anti")
        )
        row = fact.agg(
            F.lit(i).cast("bigint").alias("rel_idx"),
            F.lit(f"{ft}.{fk} -> {dt}.{dk}").alias("relation"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col(fk).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_fk"),
        ).crossJoin(
            F.broadcast(
                orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
            )
        ).select("rel_idx", "relation", "n_rows", "n_orphans", "n_null_fk")
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# q144 primary-key uniqueness audit — q143's companion: one row per
# table/PK with row count, distinct-key count and duplicated-key
# count. A dimension with duplicate natural keys silently fans out
# every fact join (the reference's validate-before-load discipline).
# ---------------------------------------------------------------------------
_PK_TABLES = [
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]


def _q144_oracle() -> str:
    parts = []
    for i, (t, k) in enumerate(_PK_TABLES):
        parts.append(
            f"""SELECT CAST({i} AS BIGINT) AS tbl_idx, '{t}.{k}' AS pk,
       CAST((SELECT COUNT(*) FROM {t}) AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(DISTINCT {k}) FROM {t}) AS BIGINT) AS n_distinct,
       CAST((SELECT COUNT(*) FROM
             (SELECT {k} FROM {t} GROUP BY {k} HAVING COUNT(*) > 1)) AS BIGINT)
         AS n_dup_keys"""
        )
    return "\nUNION ALL\n".join(parts)


@query("q144_pk_uniqueness", oracle=_q144_oracle())
def q144_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for i, (t, k) in enumerate(_PK_TABLES):
        df = load_table(spark, t, sf_dir)
        dups = (
            df.groupBy(k)
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > 1)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_keys"))
        )
        row = (
            df.agg(
                F.lit(i).cast("bigint").alias("tbl_idx"),
                F.lit(f"{t}.{k}").alias("pk"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.countDistinct(k).cast("bigint").alias("n_distinct"),
            )
            .crossJoin(F.broadcast(dups))
            .select("tbl_idx", "pk", "n_rows", "n_distinct", "n_dup_keys")
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# q175 small-quantity-order revenue (TPC-H Q17 shape): yearly revenue
# lost if orders below 20% of a part's average quantity stopped — the
# classic correlated scalar subquery, DECORRELATED into a per-part
# aggregate joined back (what Catalyst's decorrelation does; here the
# shape is explicit and broadcast because the brand slice is small).
# The 20%-of-average comparison is integer cross-multiplication
# (quantities are integral: q < 0.2·sum/n ⟺ 5·q·n < sum), never a
# divided average — engine-exact with zero float comparisons.
# ---------------------------------------------------------------------------
_Q175_BRAND = "Brand#4"


@query(
    "q175_small_quantity_revenue",
    oracle=f"""
    WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = '{_Q175_BRAND}'),
    li AS (
      SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS q,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) AS ep
      FROM lineitem l JOIN pk ON l.l_partkey = pk.p_partkey
    ),
    st AS (
      SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM li GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           round(CAST(SUM(li.ep) AS DOUBLE) / CAST(7.0 AS DOUBLE), 2)
             AS avg_yearly
    FROM li JOIN st ON li.l_partkey = st.l_partkey
    WHERE 5 * li.q * st.n < st.sq
    """,
)
def q175_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, "part", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    pk = part.filter(F.col("p_brand") == _Q175_BRAND).select(
        F.col("p_partkey").alias("l_partkey")
    )
    lib = li.join(F.broadcast(pk), "l_partkey").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("__q"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("__ep"),
    )
    st = lib.groupBy("l_partkey").agg(
        F.sum("__q").cast("bigint").alias("__sq"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    sel = lib.join(F.broadcast(st), "l_partkey").filter(
        F.lit(5) * F.col("__q") * F.col("__n") < F.col("__sq")
    )
    return sel.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(F.sum("__ep").cast("double") / F.lit(7.0), 2).alias("avg_yearly"),
    )


# ---------------------------------------------------------------------------
# q177 waiting suppliers (TPC-H Q21 shape): suppliers who were the ONLY
# late supplier on a multi-supplier finished order. The classic form is
# EXISTS(other supplier on order) AND NOT EXISTS(other LATE supplier on
# order) — two correlated self-joins on a 100TB fact. DECORRELATED here
# into per-(order, supplier) lateness flags and ONE per-order aggregate
# (n_suppliers, n_late_suppliers) joined back: a single extra shuffle on
# l_orderkey instead of two lineitem⨝lineitem self-joins. "Late" adapts
# the ref schema (no receipt/commit dates): ship lag > 90 days.
# ---------------------------------------------------------------------------
@query(
    "q177_waiting_suppliers",
    oracle="""
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) > 90
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    ps AS (
      SELECT l_orderkey, l_suppkey, MAX(late) AS supp_late
      FROM lo GROUP BY l_orderkey, l_suppkey
    ),
    po AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(supp_late) AS n_late
      FROM ps GROUP BY l_orderkey
    )
    SELECT s.s_name, n.n_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM ps
    JOIN po ON ps.l_orderkey = po.l_orderkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE ps.supp_late = 1 AND po.n_supp > 1 AND po.n_late = 1
    GROUP BY s.s_name, n.n_name
    """,
)
def q177_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    fo = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    lo = li.join(fo, li.l_orderkey == fo.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90)
        .cast("int")
        .alias("__late"),
    )
    per_supp = lo.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("__late").alias("__supp_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_supp"),
        F.sum("__supp_late").alias("__n_late"),
    )
    waiting = (
        per_supp.filter(F.col("__supp_late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("__n_supp") > 1) & (F.col("__n_late") == 1))
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", "n_name", "numwait")
    )


# ---------------------------------------------------------------------------
# q178 national market share (TPC-H Q8 shape): NATION_2's share of
# revenue among orders placed by ASIA-region customers, per order year.
# Conditional-sum ratio over a 6-table join; dims broadcast, the single
# shuffle is the year groupBy. Sums are decimal-exact; the share is the
# IEEE double quotient of the two exact sums, round(4) — deterministic
# in both engines.
# ---------------------------------------------------------------------------
@query(
    "q178_market_share",
    oracle="""
    WITH rev AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region r ON nc.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT o_year,
      CAST(ROUND(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_2'
                                   THEN volume END), 0), 2) AS DOUBLE)
        AS nation_volume,
      CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_volume,
      ROUND(CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_2'
                                   THEN volume END), 0) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
    FROM rev GROUP BY o_year
    """,
)
def q178_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    asia_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select(F.col("n_nationkey").alias("__mkt_nk"))
    )
    supp_nation = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    volume = _dec("l_extendedprice", 12) * (F.lit(1) - _dec("l_discount", 4))
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(asia_nations),
            cust.c_nationkey == F.col("__mkt_nk"),
        )
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("__vol"),
            "supp_nation",
        )
    )
    nat_sum = F.coalesce(
        F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("__vol"))),
        F.lit(0),
    )
    return rev.groupBy("o_year").agg(
        F.round(nat_sum, 2).cast("double").alias("nation_volume"),
        _money(F.sum("__vol"), "total_volume"),
        F.round(
            nat_sum.cast("double") / F.sum("__vol").cast("double"), 4
        ).alias("mkt_share"),
    )


# ---------------------------------------------------------------------------
# q179 product-type profit (TPC-H Q9 shape, adapted: no partsupp table,
# so supply cost is modeled as 10% of p_retailprice — decimal-exact
# 0.10 multiply, never a float). Profit by supplier nation × order
# year for parts whose name contains 'gear'. Scale: the part-name
# filter prunes the fact via a broadcast semi-ish inner join before
# the wide joins; dims broadcast; one shuffle on (nation, year).
# ---------------------------------------------------------------------------
@query(
    "q179_product_profit",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           CAST(ROUND(SUM(
             CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
             - CAST(p.p_retailprice AS DECIMAL(12,2))
               * CAST(0.10 AS DECIMAL(3,2))
               * CAST(l.l_quantity AS BIGINT)
           ), 2) AS DOUBLE) AS profit,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY ns.n_name, o_year
    """,
)
def q179_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    gear = part.filter(F.col("p_name").contains("gear")).select(
        "p_partkey", _dec("p_retailprice", 12).alias("__retail")
    )
    supp_nation = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    profit = _dec("l_extendedprice", 12) * (
        F.lit(1) - _dec("l_discount", 4)
    ) - F.col("__retail") * F.lit("0.10").cast("decimal(3,2)") * F.col(
        "l_quantity"
    ).cast("bigint")
    return (
        li.join(F.broadcast(gear), li.l_partkey == gear.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .groupBy("supp_nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            _money(F.sum(profit), "profit"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q180 customer order-count distribution (TPC-H Q13 shape): LEFT join
# with a join-time predicate (non-urgent orders only — NULL-extends
# customers whose only orders are urgent), per-customer count, then a
# second aggregation into the count histogram. Two shuffles: custkey,
# then the tiny c_count key. The histogram shuffle moves ~#distinct
# counts rows per task after partial aggregation.
# ---------------------------------------------------------------------------
@query(
    "q180_custdist",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q180_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


# ---------------------------------------------------------------------------
# q185 important parts (TPC-H Q11 shape): parts whose discounted revenue
# exceeds 1.25x the average part's revenue — the classic "HAVING agg >
# scalar-subquery-fraction" form. Decorrelated: ONE per-part aggregate +
# a broadcast single-row (total, n_parts) aggregate; the threshold
# compare is an integer cross-multiplication over exact decimals
# (pv * n_parts * 4 > 5 * total), so no float division ever happens —
# deterministic at any scale, and the grouped aggregate is the only
# shuffle. Ref parity anchor: SURVEY §2.5 A1 (global scalar aggregate
# feeding a filter, jobs/final_dim_load.py:103-104) generalized to the
# fraction-of-total HAVING shape.
# ---------------------------------------------------------------------------
@query(
    "q185_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS v
      FROM lineitem GROUP BY l_partkey
    ),
    g AS (SELECT SUM(v) AS gv, COUNT(*) AS np FROM pv)
    SELECT pv.l_partkey AS p_partkey, p.p_name,
           CAST(ROUND(pv.v, 2) AS DOUBLE) AS part_value
    FROM pv CROSS JOIN g
    JOIN part p ON pv.l_partkey = p.p_partkey
    WHERE pv.v * np * 4 > 5 * gv
    """,
)
def q185_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    pv = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
        ).alias("__v")
    )
    g = pv.agg(
        F.sum("__v").alias("__gv"), F.count(F.lit(1)).alias("__np")
    )
    return (
        pv.crossJoin(F.broadcast(g))
        .filter(F.col("__v") * F.col("__np") * 4 > F.lit(5) * F.col("__gv"))
        .join(F.broadcast(part), pv.l_partkey == part.p_partkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            F.round(F.col("__v"), 2).cast("double").alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# q186 top supplier (TPC-H Q15 shape): supplier(s) with the MAXIMUM
# quarterly revenue — the classic "revenue view + WHERE rev = (SELECT
# max)" form. The per-supplier revenue is decimal-exact, so the
# equality against the broadcast single-row max is safe (no float
# compare); ties all surface, exactly like the spec's intent. One
# shuffle (supplier groupBy); the max is a broadcast single-row agg.
# ---------------------------------------------------------------------------
@query(
    "q186_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    ),
    m AS (SELECT MAX(total_rev) AS mx FROM rev)
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(rev.total_rev, 2) AS DOUBLE) AS total_rev
    FROM rev CROSS JOIN m
    JOIN supplier s ON rev.l_suppkey = s.s_suppkey
    WHERE rev.total_rev = m.mx
    """,
)
def q186_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            ).alias("__rev")
        )
    )
    m = rev.agg(F.max("__rev").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(m))
        .filter(F.col("__rev") == F.col("__mx"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("__rev"), 2).cast("double").alias("total_rev"),
        )
    )


# ---------------------------------------------------------------------------
# q187 supplier diversity (TPC-H Q16 shape): distinct-supplier counts
# per (brand, size band) for non-STANDARD parts, EXCLUDING suppliers in
# a complaint set (here: negative account balance) — the classic NOT IN
# subquery, expressed as a left_anti join (never a nullable NOT IN, and
# never a broadcast of the big side). The (part, supplier) pairs come
# from lineitem (this schema has no partsupp); pair-distinct first so
# the count-distinct shuffle carries one row per relationship.
# ---------------------------------------------------------------------------
@query(
    "q187_supplier_diversity",
    oracle="""
    WITH excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
    rel AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey
      FROM lineitem l
      WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM excl)
    )
    SELECT p.p_brand,
           CAST((p.p_size - 1) // 10 AS INTEGER) AS size_band,
           CAST(COUNT(DISTINCT rel.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM rel JOIN part p ON rel.l_partkey = p.p_partkey
    WHERE p.p_type <> 'STANDARD'
    GROUP BY p.p_brand, size_band
    """,
)
def q187_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    excl = supp.filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    rel = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(excl), "l_suppkey", "left_anti")
        .distinct()
    )
    pt = part.filter(F.col("p_type") != "STANDARD").select(
        "p_partkey",
        "p_brand",
        (((F.col("p_size") - 1) / 10).cast("int")).alias("size_band"),
    )
    return (
        rel.join(F.broadcast(pt), rel.l_partkey == pt.p_partkey)
        .groupBy("p_brand", "size_band")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q188 large-volume orders (TPC-H Q18 shape): orders whose total line
# quantity exceeds 180 units, with their customer — the classic
# "IN (GROUP BY ... HAVING)" form. Decorrelated to one lineitem
# aggregate (integer quantity sum, exact) that IS the probe side; the
# orders/customer joins hang off it. No window, no sort; the HAVING
# filter runs before any join so only qualifying orders shuffle onward.
# ---------------------------------------------------------------------------
@query(
    "q188_large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 180
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           big.sum_qty
    FROM big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q188_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# q189 bracket revenue (TPC-H Q19 shape): revenue from three disjunctive
# (brand, size-range, quantity-range) brackets — the classic
# OR-of-conjunctions predicate that tests DISJUNCT PUSHDOWN: the
# brand/size arms prune the part scan, the shared quantity envelope
# (1..50 here) pushes into the lineitem scan, and the residual OR
# evaluates post-join. Part side broadcast (already bracket-filtered).
# Revenue decimal-exact; one final single-row aggregate.
# ---------------------------------------------------------------------------
_Q189_BRACKETS = (
    ("Brand#1", 1, 10, 1, 15),
    ("Brand#2", 11, 25, 10, 30),
    ("Brand#3", 26, 50, 25, 50),
)


@query(
    "q189_bracket_revenue",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE {" OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {s0} AND {s1}"
        f" AND l.l_quantity BETWEEN {q0} AND {q1})"
        for b, s0, s1, q0, q1 in _Q189_BRACKETS
    )}
    """,
)
def q189_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    # Part-side arms form a pushable disjunction on (brand, size); the
    # bracket-filtered part side is tiny -> broadcast.
    part_pred = None
    for b, s0, s1, _q0, _q1 in _Q189_BRACKETS:
        arm = (F.col("p_brand") == b) & F.col("p_size").between(s0, s1)
        part_pred = arm if part_pred is None else (part_pred | arm)
    pt = part.filter(part_pred).select("p_partkey", "p_brand", "p_size")
    qlo = min(q0 for *_x, q0, _q1 in _Q189_BRACKETS)
    qhi = max(q1 for *_x, _q0, q1 in _Q189_BRACKETS)
    lif = li.filter(F.col("l_quantity").between(qlo, qhi)).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    joined = lif.join(F.broadcast(pt), lif.l_partkey == pt.p_partkey)
    full_pred = None
    for b, s0, s1, q0, q1 in _Q189_BRACKETS:
        arm = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(s0, s1)
            & F.col("l_quantity").between(q0, q1)
        )
        full_pred = arm if full_pred is None else (full_pred | arm)
    return joined.filter(full_pred).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
    )


# ---------------------------------------------------------------------------
# q190 dominant suppliers (TPC-H Q20 shape): suppliers who shipped MORE
# THAN 20% of some part's total shipped quantity — the nested
# "correlated aggregate threshold" form (spec: availqty > 1/2 of
# shipped; this schema has no partsupp, so the fraction applies to the
# per-(part, supplier) share). Decorrelated to two aggregates on the
# same shuffle key (l_partkey): per-(part, supplier) sums roll up to
# per-part totals, then an integer cross-multiplication (sp*5 > pq)
# picks dominants — no division, exact at any scale. The outer semi
# shape (suppliers WITH at least one dominant part) is the final tiny
# groupBy, joined to broadcast supplier/nation dims.
# ---------------------------------------------------------------------------
@query(
    "q190_dominant_suppliers",
    oracle="""
    WITH sp AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS spq
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    p AS (SELECT l_partkey, SUM(spq) AS pq FROM sp GROUP BY l_partkey)
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_dominant_parts
    FROM sp
    JOIN p ON sp.l_partkey = p.l_partkey
    JOIN supplier s ON sp.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE sp.spq * 5 > p.pq
    GROUP BY s.s_suppkey, s.s_name, n.n_name
    """,
)
def q190_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    sp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("__spq")
    )
    p = sp.groupBy("l_partkey").agg(F.sum("__spq").alias("__pq"))
    dom = sp.join(p, "l_partkey").filter(F.col("__spq") * 5 > F.col("__pq"))
    return (
        dom.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dominant_parts"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "n_dominant_parts")
    )


# ---------------------------------------------------------------------------
# q191 promo revenue share (TPC-H Q14 shape): per month of 1996, the
# percentage of revenue from PROMO-type parts — the conditional-sum
# ratio form. Both sums decimal-exact over the same rows; the share is
# ONE double division of exact sums, round(4). Part side broadcast;
# the month groupBy is the only shuffle.
# ---------------------------------------------------------------------------
@query(
    "q191_promo_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT CAST(EXTRACT(month FROM l.l_shipdate) AS INTEGER) AS ship_month,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2))) AS volume,
             p.p_type
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
    )
    SELECT ship_month,
      CAST(ROUND(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN volume END), 0), 2)
           AS DOUBLE) AS promo_revenue,
      CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_revenue,
      ROUND(CAST(100 AS DOUBLE)
            * CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO' THEN volume END), 0) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE), 4) AS promo_share_pct
    FROM rev GROUP BY ship_month
    """,
)
def q191_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.month("l_shipdate").alias("ship_month"),
            vol.alias("__vol"),
            "p_type",
        )
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("__vol"))).alias("__p")
    return (
        rev.groupBy("ship_month")
        .agg(promo, F.sum("__vol").alias("__t"))
        .select(
            "ship_month",
            F.round(F.coalesce(F.col("__p"), F.lit(0)), 2)
            .cast("double")
            .alias("promo_revenue"),
            F.round(F.col("__t"), 2).cast("double").alias("total_revenue"),
            F.round(
                F.lit(100).cast("double")
                * F.coalesce(F.col("__p"), F.lit(0)).cast("double")
                / F.col("__t").cast("double"),
                4,
            ).alias("promo_share_pct"),
        )
    )


# ---------------------------------------------------------------------------
# q197 Benford first-digit audit on l_extendedprice — the classic
# data-forensics screen (fabricated/synthetic numeric columns deviate
# from Benford's log distribution). Digit extraction is pure integer:
# price -> exact cents BIGINT -> first character of the integer's
# string (BIGINT->VARCHAR is identical across engines; no double
# formatting, no log10 of the value). Expected shares ln(1+1/d)/ln(10)
# are rounded to 8 digits on BOTH engines before the chi-square terms,
# so the one libm op is pinned before any arithmetic fan-out.
# ---------------------------------------------------------------------------
@query(
    "q197_benford_first_digit",
    oracle="""
    WITH cents AS (
      SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM lineitem
    ),
    d AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM cents
    ),
    obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs),
    terms AS (
      SELECT obs.digit, obs.n_obs,
             round(CAST(obs.n_obs AS DOUBLE) / CAST(tot.n AS DOUBLE), 8)
               AS obs_share,
             round(ln(CAST(1.0 AS DOUBLE)
                      + CAST(1.0 AS DOUBLE) / CAST(obs.digit AS DOUBLE))
                   / ln(CAST(10.0 AS DOUBLE)), 8) AS exp_share
      FROM obs, tot
    )
    SELECT digit, n_obs, obs_share, exp_share,
           round((obs_share - exp_share) * (obs_share - exp_share)
                 / exp_share, 8) AS chi2_term
    FROM terms
    """,
)
def q197_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    cents = li.select(
        (_dec("l_extendedprice", 12) * 100).cast("bigint").alias("__c")
    )
    obs = (
        cents.select(
            F.substring(F.col("__c").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").cast("bigint").alias("__n"))
    exp_share = F.round(
        F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
        / F.log(F.lit(10.0)),
        8,
    )
    terms = obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs").cast("double") / F.col("__n").cast("double"), 8).alias(
            "obs_share"
        ),
        exp_share.alias("exp_share"),
    )
    return terms.select(
        "digit",
        "n_obs",
        "obs_share",
        "exp_share",
        F.round(
            (F.col("obs_share") - F.col("exp_share"))
            * (F.col("obs_share") - F.col("exp_share"))
            / F.col("exp_share"),
            8,
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# q198 pairwise Welch t-test on l_extendedprice across l_returnflag
# groups — the two-sample significance screen for A/B-style dataset
# comparisons. Per-group moments (n, sum, sum-of-squares) are
# DECIMAL-exact (price as DECIMAL(12,2), squares as DECIMAL(28,4), so
# aggregation order cannot matter); the t statistic is then one fixed
# double-op chain per pair — mean difference over sqrt(v1/n1 + v2/n2)
# with the unbiased variance (ssq - sum^2/n)/(n-1) — and sqrt is
# correctly rounded (the one libm-safe root). The pair join is a
# 3-row broadcast self-join: bounded at any corpus size.
# ---------------------------------------------------------------------------
@query(
    "q198_welch_pairs",
    oracle="""
    WITH m AS (
      SELECT l_returnflag AS flag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
               AS s,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                           * CAST(l_extendedprice AS DECIMAL(12,2))
                           AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS ssq
      FROM lineitem GROUP BY 1
    ),
    pairs AS (
      SELECT a.flag AS flag_a, b.flag AS flag_b,
             a.n AS na, b.n AS nb,
             CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS ma,
             CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS mb,
             (CAST(a.ssq AS DOUBLE)
              - (CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE))
                / CAST(a.n AS DOUBLE)) / CAST(a.n - 1 AS DOUBLE) AS va,
             (CAST(b.ssq AS DOUBLE)
              - (CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE))
                / CAST(b.n AS DOUBLE)) / CAST(b.n - 1 AS DOUBLE) AS vb
      FROM m a JOIN m b ON a.flag < b.flag
    )
    SELECT flag_a, flag_b, na, nb,
           round(ma - mb, 4) AS mean_diff,
           round((ma - mb) / sqrt(va / CAST(na AS DOUBLE)
                                  + vb / CAST(nb AS DOUBLE)), 4) AS t_stat,
           abs((ma - mb) / sqrt(va / CAST(na AS DOUBLE)
                                + vb / CAST(nb AS DOUBLE)))
             > CAST(1.96 AS DOUBLE) AS significant
    FROM pairs
    """,
)
def q198_welch_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    price = _dec("l_extendedprice", 12)
    m = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(price).cast("decimal(38,2)").alias("s"),
        F.sum((price * price).cast("decimal(28,4)"))
        .cast("decimal(38,4)")
        .alias("ssq"),
    )
    a = m.select(*[F.col(c).alias(f"{c}_a") for c in m.columns])
    b = m.select(*[F.col(c).alias(f"{c}_b") for c in m.columns])
    pairs = a.join(F.broadcast(b), F.col("flag_a") < F.col("flag_b"))

    def _mv(side: str):
        s = F.col(f"s_{side}").cast("double")
        n = F.col(f"n_{side}").cast("double")
        ssq = F.col(f"ssq_{side}").cast("double")
        mean = s / n
        var = (ssq - (s * s) / n) / (F.col(f"n_{side}") - 1).cast("double")
        return mean, var

    ma, va = _mv("a")
    mb, vb = _mv("b")
    t = (ma - mb) / F.sqrt(
        va / F.col("n_a").cast("double") + vb / F.col("n_b").cast("double")
    )
    return pairs.select(
        F.col("flag_a"),
        F.col("flag_b"),
        F.col("n_a").alias("na"),
        F.col("n_b").alias("nb"),
        F.round(ma - mb, 4).alias("mean_diff"),
        F.round(t, 4).alias("t_stat"),
        (F.abs(t) > F.lit(1.96)).alias("significant"),
    )


# ---------------------------------------------------------------------------
# q200 delete-propagation audit (GDPR right-to-erasure dry run): given
# a deterministic forget-set of users (user_id % 7 = 0), count the
# rows each table would lose — events directly, orders via customer
# key, lineitem via the affected orders' keys. The governance
# complement of q143's referential-integrity audit: RI asks "do child
# rows dangle?", this asks "how far does a subject erasure cascade?".
# Scale: every hop is a keyed LEFT SEMI join (shuffle on the key, AQE
# handles skew); counts partial-aggregate map-side; no collects.
# ---------------------------------------------------------------------------
@query(
    "q200_delete_propagation",
    oracle="""
    WITH forget AS (SELECT DISTINCT user_id FROM events WHERE user_id % 7 = 0),
    ev AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS aff FROM events
      WHERE user_id IN (SELECT user_id FROM forget)
    ),
    od AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS aff FROM orders
      WHERE o_custkey IN (SELECT user_id FROM forget)
    ),
    li AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS aff FROM lineitem
      WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT user_id FROM forget))
    ),
    tot AS (
      SELECT 'events' AS table_name, (SELECT aff FROM ev) AS n_affected,
             CAST(COUNT(*) AS BIGINT) AS n_total FROM events
      UNION ALL
      SELECT 'orders', (SELECT aff FROM od), CAST(COUNT(*) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem', (SELECT aff FROM li), CAST(COUNT(*) AS BIGINT)
      FROM lineitem
    )
    SELECT table_name, n_affected, n_total,
           round(CAST(n_affected AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
             AS affected_share
    FROM tot
    """,
)
def q200_delete_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir)
    forget = events.select("user_id").filter(F.col("user_id") % 7 == 0).distinct()

    ev_aff = events.join(
        F.broadcast(forget), events["user_id"] == forget["user_id"], "left_semi"
    )
    od_aff = orders.join(
        F.broadcast(forget), orders["o_custkey"] == forget["user_id"], "left_semi"
    )
    li_aff = lineitem.join(
        od_aff.select("o_orderkey"),
        lineitem["l_orderkey"] == F.col("o_orderkey"),
        "left_semi",
    )

    def row(name: str, aff, tot) -> DataFrame:
        return (
            aff.agg(F.count(F.lit(1)).cast("bigint").alias("n_affected"))
            .crossJoin(tot.agg(F.count(F.lit(1)).cast("bigint").alias("n_total")))
            .select(
                F.lit(name).alias("table_name"),
                "n_affected",
                "n_total",
                F.round(
                    F.col("n_affected").cast("double")
                    / F.col("n_total").cast("double"),
                    6,
                ).alias("affected_share"),
            )
        )

    return (
        row("events", ev_aff, events)
        .unionByName(row("orders", od_aff, orders))
        .unionByName(row("lineitem", li_aff, lineitem))
    )


# ---------------------------------------------------------------------------
# q201 join-key skew doctor: the pre-flight diagnosis for any keyed
# shuffle at 100 TB — key-frequency quantiles (exact, type-1), the
# Gini concentration of rows over keys, and the recommended salt
# factor ceil(max_freq · P / n_rows) that q32's salting machinery
# takes as input. The frequency table can be key-cardinality-sized,
# so its global rank is the range-bucketed two-phase rank (q102
# machinery), never a single-partition window; Gini is a ratio of
# exact integers ((2·Σ rank·f − (n+1)·Σf) / (n·Σf)) with ties
# rank-invariant because tied frequencies commute in the sum.
# ---------------------------------------------------------------------------
_Q201_PARTS = 32  # planning target: executor-slot count the salt is sized for


@query(
    "q201_join_key_skew_doctor",
    oracle=f"""
    WITH freq AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f
      FROM events GROUP BY user_id
    ),
    r AS (
      SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f ASC, user_id ASC) AS BIGINT)
               AS rk
      FROM freq
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(f) AS BIGINT) AS n_rows,
             CAST(MAX(f) AS BIGINT) AS max_freq,
             CAST(SUM(rk * f) AS BIGINT) AS s_rf
      FROM r
    )
    SELECT s.n_rows, s.n_keys, s.max_freq,
           (SELECT f FROM r, s WHERE rk = (50 * s.n_keys + 99) // 100)
             AS p50_freq,
           (SELECT f FROM r, s WHERE rk = (99 * s.n_keys + 99) // 100)
             AS p99_freq,
           round(CAST(2 * s_rf - (n_keys + 1) * n_rows AS DOUBLE)
                 / CAST(n_keys * n_rows AS DOUBLE), 6) AS gini,
           greatest(CAST(1 AS BIGINT),
                    (max_freq * {_Q201_PARTS} + n_rows - 1) // n_rows)
             AS salt_factor
    FROM s
    """,
)
def q201_join_key_skew_doctor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.sampling import two_phase_numeric_rank

    events = load_table(spark, "events", sf_dir)
    freq = events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    ranked = two_phase_numeric_rank(freq, "f", "user_id", "rk")
    s = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("f").cast("bigint").alias("n_rows"),
        F.max("f").cast("bigint").alias("max_freq"),
        F.sum(F.col("rk") * F.col("f")).cast("bigint").alias("s_rf"),
    )
    t50 = (50 * F.col("n_keys") + 99) - (50 * F.col("n_keys") + 99) % 100
    t99 = (99 * F.col("n_keys") + 99) - (99 * F.col("n_keys") + 99) % 100
    picks = (
        ranked.crossJoin(F.broadcast(s))
        .filter(
            (F.col("rk") * 100 == t50) | (F.col("rk") * 100 == t99)
        )
        .agg(
            F.max(F.when(F.col("rk") * 100 == t50, F.col("f"))).alias("p50_freq"),
            F.max(F.when(F.col("rk") * 100 == t99, F.col("f"))).alias("p99_freq"),
        )
    )
    gini = F.round(
        (2 * F.col("s_rf") - (F.col("n_keys") + 1) * F.col("n_rows")).cast("double")
        / (F.col("n_keys") * F.col("n_rows")).cast("double"),
        6,
    )
    salt_num = F.col("max_freq") * _Q201_PARTS + F.col("n_rows") - 1
    salt = F.greatest(
        F.lit(1).cast("bigint"),
        ((salt_num - salt_num % F.col("n_rows")) / F.col("n_rows")).cast("bigint"),
    )
    return s.crossJoin(F.broadcast(picks)).select(
        "n_rows",
        "n_keys",
        "max_freq",
        "p50_freq",
        "p99_freq",
        gini.alias("gini"),
        salt.alias("salt_factor"),
    )


# ---------------------------------------------------------------------------
# q206 shipping-delay profile per order priority: integer day deltas
# l_shipdate − o_orderdate rolled up to n / mean (exact integer mean,
# functions/numeric.py) / p50 / p90 / max per o_orderpriority — the
# ops-SLA readout of the TPC-H schema. Quantiles are the range-
# bucketed exact_quantiles_by (never a whole-group percentile buffer);
# the orders join is the natural o_orderkey equi-join.
# ---------------------------------------------------------------------------
@query(
    "q206_shipping_delay_profile",
    oracle=f"""
    WITH d AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS delay_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    r AS (
      SELECT priority, delay_days,
             ROW_NUMBER() OVER (PARTITION BY priority ORDER BY delay_days)
               AS rank,
             COUNT(*) OVER (PARTITION BY priority) AS n
      FROM d
    ),
    q AS (
      SELECT priority,
             MAX(CASE WHEN rank = GREATEST(1, CAST(CEIL(0.5 * n) AS BIGINT))
                      THEN delay_days END) AS p50_days,
             MAX(CASE WHEN rank = GREATEST(1, CAST(CEIL(0.9 * n) AS BIGINT))
                      THEN delay_days END) AS p90_days
      FROM r GROUP BY priority
    ),
    m AS (
      SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_lines,
             {exact_mean_round_sql("SUM(delay_days)", "COUNT(*)", 4)}
               AS mean_days,
             CAST(MAX(delay_days) AS BIGINT) AS max_days
      FROM d GROUP BY priority
    )
    SELECT m.priority, m.n_lines, m.mean_days,
           CAST(q.p50_days AS BIGINT) AS p50_days,
           CAST(q.p90_days AS BIGINT) AS p90_days,
           m.max_days
    FROM m JOIN q USING (priority)
    """,
)
def q206_shipping_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.functions.numeric import exact_mean_round
    from airbnb_pyspark_jobs_spark.operators.sketches import exact_quantiles_by

    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    d = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "delay_days"
        ),
    )
    qt = (
        exact_quantiles_by(d, ["priority"], "delay_days", [0.5, 0.9])
        .groupBy("priority")
        .agg(
            F.max(F.when(F.col("p") == 0.5, F.col("value")))
            .cast("bigint")
            .alias("p50_days"),
            F.max(F.when(F.col("p") == 0.9, F.col("value")))
            .cast("bigint")
            .alias("p90_days"),
        )
    )
    m = d.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        exact_mean_round(
            F.sum("delay_days").cast("decimal(18,4)"), F.count(F.lit(1)), 4
        ).alias("mean_days"),
        F.max("delay_days").cast("bigint").alias("max_days"),
    )
    return m.join(qt, "priority").select(
        "priority", "n_lines", "mean_days", "p50_days", "p90_days", "max_days"
    )


# ---------------------------------------------------------------------------
# q218 Poisson bootstrap of the mean (Chamandy et al.'s distributed
# bootstrap — the resampling scheme that needs NO shuffling of the
# sample: each row independently draws a Poisson(1) replication count
# per replicate). The draw is DETERMINISTIC: a 32-bit uniform inverted
# through the Poisson(1) CDF literals (same decimal strings both
# engines -> same doubles -> same comparisons), so all 16 replicate
# means replay exactly. Sums are DECIMAL-exact; each replicate mean is
# the integer round-half-away quotient. Replicate fan-out is a
# scan-side explode — no shuffle beyond one 16-group aggregate.
#
# r8 perf: ONE md5 digest carries FOUR independent 8-hex-char 32-bit
# uniforms, so the 16 replicates need 4 md5 calls per row (seeded by
# group g = r div 4; u_r = hex[8·(r mod 4) .. +8]) instead of 16 — the
# digest hash was the dominant cost (measured 10.9 s at sf0.1, ~2.4×
# less md5 work after). Draw VALUES change (a different deterministic
# RNG), but both engines change together and each u stays a uniform
# 32-bit lane of an md5 avalanche.
# ---------------------------------------------------------------------------
_Q218_R = 16
_Q218_LANES = 4  # 8-hex-char uniforms per digest; groups = R / lanes
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
)


def _q218_pois_case(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < CAST({p} AS DOUBLE) THEN {k}"
        for k, p in enumerate(_POIS_CDF)
    )
    return f"CASE{branches} ELSE 6 END"


@query(
    "q218_bootstrap_mean",
    oracle=f"""
    WITH x AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS price
      FROM lineitem
    ),
    hs AS (
      SELECT price, g,
             md5(CAST(l_orderkey AS VARCHAR) || '|'
                 || CAST(l_linenumber AS VARCHAR) || '|'
                 || CAST(g AS VARCHAR)) AS h
      FROM x, UNNEST(range({_Q218_R // _Q218_LANES})) AS t(g)
    ),
    drawn AS (
      SELECT {_Q218_LANES} * g + j AS r, price,
             {_q218_pois_case(
                 f"CAST('0x' || substr(h, CAST(1 + 8 * j AS INT), 8) AS BIGINT) "
                 "/ CAST(4294967296 AS DOUBLE)")} AS c
      FROM hs, UNNEST(range({_Q218_LANES})) AS t2(j)
    ),
    agg AS (
      SELECT CAST(r AS INT) AS replicate,
             CAST(SUM(c) AS BIGINT) AS n_eff,
             CAST(SUM(c * price) AS DECIMAL(38,2)) AS s
      FROM drawn GROUP BY r
    )
    SELECT replicate, n_eff,
           {exact_mean_round_sql("s", "n_eff", 4, sum_scale=2)} AS boot_mean
    FROM agg
    """,
)
def q218_bootstrap_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.functions.numeric import exact_mean_round

    li = load_table(spark, "lineitem", sf_dir)
    x = li.select(
        "l_orderkey", "l_linenumber", _dec("l_extendedprice", 12).alias("__price")
    )
    groups = _Q218_R // _Q218_LANES
    # one digest per (row, group) BELOW the lane explode: the 4 lanes
    # copy the projected hash instead of re-hashing (md5 dominated the
    # old 16-digest shape)
    hs = x.select(
        "__price",
        F.explode(F.sequence(F.lit(0), F.lit(groups - 1))).alias("__g"),
        "l_orderkey",
        "l_linenumber",
    ).select(
        "__price",
        "__g",
        F.md5(
            F.concat_ws(
                "|",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
                F.col("__g").cast("string"),
            )
        ).alias("__h"),
    )
    lanes = hs.select(
        "__price",
        "__g",
        "__h",
        F.explode(F.sequence(F.lit(0), F.lit(_Q218_LANES - 1))).alias("__j"),
    )
    u = (
        F.conv(
            F.col("__h").substr(
                (F.lit(1) + F.col("__j") * 8).cast("int"), F.lit(8)
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    c = F.when(u < float(_POIS_CDF[0]), 0)
    for k, p in enumerate(_POIS_CDF[1:], start=1):
        c = c.when(u < float(p), k)
    c = c.otherwise(6)
    drawn = lanes.select(
        (F.col("__g") * _Q218_LANES + F.col("__j")).alias("__r"),
        "__price",
        c.alias("__c"),
    )
    return (
        drawn.groupBy(F.col("__r").cast("int").alias("replicate"))
        .agg(
            F.sum("__c").cast("bigint").alias("n_eff"),
            F.sum(F.col("__c") * F.col("__price"))
            .cast("decimal(38,2)")
            .alias("__s"),
        )
        .select(
            "replicate",
            "n_eff",
            exact_mean_round(
                F.col("__s"), F.col("n_eff"), 4, sum_scale=2
            ).alias("boot_mean"),
        )
    )


# ---------------------------------------------------------------------------
# q224 revenue concentration: per-mktsegment EXACT Gini coefficient of
# customer lifetime revenue (order-less customers count as zeros — the
# concentration question includes them). Revenue is summed in exact
# cents; the rank-weighted sum comes from the grouped two-phase
# bucketed rank inside operators.sketches.gini_by (a 10^9-customer
# segment ranks in parallel — segments are constant-cardinality, so a
# segment-partitioned window would be the q141 single-task hazard).
# The rounded ratio is an integer round-half-away quotient carried in
# DECIMAL(38,0) / HUGEINT — 10^6·num overflows BIGINT at real cent
# magnitudes.
# ---------------------------------------------------------------------------
@query(
    "q224_revenue_gini",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS mktsegment, c.c_custkey AS custkey,
             CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100), 0)
                  AS BIGINT) AS cents
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT mktsegment, cents,
             ROW_NUMBER() OVER (PARTITION BY mktsegment
                                ORDER BY cents, custkey) AS i
      FROM rev
    ),
    a AS (
      SELECT mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total,
             CAST(SUM(i * cents) AS BIGINT) AS ix
      FROM r GROUP BY 1
    )
    SELECT mktsegment, n, total,
           CASE WHEN n * total > 0 THEN
             CAST((2000000 * CAST(2 * ix - (n + 1) * total AS HUGEINT)
                   + CAST(n AS HUGEINT) * total)
                  // (2 * CAST(n AS HUGEINT) * total) AS BIGINT)
             / CAST(1000000 AS DOUBLE)
           ELSE NULL END AS gini
    FROM a
    """,
)
def q224_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.sketches import gini_by

    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    rev = (
        customer.select("c_custkey", "c_mktsegment")
        .join(
            orders.select(
                F.col("o_custkey").alias("c_custkey"),
                (_dec("o_totalprice", 12) * 100).cast("bigint").alias("__cents"),
            ),
            "c_custkey",
            "left",
        )
        .groupBy("c_custkey", F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.coalesce(F.sum("__cents"), F.lit(0)).cast("bigint").alias("cents"))
    )
    return gini_by(rev, ["mktsegment"], "cents", "c_custkey")


# ---------------------------------------------------------------------------
# q226 Theil index decomposition — the decomposable-inequality
# companion of q224's Gini: customer revenue inequality split into
# WITHIN-nation and BETWEEN-nation parts (T = Σ s_g·T_g + Σ s_g·
# ln(μ_g/μ), s_g = revenue share). Per-row ln terms follow the q116
# discipline — each ln is computed on an exact-integer-ratio double,
# scaled by 10^6, rounded ONCE, and summed in HUGEINT/DECIMAL(38,0)
# (order-independent); every output ratio goes through
# decimal_ratio_round (BIGINT products overflow exact_mean_round's
# staging at cent magnitudes). Bounds: x·n_g and s_g·n must stay
# < 2^53 for the exact double ratio (holds through ~10^15 cents;
# widen to a two-step divide beyond). Customers without orders are
# excluded (Theil needs x > 0).
# ---------------------------------------------------------------------------
def _q226_oracle() -> str:
    share = decimal_ratio_round_sql("g.s_g", "t.s")
    within = decimal_ratio_round_sql("d.dg", "CAST(g.s_g AS HUGEINT) * 1000000")
    between = decimal_ratio_round_sql(
        "CAST(g.s_g AS HUGEINT) * bt.lb", "CAST(t.s AS HUGEINT) * 1000000"
    )
    return f"""
    WITH rev AS (
      SELECT c.c_custkey AS custkey, n.n_name AS nation,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS x
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
      HAVING SUM(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100) > 0
    ),
    g AS (
      SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(x) AS BIGINT) AS s_g
      FROM rev GROUP BY 1
    ),
    t AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS BIGINT) AS s
      FROM g
    ),
    d AS (
      SELECT rev.nation,
             CAST(SUM(CAST(rev.x AS HUGEINT)
                  * CAST(round(ln(CAST(rev.x * g.n_g AS DOUBLE)
                                  / CAST(g.s_g AS DOUBLE)) * 1000000)
                         AS BIGINT)) AS HUGEINT) AS dg
      FROM rev JOIN g USING (nation) GROUP BY 1
    ),
    bt AS (
      SELECT g.nation,
             CAST(round(ln(CAST(g.s_g * t.n AS DOUBLE)
                           / CAST(t.s * g.n_g AS DOUBLE)) * 1000000)
                  AS BIGINT) AS lb
      FROM g CROSS JOIN t
    )
    SELECT g.nation, g.n_g AS n_customers, g.s_g AS total_cents,
           {share} AS rev_share,
           {within} AS theil_within,
           {between} AS between_term
    FROM g JOIN d USING (nation) JOIN bt USING (nation) CROSS JOIN t
    """


@query("q226_theil_decomposition", oracle=_q226_oracle())
def q226_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.caching import owned_persist
    from airbnb_pyspark_jobs_spark.functions.numeric import decimal_ratio_round

    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    d38 = "decimal(38,0)"
    rev = owned_persist(
        customer.select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(
                nation.select("n_nationkey", F.col("n_name").alias("nation"))
            ),
            customer.c_nationkey == F.col("n_nationkey"),
        )
        .join(
            orders.select(
                F.col("o_custkey").alias("c_custkey"),
                (_dec("o_totalprice", 12) * 100).cast("bigint").alias("__cents"),
            ),
            "c_custkey",
        )
        .groupBy("c_custkey", "nation")
        .agg(F.sum("__cents").cast("bigint").alias("__x"))
        .filter(F.col("__x") > 0)
    )
    g = rev.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("__x").cast("bigint").alias("total_cents"),
    )
    t = g.agg(
        F.sum("n_customers").cast("bigint").alias("__n"),
        F.sum("total_cents").cast("bigint").alias("__s"),
    )
    lterm = F.round(
        F.log(
            (F.col("__x") * F.col("n_customers")).cast("double")
            / F.col("total_cents").cast("double")
        )
        * 1000000
    ).cast("bigint")
    d = (
        rev.join(F.broadcast(g), "nation")
        .groupBy("nation")
        .agg(
            F.sum(F.col("__x").cast(d38) * lterm).cast(d38).alias("__dg")
        )
    )
    lb = F.round(
        F.log(
            (F.col("total_cents") * F.col("__n")).cast("double")
            / (F.col("__s") * F.col("n_customers")).cast("double")
        )
        * 1000000
    ).cast("bigint")
    return (
        g.join(d, "nation")
        .crossJoin(F.broadcast(t))
        .withColumn("__lb", lb)
        .select(
            "nation",
            "n_customers",
            "total_cents",
            decimal_ratio_round(F.col("total_cents"), F.col("__s")).alias(
                "rev_share"
            ),
            decimal_ratio_round(
                F.col("__dg"), F.col("total_cents").cast(d38) * 1000000
            ).alias("theil_within"),
            decimal_ratio_round(
                F.col("total_cents").cast(d38) * F.col("__lb"),
                F.col("__s").cast(d38) * 1000000,
            ).alias("between_term"),
        )
    )


# ---------------------------------------------------------------------------
# q229 weighted median — quantity-weighted median unit price per
# return flag: "the price of the median UNIT shipped", not the median
# line item (big-quantity lines pull the weighted median toward bulk
# pricing). Exact integers end to end: cents values, integral
# weights, and operators.sketches.weighted_median_by's grouped
# two-phase WEIGHT-cumulative rank (per-group range buckets; no
# per-group single-task window — return flags are constant-
# cardinality, the q141 hazard shape). Pick = smallest v with
# 2·cumweight >= W.
# ---------------------------------------------------------------------------
@query(
    "q229_weighted_median_price",
    oracle="""
    WITH b AS (
      SELECT l_returnflag AS returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
             CAST(round(l_quantity) AS BIGINT) AS w
      FROM lineitem WHERE l_quantity > 0
    ),
    g AS (SELECT returnflag, v, CAST(SUM(w) AS BIGINT) AS w
          FROM b GROUP BY 1, 2),
    c AS (SELECT returnflag, v, w,
            CAST(SUM(w) OVER (PARTITION BY returnflag ORDER BY v) AS BIGINT)
              AS cum
          FROM g),
    t AS (SELECT returnflag, CAST(SUM(w) AS BIGINT) AS wt FROM g GROUP BY 1)
    SELECT c.returnflag, t.wt AS total_weight,
           round(CAST(MIN(CASE WHEN 2 * c.cum >= t.wt THEN c.v END)
                      AS DOUBLE) / 100.0, 2) AS weighted_median_price
    FROM c JOIN t USING (returnflag)
    GROUP BY c.returnflag, t.wt
    """,
)
def q229_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.sketches import weighted_median_by

    li = load_table(spark, "lineitem", sf_dir)
    base = li.filter(F.col("l_quantity") > 0).select(
        F.col("l_returnflag").alias("returnflag"),
        (_dec("l_extendedprice", 12) * 100).cast("bigint").alias("__v"),
        F.round("l_quantity").cast("bigint").alias("__w"),
    )
    out = weighted_median_by(base, ["returnflag"], "__v", "__w")
    return out.select(
        "returnflag",
        "total_weight",
        F.round(
            F.col("weighted_median").cast("double") / F.lit(100.0), 2
        ).alias("weighted_median_price"),
    )


# ---------------------------------------------------------------------------
# q233 co-purchase lift (market-basket association): part pairs
# appearing in the same order, scored by lift = N·n_ab/(n_a·n_b).
# The pair fan-out is bounded by construction — an order has at most
# 7 line items, so the per-order self-join emits <= C(7,2) = 21 pairs
# regardless of corpus size (the safe shape of a basket join; a
# customer-level basket would need a cap first). Counts are exact
# integers; lift is the exact integer-product ratio via
# decimal_ratio_round. Support floor n_ab >= 2 keeps the output the
# actually-associated tail.
# ---------------------------------------------------------------------------
def _q233_oracle() -> str:
    lift = decimal_ratio_round_sql(
        "CAST(t.n AS HUGEINT) * p.n_ab", "CAST(ca.n_a AS HUGEINT) * cb.n_a"
    )
    return f"""
    WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    t AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM b),
    c AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_a FROM b GROUP BY p),
    p AS (
      SELECT a.p AS part_a, b2.p AS part_b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT p.part_a, p.part_b, p.n_ab,
           ca.n_a AS n_orders_a, cb.n_a AS n_orders_b,
           {lift} AS lift
    FROM p
    JOIN c ca ON ca.p = p.part_a
    JOIN c cb ON cb.p = p.part_b
    CROSS JOIN t
    """


@query("q233_copurchase_lift", oracle=_q233_oracle())
def q233_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.caching import owned_persist
    from airbnb_pyspark_jobs_spark.functions.numeric import decimal_ratio_round

    li = load_table(spark, "lineitem", sf_dir)
    b = owned_persist(
        li.select(
            F.col("l_orderkey").alias("__o"), F.col("l_partkey").alias("__p")
        ).distinct()
    )
    t = b.agg(F.countDistinct("__o").cast("bigint").alias("__n"))
    c = b.groupBy(F.col("__p")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_a")
    )
    pairs = (
        b.alias("a")
        .join(b.alias("b2"), "__o")
        .filter(F.col("a.__p") < F.col("b2.__p"))
        .groupBy(
            F.col("a.__p").alias("part_a"), F.col("b2.__p").alias("part_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    return (
        pairs.join(
            c.select(F.col("__p").alias("part_a"), F.col("__n_a").alias("n_orders_a")),
            "part_a",
        )
        .join(
            c.select(F.col("__p").alias("part_b"), F.col("__n_a").alias("n_orders_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(t))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_orders_a",
            "n_orders_b",
            decimal_ratio_round(
                F.col("__n").cast("decimal(38,0)") * F.col("n_ab"),
                F.col("n_orders_a").cast("decimal(38,0)") * F.col("n_orders_b"),
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# q244 Z-order layout audit — the data-LAYOUT optimization that drives
# min/max data skipping at 100 TB: write lineitem in Morton (Z-curve)
# order over (l_partkey, l_suppkey) instead of natural arrival order,
# and every fixed-size file block covers a small rectangle of BOTH key
# domains, so a scan filtered on either key prunes most files from
# their parquet footer stats alone. The audit materializes that claim
# as a number: split each layout into 64 equal row blocks (a stand-in
# for maxRecordsPerFile) and report the mean fraction of each key's
# domain a block spans — ~1.0 for natural order, ~1/8 per dimension
# for the Z-curve (sqrt of 1/64).
#
# Everything is integer arithmetic: keys are normalized to a 1024-cell
# grid by integer cross-multiply, the 20-bit Morton code is a sum of
# (x div 2^j) % 2 shifted terms (emitted from one template for both
# engines), the global sort position comes from the two-phase numeric
# rank (no single-task window — at scale you'd repartitionByRange on
# the same z key and sortWithinPartitions), and the span fractions are
# exact decimal ratios. rowid = orderkey·8 + linenumber (linenumber
# ≤ 7) is the deterministic tie-break and the "arrival order" key.
# ---------------------------------------------------------------------------
def _morton20(x: str, y: str, intdiv: str) -> str:
    """Σ_j bit_j(x)·4^j + bit_j(y)·2·4^j for 10-bit x, y — the same
    expression text works as Spark SQL (`div`) and DuckDB (`//`)."""
    terms = []
    for j in range(10):
        terms.append(f"(({x} {intdiv} {1 << j}) % 2) * {1 << (2 * j)}")
        terms.append(f"(({y} {intdiv} {1 << j}) % 2) * {1 << (2 * j + 1)}")
    return " + ".join(terms)


def _q244_oracle() -> str:
    from airbnb_pyspark_jobs_spark.functions.numeric import (
        decimal_ratio_round_sql as _drr,
    )

    z = _morton20("gx", "gy", "//")
    frac_x = _drr("SUM(bx)", "64 * MAX(ex)", 6)
    frac_y = _drr("SUM(by_)", "64 * MAX(ey)", 6)
    return f"""
    WITH st AS (
      SELECT CAST(MIN(l_partkey) AS BIGINT) AS mnx,
             CAST(MAX(l_partkey) - MIN(l_partkey) + 1 AS BIGINT) AS ex,
             CAST(MIN(l_suppkey) AS BIGINT) AS mny,
             CAST(MAX(l_suppkey) - MIN(l_suppkey) + 1 AS BIGINT) AS ey,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem
    ),
    b AS (
      SELECT l_partkey AS x, l_suppkey AS y,
             l_orderkey * 8 + l_linenumber AS rowid,
             (l_partkey - st.mnx) * 1024 // st.ex AS gx,
             (l_suppkey - st.mny) * 1024 // st.ey AS gy,
             st.ex, st.ey, st.n
      FROM lineitem, st
    ),
    keyed AS (SELECT *, {z} AS zval FROM b),
    ranked AS (
      SELECT 'zorder' AS layout, x, y, ex, ey, n,
             ROW_NUMBER() OVER (ORDER BY zval, rowid) AS rk
      FROM keyed
      UNION ALL
      SELECT 'natural' AS layout, x, y, ex, ey, n,
             ROW_NUMBER() OVER (ORDER BY rowid) AS rk
      FROM keyed
    ),
    blocks AS (
      SELECT layout, (rk - 1) * 64 // n AS blk,
             CAST(MAX(x) - MIN(x) + 1 AS BIGINT) AS bx,
             CAST(MAX(y) - MIN(y) + 1 AS BIGINT) AS by_,
             MAX(ex) AS ex, MAX(ey) AS ey
      FROM ranked GROUP BY layout, (rk - 1) * 64 // n
    )
    SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_blocks,
           {frac_x} AS avg_partkey_span_frac,
           {frac_y} AS avg_suppkey_span_frac
    FROM blocks GROUP BY layout
    """


@query("q244_zorder_layout_audit", oracle=_q244_oracle())
def q244_zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.caching import owned_persist
    from airbnb_pyspark_jobs_spark.functions.numeric import decimal_ratio_round
    from airbnb_pyspark_jobs_spark.operators.sampling import (
        two_phase_numeric_rank,
    )

    li = load_table(spark, "lineitem", sf_dir)
    st = li.agg(
        F.min("l_partkey").cast("bigint").alias("__mnx"),
        (F.max("l_partkey") - F.min("l_partkey") + 1).cast("bigint").alias("__ex"),
        F.min("l_suppkey").cast("bigint").alias("__mny"),
        (F.max("l_suppkey") - F.min("l_suppkey") + 1).cast("bigint").alias("__ey"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    keyed = owned_persist(
        li.select("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber")
        .crossJoin(F.broadcast(st))
        .withColumn("__rowid", F.col("l_orderkey") * 8 + F.col("l_linenumber"))
        .withColumn("__gx", F.expr("(l_partkey - __mnx) * 1024 div __ex"))
        .withColumn("__gy", F.expr("(l_suppkey - __mny) * 1024 div __ey"))
        .withColumn("__z", F.expr(_morton20("__gx", "__gy", "div")))
        .select(
            F.col("l_partkey").alias("__x"),
            F.col("l_suppkey").alias("__y"),
            "__rowid",
            "__z",
            "__ex",
            "__ey",
            "__n",
        )
    )

    def _blocks(df: DataFrame, order_col: str, layout: str) -> DataFrame:
        ranked = two_phase_numeric_rank(df, order_col, "__rowid", "__rk")
        return (
            ranked.withColumn("__blk", F.expr("(__rk - 1) * 64 div __n"))
            .groupBy("__blk")
            .agg(
                (F.max("__x") - F.min("__x") + 1).cast("bigint").alias("__bx"),
                (F.max("__y") - F.min("__y") + 1).cast("bigint").alias("__by"),
                F.max("__ex").alias("__ex"),
                F.max("__ey").alias("__ey"),
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                decimal_ratio_round(
                    F.sum("__bx"), F.lit(64).cast("bigint") * F.max("__ex"), 6
                ).alias("avg_partkey_span_frac"),
                decimal_ratio_round(
                    F.sum("__by"), F.lit(64).cast("bigint") * F.max("__ey"), 6
                ).alias("avg_suppkey_span_frac"),
            )
            .select(F.lit(layout).alias("layout"), "*")
        )

    return _blocks(keyed, "__z", "zorder").unionByName(
        _blocks(keyed, "__rowid", "natural")
    )


# ---------------------------------------------------------------------------
# q246 entity resolution end-to-end — the record-linkage pipeline q75
# only starts: fuzzy pair generation (first-token blocking + exact
# levenshtein ≤ 3, precision 1.0) feeds min-label connected components
# (pointer-jumping, O(log diameter) rounds — dedupe.dedup_components,
# the q58 machinery reused on NAME nodes), then every part row maps to
# its entity and multi-name entities are rolled up with a canonical
# name (= component min, same ASCII order both engines) and exact
# DECIMAL money totals. This is the master-data dedup shape: spelling
# variants of the same product collapse to one golden record. The
# oracle replays blocking + closure as a recursive CTE.
# ---------------------------------------------------------------------------
@query(
    "q246_entity_resolution",
    oracle=r"""
    WITH RECURSIVE d AS (SELECT DISTINCT p_name AS name FROM part),
    b AS (SELECT name, lower(string_split_regex(name, '\s+')[1]) AS w FROM d),
    prs AS (
      SELECT a.name AS na, c.name AS nb
      FROM b a JOIN b c ON a.w = c.w AND a.name < c.name
      WHERE levenshtein(a.name, c.name) <= 3
    ),
    edges AS (SELECT na AS a, nb AS b FROM prs
              UNION SELECT nb, na FROM prs),
    reach(src, dst) AS (
      SELECT name, name FROM d
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    ),
    lbl AS (SELECT src AS name, MIN(dst) AS comp FROM reach GROUP BY src)
    SELECT l.comp AS canonical_name,
           CAST(COUNT(DISTINCT p.p_name) AS BIGINT) AS n_names,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(ROUND(SUM(CAST(p_retailprice AS DECIMAL(12,2))), 2) AS DOUBLE)
             AS total_retailprice
    FROM part p JOIN lbl l ON p.p_name = l.name
    GROUP BY 1
    HAVING COUNT(DISTINCT p.p_name) >= 2
    """,
)
def q246_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.dedupe import dedup_components
    from airbnb_pyspark_jobs_spark.operators.linkage import blocked_fuzzy_pairs

    part = load_table(spark, "part", sf_dir)
    pairs = blocked_fuzzy_pairs(
        part.select("p_name"), "p_name", max_distance=3
    ).select(
        F.col("name_a").alias("doc_id_a"), F.col("name_b").alias("doc_id_b")
    )
    names = part.select(F.col("p_name").alias("doc_id")).distinct()
    comp = dedup_components(names, pairs)
    return (
        part.join(comp, part["p_name"] == comp["doc_id"])
        .groupBy(F.col("component_id").alias("canonical_name"))
        .agg(
            F.count_distinct("p_name").cast("bigint").alias("n_names"),
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            _money(F.sum(_dec("p_retailprice", 12)), "total_retailprice"),
        )
        .filter(F.col("n_names") >= 2)
    )


# ---------------------------------------------------------------------------
# q259 share-of-parent rollup — the OLAP drill path with RATIOS at
# every level: nation revenue as a share of its region and of the
# world, region share of the world. Levels aggregate once each (the
# rollup lattice, no re-scan per level); shares are exact integer-cent
# ratios against broadcast parent totals. The shape behind every
# "contribution" treemap.
# ---------------------------------------------------------------------------
def _q259_oracle() -> str:
    from airbnb_pyspark_jobs_spark.functions.numeric import (
        decimal_ratio_round_sql as _drr,
    )

    return f"""
    WITH base AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ),
    reg AS (SELECT region, CAST(SUM(cents) AS BIGINT) AS rcents
            FROM base GROUP BY region),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS tcents FROM base)
    SELECT b.region, b.nation,
           CAST(ROUND(CAST(b.cents AS DECIMAL(18,0)) / 100, 2) AS DOUBLE)
             AS revenue,
           {_drr("b.cents", "r.rcents", 6)} AS share_of_region,
           {_drr("b.cents", "t.tcents", 6)} AS share_of_total,
           {_drr("r.rcents", "t.tcents", 6)} AS region_share_of_total
    FROM base b JOIN reg r USING (region) CROSS JOIN tot t
    """


@query("q259_share_of_parent", oracle=_q259_oracle())
def q259_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.functions.numeric import decimal_ratio_round

    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    base = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("__cents")
        )
    )
    reg = base.groupBy("region").agg(
        F.sum("__cents").cast("bigint").alias("__rcents")
    )
    tot = base.agg(F.sum("__cents").cast("bigint").alias("__tcents"))
    return (
        base.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            F.round(F.col("__cents").cast("decimal(18,0)") / 100, 2)
            .cast("double")
            .alias("revenue"),
            decimal_ratio_round(F.col("__cents"), F.col("__rcents"), 6).alias(
                "share_of_region"
            ),
            decimal_ratio_round(F.col("__cents"), F.col("__tcents"), 6).alias(
                "share_of_total"
            ),
            decimal_ratio_round(F.col("__rcents"), F.col("__tcents"), 6).alias(
                "region_share_of_total"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q264 sorted-neighborhood entity matching — the OTHER classic ER
# blocking family (Hernández-Stolfo): sort all names once, compare
# each name only to its w = 3 lexicographic neighbors, verify with
# exact levenshtein ≤ 3. Complements q75's first-token blocking —
# sorted-neighborhood catches pairs whose FIRST token differs (q75's
# structural blind spot) as long as they sort nearby; the
# found_by_token_block flag measures exactly that recall difference.
# The global sort position comes from the prefix-bucketed two-phase
# rank (lexicographic prefix buckets are order-consistent for any
# string), and "adjacent within w" is w co-partitioned equi-joins on
# rank+d — never a corpus window or a range self-join.
# ---------------------------------------------------------------------------
@query(
    "q264_sorted_neighborhood_pairs",
    oracle=r"""
    WITH d AS (SELECT DISTINCT p_name AS name FROM part),
    r AS (
      SELECT name, ROW_NUMBER() OVER (ORDER BY name) AS rk,
             lower(string_split_regex(name, '\s+')[1]) AS w
      FROM d
    ),
    cand AS (
      SELECT a.name AS name_a, b.name AS name_b,
             a.w = b.w AS found_by_token_block
      FROM r a JOIN r b
        ON b.rk - a.rk BETWEEN 1 AND 3
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev,
           found_by_token_block
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 3
    """,
)
def q264_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.caching import owned_persist
    from airbnb_pyspark_jobs_spark.operators.sampling import _two_phase_rank

    part = load_table(spark, "part", sf_dir)
    d = part.select(F.col("p_name").alias("name")).distinct()
    ranked = owned_persist(
        _two_phase_rank(d, "name", "name", "__rk").select(
            "name",
            "__rk",
            F.lower(F.split(F.col("name"), r"\s+").getItem(0)).alias("__w"),
        )
    )
    a = ranked.select(
        F.col("name").alias("name_a"),
        F.col("__rk").alias("__ra"),
        F.col("__w").alias("__wa"),
    ).withColumn("__d", F.explode(F.sequence(F.lit(1), F.lit(3))))
    b = ranked.select(
        F.col("name").alias("name_b"),
        F.col("__rk").alias("__rb"),
        F.col("__w").alias("__wb"),
    )
    cand = a.join(b, (F.col("__ra") + F.col("__d")) == F.col("__rb"))
    return (
        cand.select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("lev"),
            (F.col("__wa") == F.col("__wb")).alias("found_by_token_block"),
        )
        .filter(F.col("lev") <= 3)
    )


# ---------------------------------------------------------------------------
# q268 partial-aggregation doctor — the map-side-combine planning
# heuristic made queryable (the q201 skew doctor's sibling): for each
# candidate grouping column of lineitem, rows per distinct key =
# the combine compression factor. Verdict bands: ≥ 100× combine is
# essentially free aggregation; ≤ 2× partial aggregation only burns
# memory (Spark still plans it — this report says when AQE/skew hints
# matter more). One scan per column, all map-side-combinable counts.
# ---------------------------------------------------------------------------
def _q268_oracle() -> str:
    from airbnb_pyspark_jobs_spark.functions.numeric import (
        decimal_ratio_round_sql as _drr,
    )

    cols = ["l_returnflag", "l_linestatus", "l_partkey", "l_suppkey", "l_orderkey"]
    unions = "\n      UNION ALL\n      ".join(
        f"""SELECT '{c}' AS key_col,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_keys
      FROM lineitem"""
        for c in cols
    )
    ratio = _drr("n_rows", "n_keys", 2)
    return f"""
    WITH s AS ({unions})
    SELECT key_col, n_rows, n_keys, {ratio} AS combine_factor,
           CASE WHEN n_rows >= 100 * n_keys THEN 'combine-wins'
                WHEN n_rows >= 2 * n_keys THEN 'moderate'
                ELSE 'combine-useless' END AS verdict
    FROM s
    """


@query("q268_combine_doctor", oracle=_q268_oracle())
def q268_combine_doctor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.functions.numeric import decimal_ratio_round

    li = load_table(spark, "lineitem", sf_dir)
    cols = ["l_returnflag", "l_linestatus", "l_partkey", "l_suppkey", "l_orderkey"]
    out = None
    for c in cols:
        s = li.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(F.col(c)).cast("bigint").alias("n_keys"),
        ).select(F.lit(c).alias("key_col"), "n_rows", "n_keys")
        out = s if out is None else out.unionByName(s)
    return out.select(
        "key_col",
        "n_rows",
        "n_keys",
        decimal_ratio_round(F.col("n_rows"), F.col("n_keys"), 2).alias(
            "combine_factor"
        ),
        F.when(F.col("n_rows") >= 100 * F.col("n_keys"), "combine-wins")
        .when(F.col("n_rows") >= 2 * F.col("n_keys"), "moderate")
        .otherwise("combine-useless")
        .alias("verdict"),
    )


# ---------------------------------------------------------------------------
# q269 revenue concentration (Pareto curve points) — "do 20% of
# customers carry 80% of revenue?": rank customers by exact cent
# revenue DESCENDING (negated two-phase rank — never a single-task
# sort of the customer dimension), then read the cumulative revenue
# share at the top-1/5/10/20/50% customer cutoffs via the two-phase
# cumulative sum. Exact integer ratios; the q224 Gini's operational
# cousin (a curve you can act on instead of one coefficient).
# ---------------------------------------------------------------------------
def _q269_oracle() -> str:
    from airbnb_pyspark_jobs_spark.functions.numeric import (
        decimal_ratio_round_sql as _drr,
    )

    share = _drr("c.crev", "t.trev", 6)
    cust_share = _drr("c.rk", "t.n", 6)
    return f"""
    WITH g AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey ASC) AS rk,
             CAST(SUM(cents) OVER (ORDER BY cents DESC, o_custkey ASC)
                  AS BIGINT) AS crev
      FROM g
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cents) AS BIGINT) AS trev FROM g),
    pts AS (SELECT UNNEST([1, 5, 10, 20, 50]) AS pct)
    SELECT p.pct AS top_pct,
           c.rk AS n_customers,
           {cust_share} AS customer_share,
           {share} AS revenue_share
    FROM pts p, t
    JOIN r c ON c.rk = GREATEST(CAST(p.pct * t.n // 100 AS BIGINT), 1)
    """


@query("q269_pareto_revenue", oracle=_q269_oracle())
def q269_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.caching import owned_persist
    from airbnb_pyspark_jobs_spark.functions.numeric import decimal_ratio_round
    from airbnb_pyspark_jobs_spark.operators.sampling import (
        two_phase_numeric_cumsum_multi,
    )

    orders = load_table(spark, "orders", sf_dir)
    g = owned_persist(
        orders.groupBy("o_custkey").agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("__cents")
        ).withColumn("__neg", -F.col("__cents"))
        .withColumn("__one", F.lit(1).cast("bigint"))
    )
    # one pass computes BOTH running revenue and running rank (sum of 1s)
    c = two_phase_numeric_cumsum_multi(
        g, "__neg", "o_custkey", ["__cents", "__one"], ["__crev", "__rk"]
    )
    t = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("__cents").cast("bigint").alias("__trev"),
    )
    pts = orders.sparkSession.createDataFrame(
        [(1,), (5,), (10,), (20,), (50,)], ["top_pct"]
    ).select(F.col("top_pct").cast("bigint").alias("top_pct"))
    targets = pts.crossJoin(F.broadcast(t)).select(
        "top_pct",
        "__n",
        "__trev",
        F.greatest(
            F.expr("top_pct * __n div 100").cast("bigint"), F.lit(1).cast("bigint")
        ).alias("__target"),
    )
    return (
        targets.join(
            c.select("__rk", "__crev"), F.col("__target") == F.col("__rk")
        )
        .select(
            "top_pct",
            F.col("__rk").alias("n_customers"),
            decimal_ratio_round(F.col("__rk"), F.col("__n"), 6).alias(
                "customer_share"
            ),
            decimal_ratio_round(F.col("__crev"), F.col("__trev"), 6).alias(
                "revenue_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q271 supplier concentration (HHI) per part brand — the antitrust
# metric as a sourcing-risk report: per brand, the Herfindahl index of
# supplier revenue shares, HHI = Σ_s share_s² = Σ c_s² / (Σ c_s)²,
# computed entirely as one exact HUGEINT cross-multiplied ratio per
# brand (shares never exist as floats). HHI > 0.25 = concentrated
# sourcing; equal split over m suppliers gives exactly 1/m (tested).
# ---------------------------------------------------------------------------
def _q271_oracle() -> str:
    from airbnb_pyspark_jobs_spark.functions.numeric import (
        decimal_ratio_round_sql as _drr,
    )

    hhi = _drr("sq", "tot * tot", 6)
    return f"""
    WITH s AS (
      SELECT p.p_brand, l.l_suppkey,
             CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS HUGEINT) AS c
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    g AS (
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(c) AS HUGEINT) AS tot,
             CAST(SUM(c * c) AS HUGEINT) AS sq
      FROM s GROUP BY p_brand
    )
    SELECT p_brand, n_suppliers, {hhi} AS hhi
    FROM g
    """


@query("q271_supplier_hhi", oracle=_q271_oracle())
def q271_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.functions.numeric import decimal_ratio_round

    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    D = "decimal(38,0)"
    s = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand", "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast(D)
            .alias("__c")
        )
    )
    g = s.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("__c").cast(D).alias("__tot"),
        F.sum(F.col("__c") * F.col("__c")).cast(D).alias("__sq"),
    )
    return g.select(
        "p_brand",
        "n_suppliers",
        decimal_ratio_round(
            F.col("__sq"), F.col("__tot") * F.col("__tot"), 6
        ).alias("hhi"),
    )


# ---------------------------------------------------------------------------
# q282 order cycle-time percentiles per priority — ops SLA reporting:
# exact p50/p90/p99 of order→ship latency (days, exact integer from
# the parquet DATE/TIMESTAMP pair) per o_orderpriority, via the
# grouped range-bucketed rank (exact_quantiles_by — no per-group
# value materialization, the percentile() OOM shape at 100 TB).
# ---------------------------------------------------------------------------
@query(
    "q282_cycle_time_percentiles",
    oracle="""
    WITH b AS (
      SELECT o.o_orderpriority,
             CAST((epoch_us(CAST(l.l_shipdate AS TIMESTAMP))
                   - epoch_us(o.o_orderdate)) // 86400000000 AS BIGINT)
               AS days,
             l.l_orderkey, l.l_linenumber
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    r AS (
      SELECT o_orderpriority, days,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY days, l_orderkey, l_linenumber) AS rk,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM b
    ),
    pts AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS p)
    SELECT r.o_orderpriority, CAST(p.p AS DOUBLE) AS p,
           CAST(CEIL(p.p * r.n) AS BIGINT) AS rank,
           CAST(r.days AS DOUBLE) AS value
    FROM pts p JOIN r ON r.rk = CAST(CEIL(p.p * r.n) AS BIGINT)
    """,
)
def q282_cycle_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from airbnb_pyspark_jobs_spark.operators.sketches import exact_quantiles_by

    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    b = li.join(
        orders.select("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).select(
        "o_orderpriority",
        F.expr(
            "(unix_micros(cast(l_shipdate as timestamp))"
            " - unix_micros(cast(o_orderdate as timestamp))) div 86400000000"
        )
        .cast("bigint")
        .alias("__days"),
    )
    out = exact_quantiles_by(b, ["o_orderpriority"], "__days", [0.5, 0.9, 0.99])
    return out.select(
        "o_orderpriority",
        F.col("p").cast("double").alias("p"),
        F.col("rank").cast("bigint").alias("rank"),
        F.col("value").cast("double").alias("value"),
    )


# ---------------------------------------------------------------------------
# q290 catalog statistics collector — the ANALYZE TABLE that feeds a
# cost-based optimizer, as one query over the whole star schema: per
# (table, column) exact row count, null count, NDV, and min/max
# (stringified for a uniform schema; numeric columns keep their
# natural ordering inside each engine because both stringify AFTER the
# typed MIN/MAX). One pass per table, every aggregate map-side
# combinable; these are exactly the statistics join reordering and
# broadcast-threshold decisions consume at 100 TB.
# ---------------------------------------------------------------------------
_Q290_COLS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_brand", "p_type", "p_size"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"],
}


def _q290_oracle() -> str:
    parts = []
    for t, cols in _Q290_COLS.items():
        for c in cols:
            parts.append(
                f"""SELECT '{t}' AS table_name, '{c}' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
             CAST(MIN({c}) AS VARCHAR) AS min_value,
             CAST(MAX({c}) AS VARCHAR) AS max_value
      FROM {t}"""
            )
    return "\n      UNION ALL\n      ".join(parts)


@query("q290_catalog_stats", oracle=_q290_oracle())
def q290_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t, cols in _Q290_COLS.items():
        df = load_table(spark, t, sf_dir)
        for c in cols:
            s = df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(F.col(c)))
                .cast("bigint")
                .alias("n_nulls"),
                F.count_distinct(F.col(c)).cast("bigint").alias("ndv"),
                F.min(F.col(c)).cast("string").alias("min_value"),
                F.max(F.col(c)).cast("string").alias("max_value"),
            ).select(
                F.lit(t).alias("table_name"),
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_nulls",
                "ndv",
                "min_value",
                "max_value",
            )
            out = s if out is None else out.unionByName(s)
    return out


# ---------------------------------------------------------------------------
# q299 order fan-out distribution — the TPC-H Q13 shape turned toward
# the fact side: how many lineitems does an order carry? The histogram
# that sizes the orders⨝lineitem join fan-out (q268's combine factor is
# its mean); orders with zero items surface via the left join, exactly
# the Q13 zero-cell discipline.
# ---------------------------------------------------------------------------
@query(
    "q299_order_fanout_dist",
    oracle="""
    WITH g AS (
      SELECT o.o_orderkey, CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_items
      FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey
    )
    SELECT n_items, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM g GROUP BY n_items
    """,
)
def q299_order_fanout_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    g = (
        orders.select("o_orderkey")
        .join(li.select("l_orderkey"), orders["o_orderkey"] == F.col("l_orderkey"), "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").cast("bigint").alias("n_items"))
    )
    return g.groupBy("n_items").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
