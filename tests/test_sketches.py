"""Sketch accuracy vs exact answers (within the configured error) and
the merge-without-rescan invariant for HLL sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.sketches import (
    approx_distinct_by,
    approx_quantiles_by,
    hll_daily_sketches,
    hll_merge_estimate,
)
from airbnb_pyspark_jobs_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_approx_distinct_within_rsd(spark):
    events = load_table(spark, "events", SF_DIR)
    approx = {
        r.event_type: r.approx_distinct
        for r in approx_distinct_by(events, ["event_type"], "user_id", rsd=0.05).collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(3, 0.15 * exact[k]), (k, approx[k], exact[k])


def test_hll_sketches_merge_matches_direct_estimate(spark):
    events = load_table(spark, "events", SF_DIR)
    daily = hll_daily_sketches(events, "ts", "user_id").persist()
    merged = hll_merge_estimate(daily).first().approx_distinct
    exact = events.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(3, 0.15 * exact)
    # the pre-aggregate is genuinely mergeable: per-day sketches union to
    # the SAME estimate as sketching the raw data in one pass
    direct = (
        events.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("n"))
        .first()
        .n
    )
    assert merged == direct
    daily.unpersist()


def test_approx_quantiles_within_rank_error(spark):
    orders = load_table(spark, "orders", SF_DIR)
    approx = {
        r.o_orderpriority: r.approx_quantiles
        for r in approx_quantiles_by(
            orders, ["o_orderpriority"], "o_totalprice", [0.5, 0.9], accuracy=10_000
        ).collect()
    }
    exact = {
        r.o_orderpriority: (r.p50, r.p90)
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    for k, (p50, p90) in exact.items():
        a50, a90 = approx[k]
        assert abs(a50 - p50) / p50 < 0.05
        assert abs(a90 - p90) / p90 < 0.05


def test_frequent_items_finds_heavy_hitters(spark):
    from airbnb_pyspark_jobs_spark.operators.sketches import frequent_items

    import pyspark.sql.functions as F

    # one value takes ~50% of rows, the rest are near-unique noise
    df = spark.range(10_000).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id")).alias("v")
    )
    out = frequent_items(df, ["v"], support=0.3)
    assert 7 in out["v"]  # no false negatives above support
    assert len(out["v"]) <= 5  # bounded shortlist, not the whole domain


def test_kmv_sketch_merge_closure_and_accuracy(spark):
    """KMV merge closure: the k smallest of the union of per-day
    sketches equals the sketch built from ALL keys directly; estimate
    error bounded (~1/sqrt(k) relative) on a known-cardinality set."""
    from pyspark.sql import functions as F

    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int
    from airbnb_pyspark_jobs_spark.operators.sketches import (
        kmv_daily_sketches,
        kmv_merge_estimate,
    )

    k = 32
    n_users = 500
    # NOTE the key format: a KMV estimate from a FIXED key set is one
    # deterministic draw from the estimator's distribution — the bare
    # "0".."499" set happens to clump at the hash low end (h_32 at ~8x
    # the typical deviation → 72% error); "user{u}x" draws typically
    # (~10%). The accuracy bound below is statistical, so the test key
    # set must be a typical draw; closure (the real invariant) holds
    # for ANY key set.
    rows = [(u % 10, f"user{u}x") for u in range(n_users)]  # 10 "days"
    df = (
        spark.createDataFrame(rows, ["d", "user_id"])
        .withColumn("ts", F.to_timestamp(F.format_string("2024-01-%02d", F.col("d") + 1)))
    )
    daily = kmv_daily_sketches(df, "ts", "user_id", k=k)
    merged = kmv_merge_estimate(daily, k=k).collect()[0]
    # closure: merged sketch == sketch of the union built directly
    direct = sorted(
        r["h"]
        for r in df.select(
            portable_hash_int(F.col("user_id").cast("string")).alias("h")
        )
        .distinct()
        .orderBy("h")
        .limit(k)
        .collect()
    )
    assert merged["kth_hash"] == direct[-1] and merged["n_kept"] == k
    # estimate within 3/sqrt(k) relative error of the true 500
    assert abs(merged["est_distinct"] - n_users) / n_users < 3 / (k**0.5)


def test_cms_one_sided_error_and_mergeability(spark):
    """CMS point estimates never underestimate (collisions only add),
    and counter tables merge by (r, b) addition: CMS(A) + CMS(B) ==
    CMS(A union B) for disjoint weighted key sets."""
    from pyspark.sql import functions as F

    from airbnb_pyspark_jobs_spark.operators.sketches import (
        cms_counters,
        cms_estimates,
    )

    d, w = 4, 8
    a = spark.createDataFrame(
        [(f"k{i}", i + 1) for i in range(20)], ["key", "wt"]
    )
    b = spark.createDataFrame(
        [(f"k{i}", 2 * i + 1) for i in range(20, 40)], ["key", "wt"]
    )
    both = a.unionByName(b)
    exact = {r["key"]: r["wt"] for r in both.collect()}
    est = {
        r["key"]: r["cms_est"]
        for r in cms_estimates(
            both.select("key"), cms_counters(both, "key", "wt", d, w), "key", d, w
        ).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)  # one-sided, always
    # merge: summing the two counter tables == counters of the union
    merged = (
        cms_counters(a, "key", "wt", d, w)
        .unionByName(cms_counters(b, "key", "wt", d, w))
        .groupBy("r", "b")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    direct = cms_counters(both, "key", "wt", d, w)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_exact_quantiles_match_sorted_definition_with_ties(spark):
    """Distributed exact quantiles == the value at rank ceil(p*n) of the
    sorted sequence, on a ties-heavy distribution (the case where rank
    arithmetic goes wrong first)."""
    from math import ceil

    from airbnb_pyspark_jobs_spark.operators.sketches import exact_quantiles

    vals = [float(v % 7) for v in range(1000)]  # heavy ties, 7 distinct
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    probs = [0.1, 0.5, 0.9]
    got = {r["p"]: r["value"] for r in exact_quantiles(df, "x", probs).collect()}
    srt = sorted(vals)
    for p in probs:
        assert got[p] == srt[max(1, ceil(p * len(vals))) - 1]


def test_exact_quantiles_by_group_with_degenerate_group(spark):
    """Grouped exact quantiles: each group ranked independently,
    including a group whose values are ALL EQUAL (zero range — the
    width guard must not divide by zero or misbucket)."""
    from math import ceil

    from airbnb_pyspark_jobs_spark.operators.sketches import exact_quantiles_by

    rows = [("a", float(v)) for v in range(100)] + [("b", 7.0)] * 50
    df = spark.createDataFrame(rows, ["g", "x"])
    probs = [0.5, 0.9]
    got = {
        (r["g"], r["p"]): r["value"]
        for r in exact_quantiles_by(df, ["g"], "x", probs).collect()
    }
    a_sorted = sorted(float(v) for v in range(100))
    for p in probs:
        assert got[("a", p)] == a_sorted[max(1, ceil(p * 100)) - 1]
        assert got[("b", p)] == 7.0


def test_exact_quantiles_one_row_per_prob_on_rank_collision(spark):
    """Two probs that land on the SAME rank at small n must both appear
    in the output (sharing rank and value) — requested probs are never
    silently collapsed."""
    from airbnb_pyspark_jobs_spark.operators.sketches import exact_quantiles

    df = spark.createDataFrame([(float(v),) for v in range(10)], "x double")
    probs = [0.45, 0.5]  # ceil(4.5) == ceil(5.0) == rank 5: true collision
    rows = exact_quantiles(df, "x", probs).collect()
    assert len(rows) == 2
    assert sorted(r["p"] for r in rows) == sorted(probs)
    assert {r["rank"] for r in rows} == {5}
    assert {r["value"] for r in rows} == {4.0}
    # adjacent-rank probs also stay distinct rows
    rows2 = exact_quantiles(df, "x", [0.5, 0.5000001]).collect()
    assert len(rows2) == 2 and {r["rank"] for r in rows2} == {5, 6}


def test_exact_quantiles_by_one_row_per_prob_on_rank_collision(spark):
    """Grouped form of the collision contract: one row per (group, p)."""
    from airbnb_pyspark_jobs_spark.operators.sketches import exact_quantiles_by

    rows_in = [("a", float(v)) for v in range(10)]
    df = spark.createDataFrame(rows_in, ["g", "x"])
    probs = [0.45, 0.5]  # both -> rank 5 in a 10-row group
    rows = exact_quantiles_by(df, ["g"], "x", probs).collect()
    assert len(rows) == 2
    assert sorted(r["p"] for r in rows) == sorted(probs)
    assert all(r["rank"] == 5 and r["value"] == 4.0 for r in rows)


def test_cms_estimates_unseen_key_returns_zero(spark):
    """A probed key absent from the build set must yield an estimate
    (possibly 0 when all its buckets are empty), never vanish."""
    from airbnb_pyspark_jobs_spark.operators.sketches import (
        cms_counters,
        cms_estimates,
    )

    d, w = 4, 4096  # wide sketch: tiny build set leaves most buckets empty
    build = spark.createDataFrame([("alpha", 5), ("beta", 3)], ["key", "wt"])
    probe = spark.createDataFrame(
        [("alpha",), ("never_seen_key_xyz",)], ["key"]
    )
    counters = cms_counters(build, "key", "wt", d, w)
    est = {
        r["key"]: r["cms_est"]
        for r in cms_estimates(probe, counters, "key", d, w).collect()
    }
    assert set(est) == {"alpha", "never_seen_key_xyz"}
    assert est["alpha"] >= 5
    assert est["never_seen_key_xyz"] == 0


# ---------------------------------------------------------------------------
# bottom-k sample quantile sketch (q109 family)
# ---------------------------------------------------------------------------
def test_bottomk_sample_merge_closure(spark):
    """k smallest (h, v) of the union of per-day sketches == the
    bottom-k sketch computed directly over all rows (disjoint groups)."""
    from airbnb_pyspark_jobs_spark.functions.text import portable_hash_int
    from airbnb_pyspark_jobs_spark.operators.sketches import (
        bottomk_sample_merge,
        bottomk_sample_sketches,
    )

    k = 64
    events = load_table(spark, "events", SF_DIR)
    daily = bottomk_sample_sketches(events, "ts", "value", "event_id", k=k)
    merged = sorted(
        (r.h, r.v) for r in bottomk_sample_merge(daily, k=k).collect()
    )
    direct = sorted(
        (r.h, r.v)
        for r in events.filter(F.col("value").isNotNull())
        .select(
            portable_hash_int(F.col("event_id").cast("string")).alias("h"),
            F.col("value").cast("double").alias("v"),
        )
        .orderBy("h", "v")
        .limit(k)
        .collect()
    )
    assert merged == direct and len(merged) == k


def test_sample_quantiles_exact_when_sample_is_whole_population(spark):
    """k >= n: the sample IS the data, so type-1 sample quantiles equal
    exact type-1 quantiles."""
    from airbnb_pyspark_jobs_spark.operators.sketches import (
        bottomk_sample_merge,
        bottomk_sample_sketches,
        sample_quantiles,
    )

    rows = [(i, f"2024-01-0{1 + i % 3}", float(v)) for i, v in enumerate([5, 1, 9, 3, 7, 2, 8, 4, 6, 0])]
    df = spark.createDataFrame(rows, "event_id long, ts string, value double").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    daily = bottomk_sample_sketches(df, "ts", "value", "event_id", k=100)
    est = {
        r.p: r.est_value
        for r in sample_quantiles(
            bottomk_sample_merge(daily, k=100), [0.1, 0.5, 1.0]
        ).collect()
    }
    # type-1 quantile of 0..9: value at rank ceil(p*10)
    assert est == {0.1: 0.0, 0.5: 4.0, 1.0: 9.0}


def test_sample_quantile_rank_error_statistically_bounded(spark):
    """Rank error of a k=256 uniform sample is ~1/sqrt(k) ≈ 0.06; this
    fixed draw (md5 of event_id) is one typical realization — assert a
    loose 3-sigma-ish bound, not the expectation."""
    import __spark_entry__ as E

    out = E.queries()["q109_quantile_sketch_rollup"](spark, SF_DIR).collect()
    assert len(out) == 6
    assert all(r.rank_err <= 0.2 for r in out)
    assert all(r.n_sample == 256 for r in out)


def test_heavy_hitter_shortlist_has_no_false_negatives(spark):
    """CMS one-sided error => every TRUE heavy hitter (exact >= thr)
    must appear in the candidate shortlist."""
    import __spark_entry__ as E

    out = E.queries()["q110_heavy_hitters"](spark, SF_DIR).collect()
    assert out, "empty shortlist"
    thr = out[0].threshold
    shortlist = {r.user_id for r in out}
    events = load_table(spark, "events", SF_DIR)
    true_hh = {
        r.user_id
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= thr)
        .collect()
    }
    assert true_hh <= shortlist
    assert {r.user_id for r in out if r.true_hh} == true_hh


def test_equi_depth_histogram_balanced_bins(spark):
    from airbnb_pyspark_jobs_spark.operators.sketches import equi_depth_histogram

    df = spark.range(103).select((F.col("id") * 2).cast("double").alias("v"))
    out = sorted(
        equi_depth_histogram(df, "v", n_bins=4).collect(), key=lambda r: r.bin
    )
    assert [r.bin for r in out] == [1, 2, 3, 4]
    # 103 rows over 4 bins -> populations differ by at most one
    sizes = [r.n_rows for r in out]
    assert sum(sizes) == 103
    assert max(sizes) - min(sizes) <= 1
    # bins tile the value range in order
    for a, b in zip(out, out[1:]):
        assert a.hi <= b.lo
    assert out[0].lo == 0.0 and out[-1].hi == 204.0


def test_equi_depth_histogram_skew_still_equal_depth(spark):
    from airbnb_pyspark_jobs_spark.operators.sketches import equi_depth_histogram

    # 90% of mass at one value: equal-WIDTH would put ~everything in
    # bin 1; equal-depth must still split populations evenly
    rows = [(5.0,)] * 90 + [(float(100 + i),) for i in range(10)]
    df = spark.createDataFrame(rows, "v double")
    out = sorted(
        equi_depth_histogram(df, "v", n_bins=10).collect(), key=lambda r: r.bin
    )
    assert all(r.n_rows == 10 for r in out)
    assert out[0].lo == out[0].hi == 5.0


def test_weighted_reservoir_exact_quota_and_determinism(spark):
    from airbnb_pyspark_jobs_spark.operators.sampling import (
        weighted_reservoir_sample,
    )

    rows = [(f"s{i % 3}", i, 1.0 + (i % 7)) for i in range(90)]
    df = spark.createDataFrame(rows, "g string, id long, w double")
    out = weighted_reservoir_sample(df, "g", "w", k=4, id_col="id")
    got = out.collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, []).append(r)
    assert all(len(v) == 4 for v in by_g.values())
    assert all(sorted(r.rn for r in v) == [1, 2, 3, 4] for v in by_g.values())
    again = {
        (r.g, r.id)
        for r in weighted_reservoir_sample(df, "g", "w", k=4, id_col="id").collect()
    }
    assert {(r.g, r.id) for r in got} == again


def test_weighted_reservoir_huge_weight_always_selected(spark):
    from airbnb_pyspark_jobs_spark.operators.sampling import (
        weighted_reservoir_sample,
    )

    # ln(u)/w -> ~0- as w -> inf: the giant-weight row must win rank 1
    rows = [("a", i, 1.0) for i in range(50)] + [("a", 999, 1e12)]
    df = spark.createDataFrame(rows, "g string, id long, w double")
    out = weighted_reservoir_sample(df, "g", "w", k=3, id_col="id").collect()
    assert sorted(r.rn for r in out) == [1, 2, 3]
    assert [r.id for r in out if r.rn == 1] == [999]


def test_grouped_spearman_known_values(spark):
    import math

    from airbnb_pyspark_jobs_spark.operators.sketches import grouped_spearman

    rows = (
        # g=up: perfectly monotone -> rho = 1
        [("up", float(i), i * 10) for i in range(6)]
        # g=down: perfectly anti-monotone -> rho = -1
        + [("down", float(i), -i) for i in range(6)]
        # g=tied: x has ties; compare against scipy-identical hand calc
        + [("tied", v, y) for v, y in [(1.0, 1), (1.0, 2), (2.0, 3), (3.0, 4)]]
    )
    df = spark.createDataFrame(rows, "g string, x double, y long")
    out = {r.g: r for r in grouped_spearman(df, "g", "x", "y").collect()}
    assert out["up"].spearman_rho == 1.0
    assert out["down"].spearman_rho == -1.0
    # tied case: avg ranks x = [1.5, 1.5, 3, 4], y = [1, 2, 3, 4]
    # d2 = 0.25+0.25 = 0.5; Sx = (60 - 6)/12 = 4.5, Sy = 60/12 = 5
    want = (4.5 + 5 - 0.5) / (2 * math.sqrt(4.5 * 5))
    assert abs(out["tied"].spearman_rho - round(want, 9)) < 1e-9


def test_grouped_spearman_constant_column_is_null(spark):
    from airbnb_pyspark_jobs_spark.operators.sketches import grouped_spearman

    df = spark.createDataFrame(
        [("a", 1.0, i) for i in range(4)], "g string, x double, y long"
    )
    out = grouped_spearman(df, "g", "x", "y").collect()
    assert out[0].spearman_rho is None


def test_grouped_trend_recovers_exact_line(spark):
    from airbnb_pyspark_jobs_spark.operators.sketches import grouped_trend

    # y = 300x + 500 exactly -> slope 300, intercept 500, r2 = 1
    rows = [("a", x, 300 * x + 500) for x in range(10)]
    # group b: constant x -> slope/intercept/r2 all NULL
    rows += [("b", 5, y) for y in (10, 20, 30)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {
        r.g: r
        for r in grouped_trend(df, "g", F.col("x"), F.col("y")).collect()
    }
    assert out["a"].slope_cents == 300.0
    assert out["a"].intercept_cents == 500.0
    assert out["a"].r2 == 1.0
    assert out["b"].slope_cents is None and out["b"].r2 is None


def test_grouped_trend_constant_y_has_null_r2(spark):
    from airbnb_pyspark_jobs_spark.operators.sketches import grouped_trend

    df = spark.createDataFrame(
        [("a", x, 7) for x in range(5)], "g string, x long, y long"
    )
    out = grouped_trend(df, "g", F.col("x"), F.col("y")).collect()
    # slope 0 is well-defined; r2 is not (no y variance)
    assert out[0].slope_cents == 0.0
    assert out[0].r2 is None


def test_mad_outlier_query_flags_known_extreme(spark):
    """MAD gate on a constructed group: median 5, MAD 1 -> only the
    100.0 value exceeds 3*MAD."""
    from airbnb_pyspark_jobs_spark.plans import QUERIES

    # run the registry query on the real table just for schema sanity;
    # the semantic check uses a hand-built frame via the same operators
    from airbnb_pyspark_jobs_spark.operators.sketches import exact_quantiles_by

    base = spark.createDataFrame(
        [("a", v) for v in [400, 400, 500, 500, 500, 600, 600, 10000]],
        "event_type string, v long",
    )
    med = exact_quantiles_by(base, ["event_type"], "v", [0.5]).collect()
    assert med[0].value == 500.0  # rank ceil(8/2)=4 -> 500
    dv = base.withColumn("dev", F.abs(F.col("v") - F.lit(500)))
    mad = exact_quantiles_by(dv, ["event_type"], "dev", [0.5]).collect()
    assert mad[0].value == 100.0  # devs sorted: 0,0,0,100,100,100,100,9500
    flags = dv.filter(F.col("dev") > 3 * 100).collect()
    assert [r.v for r in flags] == [10000]


def test_kmv_intersections_exact_when_sketch_not_full(spark):
    from airbnb_pyspark_jobs_spark.operators.sketches import kmv_intersections

    # 30 keys per group, k=64 -> sketches never fill -> theta = 2^32
    # and the estimate collapses to the exact common count
    rows = [("a", i) for i in range(30)] + [("b", i) for i in range(10, 40)]
    df = spark.createDataFrame(rows, "g string, u long")
    out = kmv_intersections(df, "g", "u", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r.exact_inter == 20
    assert r.est_inter == 20.0 and r.abs_err == 0.0
    assert r.n_common_sample == 20


def test_kmv_intersections_estimates_within_sampling_error(spark):
    from airbnb_pyspark_jobs_spark.operators.sketches import kmv_intersections

    # 1500 keys each, 750 shared; k=64 sketch -> rough estimate but
    # within a loose statistical band (typical-draw key format)
    rows = [("a", f"user{i}x") for i in range(1500)]
    rows += [("b", f"user{i}x") for i in range(750, 2250)]
    df = spark.createDataFrame(rows, "g string, u string")
    r = kmv_intersections(df, "g", "u", k=64).collect()[0]
    assert r.exact_inter == 750
    assert 200 < r.est_inter < 2000  # k=64 theta intersection is noisy


def test_exact_quantiles_empty_input_returns_typed_empty(spark):
    """Percentile of the empty set is the empty set: an empty or
    all-null column yields ZERO rows with the normal (p, rank, value)
    schema — never an exception (q168's input can legitimately be
    empty when no purchase has a preceding view)."""
    from airbnb_pyspark_jobs_spark.operators.sketches import exact_quantiles

    empty = spark.range(0).select(F.col("id").cast("double").alias("x"))
    out = exact_quantiles(empty, "x", [0.5, 0.9])
    assert out.schema.simpleString() == "struct<p:double,rank:bigint,value:double>"
    assert out.count() == 0

    allnull = spark.range(5).select(F.lit(None).cast("double").alias("x"))
    assert exact_quantiles(allnull, "x", [0.5]).count() == 0


def test_grouped_trend_flat_negative_slope_never_negative_zero(spark):
    """A near-flat, slightly-negative trend can round to zero — the
    result must be +0.0 on the wire (engines disagree on the rounded
    zero's sign; repr-keyed oracle hashes distinguish -0.0)."""
    import math

    from airbnb_pyspark_jobs_spark.operators.sketches import grouped_trend

    # y decreases by 1 cent over 10_000 x-units: slope = -1e-4, which
    # rounds to 0.0 at out_digits=3.
    rows = [("g", 0, 100), ("g", 10_000, 99)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = grouped_trend(
        df, "g", x_col=F.col("x"), y_cents=F.col("y"), out_digits=3
    ).collect()[0]
    assert out["slope_cents"] == 0.0
    assert math.copysign(1.0, out["slope_cents"]) == 1.0


def test_hll_register_merge_closure(spark):
    """Element-wise MAX of two halves' registers must equal the whole
    corpus's registers (the merge property the streaming twin relies
    on), and the estimate from merged registers must equal the
    one-pass estimate."""
    from pyspark.sql import functions as F

    from airbnb_pyspark_jobs_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )

    df = spark.createDataFrame(
        [(1, f"user{i}") for i in range(200)], "g int, k string"
    )
    a = df.filter(F.length("k") <= 6)   # user0..user99
    b = df.filter(F.length("k") > 6)    # user100..user199
    whole = {
        (r.bucket): r.register
        for r in hll_registers(df, ["g"], "k", p=4).collect()
    }
    ra = hll_registers(a, ["g"], "k", p=4)
    rb = hll_registers(b, ["g"], "k", p=4)
    merged = {
        r.bucket: r.register
        for r in ra.unionByName(rb)
        .groupBy("g", "bucket")
        .agg(F.max("register").alias("register"))
        .collect()
    }
    assert merged == whole
    est_whole = hll_estimate_from_registers(
        hll_registers(df, ["g"], "k", p=4), ["g"], p=4
    ).collect()[0]
    # estimate within the ~1.04/sqrt(16)=26% band of 200 (typical draw;
    # the bound is statistical, not a hash-specific pin)
    assert abs(est_whole.est_distinct - 200) / 200 < 0.6


def test_gini_by_known_values(spark):
    from airbnb_pyspark_jobs_spark.operators.sketches import gini_by

    rows = (
        [("equal", i, 5) for i in range(4)]
        + [("concentrated", i, 0) for i in range(3)]
        + [("concentrated", 3, 10)]
        + [("zeros", i, 0) for i in range(3)]
    )
    df = spark.createDataFrame(rows, ["g", "k", "cents"])
    out = {r.g: r for r in gini_by(df, ["g"], "cents", "k").collect()}
    assert out["equal"].gini == 0.0
    # one holder takes all: G = (n-1)/n = 0.75
    assert out["concentrated"].gini == 0.75
    assert out["concentrated"].total == 10
    assert out["zeros"].gini is None


def test_gini_by_matches_naive(spark):
    import random

    from airbnb_pyspark_jobs_spark.operators.sketches import gini_by

    rng = random.Random(7)
    rows = [("a", i, rng.randrange(0, 10_000)) for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "k", "cents"])
    got = gini_by(df, ["g"], "cents", "k").collect()[0]
    xs = sorted(c for _, _, c in rows)
    n, s = len(xs), sum(xs)
    ix = sum((i + 1) * x for i, x in enumerate(xs))
    num, den = 2 * ix - (n + 1) * s, n * s
    expected = ((2_000_000 * num + den) // (2 * den)) / 1_000_000
    assert got.gini == expected and got.n == n and got.total == s


def test_weighted_median_by_known_values(spark):
    from airbnb_pyspark_jobs_spark.operators.sketches import weighted_median_by

    # group a: values 1..4 with weights 1,1,1,7 -> W=10, first v with
    # 2*cum>=10 is 4 (cum at 3 = 3). group b: equal weights -> lower
    # median. group c: one huge-weight low value dominates.
    rows = (
        [("a", 1, 1), ("a", 2, 1), ("a", 3, 1), ("a", 4, 7)]
        + [("b", 10, 2), ("b", 20, 2)]
        + [("c", 5, 100), ("c", 50, 1)]
    )
    df = spark.createDataFrame(rows, ["g", "v", "w"])
    out = {r.g: r for r in weighted_median_by(df, ["g"], "v", "w").collect()}
    assert out["a"].weighted_median == 4 and out["a"].total_weight == 10
    assert out["b"].weighted_median == 10
    assert out["c"].weighted_median == 5


def test_weighted_median_by_unit_weights_equals_lower_median(spark):
    import random

    from airbnb_pyspark_jobs_spark.operators.sketches import weighted_median_by

    rng = random.Random(11)
    vals = [rng.randrange(0, 1000) for _ in range(301)]
    df = spark.createDataFrame([("g", v, 1) for v in vals], ["g", "v", "w"])
    got = weighted_median_by(df, ["g"], "v", "w").collect()[0]
    xs = sorted(vals)
    # lower weighted median with unit weights = element at ceil(n/2)
    assert got.weighted_median == xs[(len(xs) + 1) // 2 - 1]


def test_grouped_two_phase_rank_is_permutation(spark):
    import random

    from airbnb_pyspark_jobs_spark.operators.sketches import (
        grouped_two_phase_rank,
    )

    rng = random.Random(3)
    rows = [(g, i, rng.randrange(0, 50)) for g in ("a", "b") for i in range(400)]
    df = spark.createDataFrame(rows, ["g", "tid", "v"])
    out = grouped_two_phase_rank(df, ["g"], "v", "tid", out_col="rk").collect()
    for g in ("a", "b"):
        sub = sorted(
            [(r.rk, r["__v"], r["__tie"]) for r in out if r.g == g]
        )
        assert [x[0] for x in sub] == list(range(1, 401))
        # ranks follow (value, tie) order
        assert sub == sorted(sub, key=lambda x: (x[1], x[2]))


def test_grouped_trend_survives_bigint_sum_overflow(spark):
    """Round-7 regression: micro-scaled ln inputs overflowed the BIGINT
    moment SUMS at ~3M rows/group (q308 stress) — ten rows of x ~ 3e9
    already push sum(x*x) past int64; the DECIMAL(38,0) accumulation
    must survive and still fit the exact line y = 2x."""
    from pyspark.sql import functions as F

    from airbnb_pyspark_jobs_spark.operators.sketches import grouped_trend

    df = spark.range(1, 11).select(
        F.lit("g").alias("g"),
        (F.col("id") * 300_000_000).alias("x"),
        (F.col("id") * 600_000_000).alias("y"),
    )
    # per-row x*x ~ 9e18 fits BIGINT; the 10-row sum (~3.5e20) does not
    out = grouped_trend(df, "g", F.col("x"), F.col("y")).collect()
    assert len(out) == 1
    assert out[0].slope_cents == 2.0 and out[0].r2 == 1.0
