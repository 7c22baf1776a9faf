"""Round-5 operators: triangle counts, perceptual-hash dedup, GD
classifier — value-level unit tests on constructed inputs."""

from __future__ import annotations

from pyspark.sql import Row

from airbnb_pyspark_jobs_spark.caching import release_owned_caches
from airbnb_pyspark_jobs_spark.operators.classifier import (
    score_fast_sigmoid,
    train_gd_fast_sigmoid,
)
from airbnb_pyspark_jobs_spark.operators.dedupe import triangle_counts
from airbnb_pyspark_jobs_spark.operators.multimodal import (
    PHASH_BAND_BITS,
    PHASH_BANDS,
    PHASH_GRID,
    _fake_resize,
    perceptual_hash,
    phash_pairs,
)


def test_triangle_counts_known_graph(spark):
    # triangle 1-2-3 plus pendant 3-4; edges deliberately include a
    # duplicate and a reversed copy (must collapse to the simple graph)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 1), (1, 2)], ["src", "dst"]
    )
    out = {r.node: r for r in triangle_counts(edges).collect()}
    assert {n: r.triangles for n, r in out.items()} == {1: 1, 2: 1, 3: 1, 4: 0}
    assert {n: r.deg for n, r in out.items()} == {1: 2, 2: 2, 3: 3, 4: 1}
    assert out[1].clustering == 1.0
    assert out[3].clustering == round(2 * 1 / (3 * 2), 6)
    assert out[4].clustering == 0.0


def test_triangle_counts_two_triangles_sharing_edge(spark):
    # K4 minus one edge: nodes 1..4, edges 12 13 14 23 24 (no 34)
    # triangles: (1,2,3) and (1,2,4); per-node: 1->2, 2->2, 3->1, 4->1
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], ["src", "dst"]
    )
    out = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}


def _py_phash(payload: bytes) -> list[int]:
    n_px = PHASH_GRID * PHASH_GRID
    t = _fake_resize(payload, PHASH_GRID, PHASH_GRID)
    s = sum(t)
    bits = [1 if n_px * t[i] > s else 0 for i in range(n_px)]
    return [
        sum(bits[PHASH_BAND_BITS * b + j] << j for j in range(PHASH_BAND_BITS))
        for b in range(PHASH_BANDS)
    ]


def test_perceptual_hash_matches_python_reference(spark):
    payloads = [bytes(range(100)), b"abcabcabc" * 20, bytes([7] * 64)]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], ["media_id", "payload"]
    )
    out = {r.media_id: r for r in perceptual_hash(df).collect()}
    for i, p in enumerate(payloads):
        expect = _py_phash(p)
        got = [out[i][f"b{b}"] for b in range(PHASH_BANDS)]
        assert got == expect, (i, got, expect)


def test_phash_pairs_identical_payloads_hamming_zero(spark):
    base = bytes(range(64, 192))
    near = bytes([base[0] ^ 0]) + base[1:]  # identical
    far = bytes(reversed(base))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["media_id", "payload"]
    )
    pairs = phash_pairs(perceptual_hash(df), max_hamming=0).collect()
    assert [(r.media_id_a, r.media_id_b, r.hamming) for r in pairs] == [(1, 2, 0)]


def test_phash_pairs_requires_pigeonhole_margin(spark):
    import pytest

    df = spark.createDataFrame([(1, b"x" * 64)], ["media_id", "payload"])
    with pytest.raises(ValueError):
        phash_pairs(perceptual_hash(df), max_hamming=PHASH_BANDS)


def test_gd_classifier_learns_separable_labels(spark):
    # y == 1 iff x1 is large: trivially separable on one feature
    rows = [
        Row(doc_id=i, y=1.0 if i < 20 else 0.0,
            x0=1.0, x1=2.0 if i < 20 else -2.0)
        for i in range(40)
    ]
    feats = spark.createDataFrame(rows)
    w = train_gd_fast_sigmoid(feats, ["x0", "x1"], "y", iters=10, lr=1.0)
    release_owned_caches()
    assert w[1] > 0.1  # learned the discriminative direction
    scored = score_fast_sigmoid(feats, ["x0", "x1"], w).collect()
    assert all(r.pred == int(r.y) for r in scored)


def test_gd_classifier_deterministic_across_runs(spark):
    rows = [
        Row(doc_id=i, y=float(i % 2), x0=1.0, x1=float(i) / 10.0)
        for i in range(30)
    ]
    feats = spark.createDataFrame(rows)
    w1 = train_gd_fast_sigmoid(feats, ["x0", "x1"], "y", iters=5)
    release_owned_caches()
    w2 = train_gd_fast_sigmoid(
        feats.repartition(7), ["x0", "x1"], "y", iters=5
    )
    release_owned_caches()
    assert w1 == w2  # DECIMAL sums: partitioning-independent


def test_two_phase_numeric_rank_matches_sorted_order(spark):
    from airbnb_pyspark_jobs_spark.operators.sampling import (
        two_phase_numeric_rank,
    )

    rows = [(i, ((i * 37) % 100) / 7.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(13)
    out = two_phase_numeric_rank(df, "v", "id", "rk", descending=True).collect()
    expect = {
        r[0]: i + 1
        for i, r in enumerate(sorted(rows, key=lambda r: (-r[1], r[0])))
    }
    assert {r.id: r.rk for r in out} == expect


def test_two_phase_numeric_cumsum_matches_prefix_sums(spark):
    from airbnb_pyspark_jobs_spark.operators.sampling import (
        two_phase_numeric_cumsum,
    )

    rows = [(i, float((i * 13) % 50), (i % 7) + 1) for i in range(150)]
    df = spark.createDataFrame(rows, ["id", "v", "w"]).repartition(11)
    out = two_phase_numeric_cumsum(df, "v", "id", "w", "cum").collect()
    acc, expect = 0, {}
    for r in sorted(rows, key=lambda r: (r[1], r[0])):
        acc += r[2]
        expect[r[0]] = acc
    assert {r.id: r.cum for r in out} == expect


def test_kcenter_coreset_known_points(spark):
    # 2-D unit-ish points: seed is lowest id (0, pointing +x); the
    # farthest point is 1 (+y, cosine distance 1.0); then 2 (diagonal,
    # 1 - cos45 = 0.2929); 3 is nearly collinear with 0 (never picked).
    from airbnb_pyspark_jobs_spark.operators.similarity import kcenter_coreset

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (2, [1.0, 1.0]),
            (3, [1.0, 0.01]),
        ],
        ["vec_id", "embedding"],
    )
    rows = kcenter_coreset(emb, k=3).orderBy("sel_round").collect()
    assert [(r.sel_round, r.vec_id) for r in rows] == [(0, 0), (1, 1), (2, 2)]
    assert rows[0].maximin_dist is None
    assert rows[1].maximin_dist == 1.0
    assert rows[2].maximin_dist == 0.2929


def test_kcenter_coreset_k_exceeds_n(spark):
    from airbnb_pyspark_jobs_spark.operators.similarity import kcenter_coreset

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    rows = kcenter_coreset(emb, k=5).collect()
    assert len(rows) == 2  # stops when every point is selected


def test_doremi_source_weights_upweights_worse_fit_source(spark):
    from airbnb_pyspark_jobs_spark.operators.sampling import doremi_source_weights

    docs = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], ["doc_id", "source"]
    )
    scores = spark.createDataFrame(
        [(1, -1.0), (2, -3.0), (3, -4.0)], ["doc_id", "mean_logprob"]
    )
    out = {r.source: r for r in doremi_source_weights(docs, scores).collect()}
    # global mean = -8/3 = -2.666667; excess A = -0.666667, B = 1.333333
    assert out["A"].src_mean_logprob == -2.0
    assert out["B"].src_mean_logprob == -4.0
    assert out["A"].excess == -0.666667
    assert out["B"].excess == 1.333333
    # shifted: A = eps = 0.01, B = 2.01; normalized over 2.02
    assert out["A"].mix_weight == round(0.01 / 2.02, 6)
    assert out["B"].mix_weight == round(2.01 / 2.02, 6)
    assert out["B"].mix_weight > out["A"].mix_weight
    assert abs(out["A"].mix_weight + out["B"].mix_weight - 1.0) < 1e-5


def test_minhash_calibration_identical_docs(spark):
    from airbnb_pyspark_jobs_spark.operators.dedupe import (
        minhash_estimate_calibration,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    near = text + " tail"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, near), (4, "completely different words here")],
        ["doc_id", "text"],
    )
    out = {(r.doc_id_a, r.doc_id_b): r for r in minhash_estimate_calibration(docs).collect()}
    # identical docs: estimator and exact both 1.0, zero error
    assert out[(1, 2)].est_jaccard == 1.0
    assert out[(1, 2)].jaccard == 1.0
    assert out[(1, 2)].abs_err == 0.0
    # every reported error is |est - exact| within [0, 1]
    for r in out.values():
        assert 0.0 <= r.abs_err <= 1.0
        assert abs(abs(r.est_jaccard - r.jaccard) - r.abs_err) < 1e-9


def test_ivf_cell_quality_two_obvious_clusters(spark):
    from airbnb_pyspark_jobs_spark.operators.similarity import ivf_cell_quality

    # two tight clusters around +x and +y; pass centroids directly so
    # the audit (not the trainer) is what's under test
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.02]),
            (2, [0.0, 1.0]),
            (3, [0.02, 1.0]),
        ],
        ["vec_id", "embedding"],
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = {r.cid: r for r in ivf_cell_quality(emb, centroids=cents).collect()}
    assert out[0].n_members == 2 and out[1].n_members == 2
    # members are within ~1 degree of their centroid: cosines ~1.0
    for r in out.values():
        assert r.min_sim >= 0.999
        assert 0.999 <= r.mean_sim <= 1.0


def test_source_kl_divergence_hand_computed(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import source_kl_divergence

    # A is all-x, B is all-y; global is 50/50 -> KL = ln 2 for both
    docs = spark.createDataFrame(
        [(1, "x x", "A"), (2, "y y", "B")], ["doc_id", "text", "source"]
    )
    out = {r.source: r for r in source_kl_divergence(docs).collect()}
    assert out["A"].n_tokens == 2 and out["A"].n_terms == 1
    assert out["A"].kl_divergence == 0.693147  # round(ln 2, 6)
    assert out["B"].kl_divergence == 0.693147


def test_source_kl_divergence_identical_sources_zero(spark):
    from airbnb_pyspark_jobs_spark.operators.corpus import source_kl_divergence

    docs = spark.createDataFrame(
        [(1, "a b c", "A"), (2, "a b c", "B")], ["doc_id", "text", "source"]
    )
    for r in source_kl_divergence(docs).collect():
        assert r.kl_divergence == 0.0


def test_kcenter_maximin_dists_non_increasing_on_corpus(spark):
    from airbnb_pyspark_jobs_spark.operators.similarity import kcenter_coreset
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, "embeddings", SF_DIR)
    rows = kcenter_coreset(emb, k=6).orderBy("sel_round").collect()
    ids = [r.vec_id for r in rows]
    assert len(ids) == len(set(ids))  # never re-picks
    dists = [r.maximin_dist for r in rows[1:]]
    # the min-dist state only shrinks as centers accumulate, so the
    # greedy picks' maximin values are non-increasing
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    assert all(d >= 0.0 for d in dists)


def test_dedup_threshold_curve_monotone(spark):
    from airbnb_pyspark_jobs_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    rows = sorted(
        QUERIES["q164_dedup_threshold_curve"](spark, SF_DIR).collect(),
        key=lambda r: r.threshold,
    )
    pairs = [r.n_pairs for r in rows]
    docs = [r.n_docs for r in rows]
    # raising the cutoff can only shrink the pair set and its doc cover
    assert all(a >= b for a, b in zip(pairs, pairs[1:]))
    assert all(a >= b for a, b in zip(docs, docs[1:]))
    assert all(r.n_docs <= 2 * r.n_pairs for r in rows)


def test_vocab_coverage_curve_monotone(spark):
    from airbnb_pyspark_jobs_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    rows = sorted(
        QUERIES["q163_vocab_coverage_curve"](spark, SF_DIR).collect(),
        key=lambda r: r.k,
    )
    assert [r.k for r in rows] == [10, 100, 1000]
    cov = [r.coverage for r in rows]
    assert all(0.0 < c <= 1.0 for c in cov)
    assert all(a <= b for a, b in zip(cov, cov[1:]))  # more terms, more mass


def test_ivf_label_purity_pure_cell_entropy_positive_zero(spark):
    """A single-label (pure) cell has entropy exactly 0 — and it must
    be +0.0, not -0.0 (the -sum(terms) negation flips the sign of the
    rounded zero; oracle value-hashes distinguish the two)."""
    import math

    from airbnb_pyspark_jobs_spark.operators.similarity import (
        ivf_cell_label_purity,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], "a"),
            (1, [1.0, 0.02], "a"),
            (2, [0.0, 1.0], "a"),
            (3, [0.02, 1.0], "b"),
        ],
        ["vec_id", "embedding", "label"],
    )
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    out = {r.cid: r for r in ivf_cell_label_purity(emb, centroids=cents).collect()}
    pure = out[0]  # both +x members labeled "a"
    assert pure.n_labels == 1 and pure.majority_share == 1.0
    assert pure.label_entropy == 0.0
    assert math.copysign(1.0, pure.label_entropy) == 1.0
    mixed = out[1]
    assert mixed.n_labels == 2 and mixed.label_entropy > 0.6


def test_q220_mann_whitney_matches_naive_midranks(spark):
    # Recompute U1 and the tie-corrected z from raw rows with naive
    # per-row midranks (pandas average ranks) and compare to the
    # grouped-histogram plan — same statistic, independent derivation.
    import math
    import os

    import pandas as pd

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    got = QUERIES["q220_mann_whitney_u"](spark, sf_dir).collect()[0]

    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    ev = ev[ev.event_type.isin(["purchase", "view"])].copy()
    v = ev.value.round(2)
    ranks = v.rank(method="average")
    a = ev.event_type == "purchase"
    n1, n2 = int(a.sum()), int((~a).sum())
    r1 = float(ranks[a].sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    t = v.value_counts()
    tie3 = float((t**3 - t).sum())
    n = n1 + n2
    var_u = n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var_u)
    assert (got.n1, got.n2) == (n1, n2)
    assert got.u1 == u1
    assert abs(got.z - z) < 1e-6


def test_q221_decile_lift_invariants(spark):
    # Structural invariants of a gains table: deciles 1..10 partition
    # the corpus (sizes differ by <=1), cum_pos ends at the total
    # positive count, final capture is exactly 1.0, and the
    # n_docs-weighted mean of pos_rate recovers the base rate.
    import os

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    rows = sorted(
        QUERIES["q221_decile_lift"](spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    total_pos = sum(r.n_pos for r in rows)
    assert rows[-1].cum_pos == total_pos
    assert rows[-1].capture == 1.0
    n = sum(sizes)
    base = total_pos / n
    weighted = sum(r.pos_rate * r.n_docs for r in rows) / n
    assert abs(weighted - base) < 1e-4
    # lift of 1.0 overall: weighted mean of lift ~= 1
    wl = sum(r.lift * r.n_docs for r in rows) / n
    assert abs(wl - 1.0) < 1e-3


def test_q222_modularity_invariants(spark):
    # Degree mass sums to 2m, intra-source edges never exceed m, and
    # modularity Q = sum(contribution) lies in [-0.5, 1].
    import os

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    rows = QUERIES["q222_dup_modularity"](spark, sf_dir).collect()
    m2 = sum(r.d_sum for r in rows)
    assert m2 % 2 == 0 and m2 > 0
    m = m2 // 2
    assert sum(r.e_in for r in rows) <= m
    q = sum(r.contribution for r in rows)
    assert -0.5 <= q <= 1.0


def test_q223_daily_acf_matches_naive_pandas(spark):
    # Recompute the zero-filled per-type daily series and lag-L Pearson
    # correlations naively in pandas; compare every (type, lag) cell.
    import os

    import numpy as np
    import pandas as pd

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    got = {
        (r.event_type, r.lag): r
        for r in QUERIES["q223_daily_acf"](spark, sf_dir).collect()
    }
    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    ev["d"] = pd.to_datetime(ev.ts).dt.normalize()
    for typ, grp in ev.groupby("event_type"):
        daily = grp.groupby("d").size()
        idx = pd.date_range(daily.index.min(), daily.index.max(), freq="D")
        s = daily.reindex(idx, fill_value=0).to_numpy(dtype=float)
        for lag in range(1, 8):
            x, y = s[:-lag], s[lag:]
            r = got[(typ, lag)]
            assert r.n_pairs == len(x)
            if x.std() == 0 or y.std() == 0:
                assert r.acf is None
                continue
            expected = float(np.corrcoef(x, y)[0, 1])
            assert abs(r.acf - expected) < 1e-6, (typ, lag)


def test_q227_transition_entropy_bounds_and_identity(spark):
    # 0 <= H(next|a) <= log2(n_targets); contributions sum to the
    # naive pandas entropy rate of the transition matrix.
    import math
    import os

    import pandas as pd

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    rows = QUERIES["q227_transition_entropy"](spark, sf_dir).collect()
    for r in rows:
        assert -1e-9 <= r.h_cond <= math.log2(r.n_targets) + 1e-9

    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["from"] = ev.groupby("user_id").event_type.shift()
    pairs = ev.dropna(subset=["from"])
    n = len(pairs)
    rate = 0.0
    for a, grp in pairs.groupby("from"):
        na = len(grp)
        h = -sum(
            (c / na) * math.log2(c / na)
            for c in grp.event_type.value_counts()
        )
        rate += (na / n) * h
    got_rate = sum(r.rate_contribution for r in rows)
    assert abs(got_rate - rate) < 1e-4


def test_q228_embedding_qa_flags_constructed_degenerates(spark, tmp_path):
    # A corpus with one zero vector and one 100x-norm vector: the audit
    # must count the zero, flag the outlier, and report dims=1 distinct.
    import os

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    base = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)]
    rows = base + [(100, [0.0, 0.0, 0.0, 0.0]), (101, [100.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    d = str(tmp_path / "emb")
    df.write.parquet(os.path.join(d, "embeddings.parquet"))
    out = QUERIES["q228_embedding_qa"](spark, d).collect()[0]
    assert out.n_vecs == 42
    assert out.n_dims_distinct == 1
    assert out.n_zero_norm == 1
    assert out.median_norm == 1.0
    assert out.mad_norm == 0.0
    # zero-vector and the 100x vector both deviate > 5*MAD (= 0)
    assert out.n_outliers == 2
    assert out.max_norm == 100.0 and out.min_norm == 0.0


def test_q230_dispersion_matches_naive_pandas(spark):
    import os

    import pandas as pd

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    got = {
        r.event_type: r
        for r in QUERIES["q230_daily_dispersion"](spark, sf_dir).collect()
    }
    ev = pd.read_parquet(os.path.join(sf_dir, "events.parquet"))
    ev["d"] = pd.to_datetime(ev.ts).dt.normalize()
    for typ, grp in ev.groupby("event_type"):
        daily = grp.groupby("d").size()
        idx = pd.date_range(daily.index.min(), daily.index.max(), freq="D")
        s = daily.reindex(idx, fill_value=0).astype(float)
        r = got[typ]
        assert r.n_days == len(s)
        assert abs(r.mean_daily - s.mean()) < 1e-5
        assert abs(r.variance - s.var(ddof=1)) < 1e-5
        assert abs(r.fano - s.var(ddof=1) / s.mean()) < 1e-5


def test_q232_bounce_rate_constructed_sessions(spark, tmp_path):
    # user 1: [view] alone (bounce), then 40 min later [click,purchase]
    # (not a bounce, entry=click). user 2: single [view] (bounce).
    import datetime as dt
    import os

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def r(eid, ts, uid, typ):
        return (eid, ts, uid, typ, 1.0, "{}")

    rows = [
        r(1, t0, 1, "view"),
        r(2, t0 + dt.timedelta(minutes=40), 1, "click"),
        r(3, t0 + dt.timedelta(minutes=41), 1, "purchase"),
        r(4, t0, 2, "view"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = str(tmp_path / "ev")
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = {
        x.entry_type: x
        for x in QUERIES["q232_session_bounce_rate"](spark, d).collect()
    }
    assert out["view"].n_sessions == 2 and out["view"].n_bounces == 2
    assert out["view"].bounce_rate == 1.0
    assert out["click"].n_sessions == 1 and out["click"].n_bounces == 0
    assert out["click"].mean_session_events == 2.0


def test_q233_copurchase_lift_symmetric_and_bounded(spark):
    import os

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    rows = QUERIES["q233_copurchase_lift"](spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert r.part_a < r.part_b
        assert 2 <= r.n_ab <= min(r.n_orders_a, r.n_orders_b)
        assert r.lift > 0


def test_q234_fertility_bounds(spark):
    # fertility >= 1 (a word is at least one BPE token); chars per
    # token is positive and below the raw chars-per-word.
    import os

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    rows = QUERIES["q234_tokenizer_fertility"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.fertility >= 1.0
        assert 0 < r.chars_per_token
        assert r.n_bpe_tokens >= r.n_words


def test_q236_weekly_bands_ordered(spark):
    import os

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    rows = QUERIES["q236_weekly_value_bands"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p10 <= r.p50 <= r.p90
        assert r.n_purchases > 0
        assert r.week_start.weekday() == 0  # ISO Monday on both engines


def test_q237_jsd_bounds_and_naive_parity(spark):
    # 0 <= JSD <= ln 2; spot-check one pair against a naive pandas
    # mixture computation (tolerance covers the 1e-6 per-term
    # rounding and the rounded ln2 constant).
    import math
    import os
    import re
    from collections import Counter

    import pandas as pd

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    rows = QUERIES["q237_source_jsd_matrix"](spark, sf_dir).collect()
    ln2 = math.log(2)
    for r in rows:
        assert -1e-6 <= r.jsd <= ln2 + 1e-6

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    pair = (rows[0].source_a, rows[0].source_b)

    def dist(src):
        c = Counter()
        for t in docs[docs.source == src].text:
            c.update(w.lower() for w in re.split(r"\s+", t.strip()) if w)
        n = sum(c.values())
        return {k: v / n for k, v in c.items()}

    p, q = dist(pair[0]), dist(pair[1])
    jsd = 0.0
    for t in set(p) | set(q):
        pt, qt = p.get(t, 0.0), q.get(t, 0.0)
        m = (pt + qt) / 2
        if pt:
            jsd += 0.5 * pt * math.log(pt / m)
        if qt:
            jsd += 0.5 * qt * math.log(qt / m)
    assert abs(rows[0].jsd - jsd) < 1e-3


def test_q239_text_hygiene_constructed(spark, tmp_path):
    import os

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    rows = [
        (1, "clean ascii text", "en", "s0", 16),
        (2, "   ", "en", "s0", 3),
        (3, "ctrl\x07here", "en", "s0", 9),
        (4, "moji�bake", "en", "s0", 9),
        (5, "dos\r\nline", "en", "s0", 9),
        (6, "你好世界 ok", "en", "s0", 7),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    d = str(tmp_path / "docs")
    df.write.parquet(os.path.join(d, "documents.parquet"))
    out = QUERIES["q239_text_hygiene"](spark, d).collect()[0]
    assert out.n_docs == 6
    assert out.n_blank == 1
    assert out.n_control == 1
    assert out.n_replacement == 1
    assert out.n_cr == 1
    assert out.n_nonascii_heavy == 1  # 4 CJK of 7 chars > 30%


def test_q242_auc_matches_manual_rank_sum(spark):
    """AUC/Gini/KS invariants plus a brute-force pairwise AUC replay:
    AUC must equal (#(pos>neg) + 0.5·#ties) / (n1·n0) over all
    (pos, neg) score pairs of the q147 classifier output."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    out = QUERIES["q242_classifier_roc_auc"](spark, SF_DIR).collect()[0]
    assert 0.0 <= out.auc <= 1.0
    assert abs(out.gini - (2 * out.auc - 1)) < 2e-6
    assert 0.0 <= out.ks <= 1.0

    scored = QUERIES["q147_quality_classifier_gd"](spark, SF_DIR).collect()
    pos = sorted(round(r.p, 6) for r in scored if r.y == 1.0)
    neg = sorted(round(r.p, 6) for r in scored if r.y == 0.0)
    assert out.n_pos == len(pos) and out.n_neg == len(neg)
    import bisect

    wins = sum(bisect.bisect_left(neg, p) for p in pos)
    ties = sum(
        bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p) for p in pos
    )
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(out.auc - auc) < 2e-6


def test_q243_kaplan_meier_invariants(spark):
    """Survival starts ≤ 1, is non-increasing in t, n_at_risk strictly
    decreases, and the t=0 row sees every subject at risk."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = sorted(
        QUERIES["q243_kaplan_meier"](spark, SF_DIR).collect(),
        key=lambda r: r.t_days,
    )
    assert rows, "no survival rows"
    n_subjects = sum(r.n_events + r.n_censored for r in rows)
    assert rows[0].n_at_risk == n_subjects
    last_s, last_n = 1.0 + 1e-9, n_subjects + 1
    for r in rows:
        assert r.survival <= last_s + 1e-9
        assert r.n_at_risk < last_n
        assert r.n_events + r.n_censored >= 1
        last_s, last_n = r.survival, r.n_at_risk
    # every subject leaves exactly once
    assert sum(r.n_events + r.n_censored for r in rows) == n_subjects


def test_q244_zorder_beats_natural_layout(spark):
    """The point of the Morton layout: per-block key-span fractions
    must be materially tighter than arrival order on BOTH dimensions."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = {
        r.layout: r
        for r in QUERIES["q244_zorder_layout_audit"](spark, SF_DIR).collect()
    }
    z, nat = rows["zorder"], rows["natural"]
    assert z.n_blocks == nat.n_blocks == 64
    assert z.avg_partkey_span_frac < 0.5 * nat.avg_partkey_span_frac
    assert z.avg_suppkey_span_frac < 0.5 * nat.avg_suppkey_span_frac


def test_q245_stationary_is_a_distribution_and_fixpoint(spark):
    """The 12-step power iterate must be a probability distribution and
    (this matrix mixes fast) a numerical fixpoint of d·P replayed in
    python floats from the q131 transition matrix."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q245_markov_stationary"](spark, SF_DIR).collect()
    w = {r.event_type: r.stationary_prob for r in rows}
    assert abs(sum(w.values()) - 1.0) < 1e-4
    assert all(v > 0 for v in w.values())

    trans = QUERIES["q131_event_transitions"](spark, SF_DIR).collect()
    tot = {}
    for t in trans:
        tot[t.from_type] = tot.get(t.from_type, 0) + t.n
    p = {(t.from_type, t.to_type): t.n / tot[t.from_type] for t in trans}
    nxt = {
        to: sum(w[fr] * p.get((fr, to), 0.0) for fr in w) for to in w
    }
    for to in w:
        assert abs(nxt[to] - w[to]) < 1e-3, (to, nxt[to], w[to])


def test_q246_entities_group_spelling_variants(spark):
    """Every reported entity has >= 2 distinct names, all members are
    within the blocking contract (same first token), and the canonical
    name is the lexicographic component min."""
    from airbnb_pyspark_jobs_spark.operators.dedupe import dedup_components
    from airbnb_pyspark_jobs_spark.operators.linkage import blocked_fuzzy_pairs
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    from pyspark.sql import functions as F

    ents = QUERIES["q246_entity_resolution"](spark, SF_DIR).collect()
    assert all(e.n_names >= 2 for e in ents)
    assert all(e.n_parts >= e.n_names for e in ents)

    part = load_table(spark, "part", SF_DIR)
    pairs = blocked_fuzzy_pairs(
        part.select("p_name"), "p_name", max_distance=3
    ).select(
        F.col("name_a").alias("doc_id_a"), F.col("name_b").alias("doc_id_b")
    )
    comp = dedup_components(
        part.select(F.col("p_name").alias("doc_id")).distinct(), pairs
    ).collect()
    members = {}
    for r in comp:
        members.setdefault(r.component_id, []).append(r.doc_id)
    for e in ents:
        ms = members[e.canonical_name]
        assert min(ms) == e.canonical_name
        assert len(ms) == e.n_names


def test_q247_window_contains_daily(spark):
    """WAU(d) >= DAU(d), every presence lands in exactly 7 windows
    (minus truncation at the right edge), stickiness in (0, 1]."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q247_sliding_distinct_users"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.wau >= r.dau >= 0
        assert 0.0 <= r.stickiness <= 1.0


def test_q248_cumulative_ltv_monotone(spark):
    """Per cohort, cumulative revenue is non-decreasing in weeks_since
    and the first cell matches its own revenue."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q248_cohort_ltv"](spark, SF_DIR).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, []).append(r)
    for cells in by_cohort.values():
        cells.sort(key=lambda r: r.weeks_since)
        assert abs(cells[0].cumulative_revenue - cells[0].revenue) < 1e-6
        for a, b in zip(cells, cells[1:]):
            assert b.cumulative_revenue >= a.cumulative_revenue - 1e-6
            assert a.n_active >= 1


def test_q249_runs_tile_the_stream(spark):
    """Σ n_docs over sources equals the corpus, every mean run length
    is >= 1, and max_run_len <= n_docs."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    rows = QUERIES["q249_shuffle_run_audit"](spark, SF_DIR).collect()
    n_docs = load_table(spark, "documents", SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.n_runs >= 1 and r.max_run_len <= r.n_docs
        assert r.mean_run_len >= 1.0


def test_q250_bursts_are_consistent(spark):
    """Every reported burst has >= 3 errors; a user's total burst
    errors never exceed their error count; durations non-negative."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    bursts = QUERIES["q250_error_bursts"](spark, SF_DIR).collect()
    errs = {
        r.user_id: r.n
        for r in load_table(spark, "events", SF_DIR)
        .filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    per_user = {}
    for b in bursts:
        assert b.n_errors >= 3 and b.duration_seconds >= 0
        per_user[b.user_id] = per_user.get(b.user_id, 0) + b.n_errors
    for u, n in per_user.items():
        assert n <= errs[u]


def test_q251_psi_zero_on_identical_halves(spark, tmp_path):
    """A constructed corpus whose two halves have IDENTICAL value
    histograms per type must score PSI = 0 exactly."""
    import datetime as dt
    import os

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    rows = []
    eid = 0
    for half, day in ((0, 1), (1, 20)):
        for v in [1.0, 2.0, 2.0, 5.0, 9.0]:
            rows.append(
                (eid, dt.datetime(2024, 1, day), 1, "view", v, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = str(tmp_path / "ev")
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = QUERIES["q251_psi_drift"](spark, d).collect()
    assert len(out) == 1
    assert out[0].psi == 0.0
    assert out[0].n_ref == 5 and out[0].n_cur == 5


def test_q252_iv_nonnegative_and_label_feature_dominates(spark):
    """IV is non-negative by construction (sum of (p-q)ln(p/q) terms);
    the stopword-ratio feature (the lang signal q147 learns from) must
    carry more IV than doc length."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = {r.feature: r for r in QUERIES["q252_feature_iv"](spark, SF_DIR).collect()}
    assert set(rows) == {"x1_len", "x2_stopword_ratio", "x3_distinct_ratio"}
    for r in rows.values():
        assert r.iv >= 0.0


def test_q253_cosine_bounds_and_symmetric_support(spark):
    """Cosines in (0, 1], pairs ordered item_a < item_b, and the dot
    never exceeds what Cauchy-Schwarz allows for integer vectors."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q253_item_cosine_cf"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.item_a < r.item_b
        assert 0.0 < r.cosine <= 1.0 + 1e-9
        assert r.n_common_users >= 3
        assert r.dot >= r.n_common_users  # each common user adds >= 1


def test_q254_components_are_orthonormal(spark):
    """v1 and v2 from the deflated power iteration must be unit-norm
    and orthogonal (up to the 6-dp pinning)."""
    from airbnb_pyspark_jobs_spark.operators.similarity import (
        power_iteration_top2,
    )
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, "embeddings", SF_DIR)
    v1, v2, proj = power_iteration_top2(emb, dims=64, iters=4, digits=6)
    n1 = sum(x * x for x in v1)
    n2 = sum(x * x for x in v2)
    d12 = sum(a * b for a, b in zip(v1, v2))
    assert abs(n1 - 1.0) < 1e-4 and abs(n2 - 1.0) < 1e-4
    assert abs(d12) < 1e-2
    rows = proj.limit(5).collect()
    assert {c for c in proj.columns} == {"vec_id", "proj1", "proj2"}
    assert len(rows) == 5


def test_q255_hill_alpha_positive_and_ranked(spark):
    """α̂ > 0 always (top-k values >= the k-th order statistic) and a
    constructed Pareto(α=2) sample must estimate near 2."""
    import math

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    for r in QUERIES["q255_hill_tail_index"](spark, SF_DIR).collect():
        assert r.hill_alpha > 0
        assert r.k >= 2 and r.n >= r.k

    # analytic check: x = (1-u)^(-1/2) is Pareto with alpha = 2
    import datetime as dt
    import os

    xs = [(1 - (i + 0.5) / 4000) ** (-0.5) * 100 for i in range(4000)]
    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 28), 1, "view", x, "{}")
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = QUERIES["q255_hill_tail_index"](spark, d).collect()[0]
        assert abs(out.hill_alpha - 2.0) < 0.35, out.hill_alpha


def test_q256_chapman_bounds(spark):
    """m <= min(n1, n2); with full observation the estimate lands at
    (or below) the true count up to Chapman's bias correction."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    for r in QUERIES["q256_capture_recapture"](spark, SF_DIR).collect():
        assert r.m <= min(r.n1, r.n2)
        assert r.n_true <= r.n1 + r.n2
        assert r.n_hat > 0


def test_q257_topk_per_day(spark):
    """Exactly <= 3 rows per day, ranks 1..3 without gaps, counts
    non-increasing within a day."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q257_trending_items"](spark, SF_DIR).collect()
    days = {}
    for r in rows:
        days.setdefault(r.day, []).append(r)
    for d, rs in days.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(a.n >= b.n for a, b in zip(rs, rs[1:]))
        assert len(rs) <= 3


def test_q258_migration_matrix_is_consistent(spark):
    """Row/column marginals count each half's users exactly once;
    decile 0 never pairs with itself (a user absent from BOTH halves
    does not exist)."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q258_value_decile_migration"](spark, SF_DIR).collect()
    assert all(not (r.decile_ref == 0 and r.decile_cur == 0) for r in rows)
    ref_users = sum(r.n_users for r in rows if r.decile_ref > 0)
    cur_users = sum(r.n_users for r in rows if r.decile_cur > 0)
    # each populated decile 1..10 holds ~n/10 users per half
    from collections import Counter

    ref_by_decile = Counter()
    for r in rows:
        if r.decile_ref > 0:
            ref_by_decile[r.decile_ref] += r.n_users
    if ref_by_decile:
        lo, hi = min(ref_by_decile.values()), max(ref_by_decile.values())
        assert hi - lo <= 1, ref_by_decile
    assert ref_users > 0 and cur_users > 0


def test_q259_shares_sum_to_one(spark):
    """Nation shares within a region sum to 1, region shares of total
    sum to 1, and share_of_total = share_of_region × region share (up
    to independent rounding)."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q259_share_of_parent"](spark, SF_DIR).collect()
    by_region = {}
    regions = {}
    total = 0.0
    for r in rows:
        by_region.setdefault(r.region, 0.0)
        by_region[r.region] += r.share_of_region
        regions[r.region] = r.region_share_of_total
        total += r.share_of_total
        assert abs(
            r.share_of_total - r.share_of_region * r.region_share_of_total
        ) < 1e-3
    for v in by_region.values():
        assert abs(v - 1.0) < 1e-4
    assert abs(sum(regions.values()) - 1.0) < 1e-4
    assert abs(total - 1.0) < 1e-4


def test_q260_percentiles_monotone(spark):
    """Decile values non-decreasing in p; ranks within [1, n]."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = sorted(
        QUERIES["q260_user_gap_percentiles"](spark, SF_DIR).collect(),
        key=lambda r: r.p,
    )
    assert len(rows) == 9
    for a, b in zip(rows, rows[1:]):
        assert b.value >= a.value
        assert b.rank >= a.rank >= 1


def test_self_repetition_coverage_constructed(spark):
    """A doc that repeats a 3-gram covers exactly the repeated window's
    positions; a no-repeat doc covers none."""
    from airbnb_pyspark_jobs_spark.operators.dedupe import (
        self_repetition_coverage,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c x a b c"),   # 'a b c' repeats at p=4: covers 4,5,6
            (2, "all tokens here differ fully"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in self_repetition_coverage(df, n=3).collect()}
    assert out[1].n_tokens == 7 and out[1].n_repeated == 3
    assert out[2].n_tokens == 5 and out[2].n_repeated == 0


def test_q262_assortativity_in_range(spark):
    """Pearson of degrees is in [-1, 1]; edge count halves the directed
    list; constructed star graph must be strongly disassortative."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    r = QUERIES["q262_dup_graph_assortativity"](spark, SF_DIR).collect()[0]
    assert r.n_nodes >= 2 and r.n_edges >= 1
    if r.assortativity is not None:
        assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9


def test_q263_cramers_v_bounds(spark):
    """V in [0, 1]; dims match the corpus; chi2 >= 0."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    r = QUERIES["q263_cramers_v"](spark, SF_DIR).collect()[0]
    docs = load_table(spark, "documents", SF_DIR)
    assert r.n_docs == docs.count()
    assert r.n_langs == docs.select("lang").distinct().count()
    assert r.n_sources == docs.select("source").distinct().count()
    assert r.chi2 >= 0
    assert 0.0 <= r.cramers_v <= 1.0 + 1e-9


def test_q264_sorted_neighborhood_finds_cross_block_pairs(spark):
    """Every pair verifies at lev <= 3, names ordered by rank (a < b in
    sort order), and the flag distinguishes token-block coverage."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q264_sorted_neighborhood_pairs"](spark, SF_DIR).collect()
    for r in rows:
        assert r.lev <= 3
        assert r.name_a < r.name_b  # rank order = lexicographic order


def test_q265_peeling_monotone_to_fixpoint(spark):
    """Node/edge counts never increase across peel rounds; the 2-core
    keeps min degree >= 2 (edges >= nodes when nonempty)."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = sorted(
        QUERIES["q265_kcore_peeling"](spark, SF_DIR).collect(),
        key=lambda r: r.round,
    )
    assert rows[0].round == 0 and len(rows) == 6
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes and b.n_edges <= a.n_edges
    last = rows[-1]
    if last.n_nodes:
        # sum of degrees = 2*edges >= 2*nodes  =>  edges >= nodes
        assert last.n_edges >= last.n_nodes


def test_q266_fightin_words_are_distinctive(spark):
    """Exactly top-3 rows per source with rank 1..3, z descending, and
    each top term genuinely over-represented: its in-source rate
    exceeds its rest-of-corpus rate."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from airbnb_pyspark_jobs_spark.functions import text as TX
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    rows = QUERIES["q266_fightin_words"](spark, SF_DIR).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    docs = load_table(spark, "documents", SF_DIR)
    toks = docs.select(
        "source",
        F.explode(F.transform(TX.tokens("text"), lambda t: F.lower(t))).alias("t"),
    )
    counts = {}
    for rr in toks.groupBy("source", "t").count().collect():
        counts[(rr.source, rr.t)] = rr["count"]
    n_by_src = {}
    for (s, _t), c in counts.items():
        n_by_src[s] = n_by_src.get(s, 0) + c
    n_total = sum(n_by_src.values())
    for s, rs in by_src.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3]
        assert all(a.z >= b.z for a, b in zip(rs, rs[1:]))
        top = rs[0]
        cf = sum(c for (s2, t2), c in counts.items() if t2 == top.term)
        in_rate = top.n_in_source / n_by_src[s]
        rest_rate = (cf - top.n_in_source) / (n_total - n_by_src[s])
        assert in_rate > rest_rate, (s, top.term)


def test_q267_absorption_probability_bounds(spark):
    """0 <= p <= 1; the 20-step iterate dominates the one-step
    conversion probability (x >= b, monotone fixed-point)."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    probs = {
        r.event_type: r.p_purchase_before_error
        for r in QUERIES["q267_absorption_prob"](spark, SF_DIR).collect()
    }
    assert probs and "purchase" not in probs and "error" not in probs
    trans = QUERIES["q131_event_transitions"](spark, SF_DIR).collect()
    b = {
        t.from_type: t.p
        for t in trans
        if t.to_type == "purchase" and t.from_type in probs
    }
    for ty, p in probs.items():
        assert 0.0 <= p <= 1.0
        assert p >= b.get(ty, 0.0) - 1e-9


def test_q268_combine_factor_sane(spark):
    """combine_factor >= 1 always; the enum columns compress orders of
    magnitude harder than the key columns."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = {r.key_col: r for r in QUERIES["q268_combine_doctor"](spark, SF_DIR).collect()}
    assert set(rows) == {
        "l_returnflag", "l_linestatus", "l_partkey", "l_suppkey", "l_orderkey"
    }
    for r in rows.values():
        assert r.combine_factor >= 1.0
        assert r.n_keys <= r.n_rows
    assert rows["l_returnflag"].combine_factor > rows["l_orderkey"].combine_factor
    assert rows["l_returnflag"].verdict == "combine-wins"


def test_q269_pareto_curve_monotone_and_concentrated(spark):
    """Revenue share grows with top_pct, always >= customer share
    (descending-rank cumulative dominates uniform), both in (0, 1]."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = sorted(
        QUERIES["q269_pareto_revenue"](spark, SF_DIR).collect(),
        key=lambda r: r.top_pct,
    )
    assert [r.top_pct for r in rows] == [1, 5, 10, 20, 50]
    for a, b in zip(rows, rows[1:]):
        assert b.revenue_share >= a.revenue_share
        assert b.n_customers >= a.n_customers
    for r in rows:
        assert 0.0 < r.revenue_share <= 1.0
        assert r.revenue_share >= r.customer_share - 1e-9


def test_q270_anova_f_positive_and_matches_numpy(spark):
    """F > 0 and equals a float replay of the classic SSB/SSW formula
    within rounding tolerance."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    out = QUERIES["q270_anova_f"](spark, SF_DIR).collect()[0]
    assert out.f_stat > 0
    rows = (
        load_table(spark, "events", SF_DIR)
        .filter(F.col("value").isNotNull())
        .select("event_type", F.round(F.col("value") * 100).alias("c"))
        .collect()
    )
    groups = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append(r.c)
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(out.f_stat - f) < max(1e-4 * abs(f), 1e-4)


def test_q271_hhi_equal_split_identity(spark, tmp_path):
    """A constructed brand with m equal-revenue suppliers must score
    HHI = 1/m exactly."""
    import os

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES

    li_rows = [
        (1, 1, s, 1, 1.0, 250.00, 0.0, 0.0, "N", "O", "2024-01-01")
        for s in range(4)
    ]
    li = spark.createDataFrame(
        li_rows,
        [
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    )
    part = spark.createDataFrame(
        [(1, "widget one", "BrandX", "T", 1, 250.0)],
        ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    )
    d = str(tmp_path / "hhi")
    li.write.parquet(os.path.join(d, "lineitem.parquet"))
    part.write.parquet(os.path.join(d, "part.parquet"))
    out = QUERIES["q271_supplier_hhi"](spark, d).collect()
    assert len(out) == 1
    assert out[0].n_suppliers == 4
    assert out[0].hhi == 0.25


def test_q272_triplets_are_valid(spark):
    """Violations never exceed triplet counts; the label-structured
    synthetic embeddings should violate on a minority of triplets."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q272_triplet_violations"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_violations <= r.n_triplets

    # constructed perfectly-separated clusters => zero violations
    import os
    import tempfile

    def vec(axis):
        v = [0.0] * 64
        v[axis] = 1.0
        return [v[i] + (0.01 if i == 63 else 0.0) for i in range(64)]

    rows2 = [(i, vec(0), 0) for i in range(8)] + [
        (100 + i, vec(1), 1) for i in range(8)
    ]
    df = spark.createDataFrame(rows2, ["vec_id", "embedding", "label"])
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = QUERIES["q272_triplet_violations"](spark, d).collect()
        assert sum(r.n_violations for r in out) == 0
        assert sum(r.n_triplets for r in out) > 0


def test_q273_gap_bounds(spark):
    """0 <= gap < 1; implied pairs dominate direct pairs; max cluster
    is consistent with the implied-pair count."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    r = QUERIES["q273_transitivity_gap"](spark, SF_DIR).collect()[0]
    assert r.n_implied_pairs >= r.n_direct_pairs >= 1
    assert 0.0 <= r.transitivity_gap < 1.0
    assert r.max_cluster * (r.max_cluster - 1) // 2 <= r.n_implied_pairs


def test_q274_emd_identity_and_positivity(spark, tmp_path):
    """EMD > 0 on real data; identical distributions give exactly 0;
    a constructed unit shift gives exactly the shift."""
    import datetime as dt
    import os

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    r = QUERIES["q274_earth_mover_distance"](spark, SF_DIR).collect()[0]
    assert r.emd_dollars > 0

    rows = []
    eid = 0
    for v, t in [(1.0, "purchase"), (2.0, "purchase"), (4.0, "view"), (5.0, "view")]:
        rows.append((eid, dt.datetime(2024, 1, 1), 1, t, v, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = str(tmp_path / "emd")
    df.write.parquet(os.path.join(d, "events.parquet"))
    out = QUERIES["q274_earth_mover_distance"](spark, d).collect()[0]
    # both distributions are two atoms 3 dollars apart => EMD = 3.0
    assert out.emd_dollars == 3.0


def test_q275_deciles_monotone_both_sides(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = sorted(
        QUERIES["q275_decile_shift"](spark, SF_DIR).collect(),
        key=lambda r: r.p,
    )
    assert len(rows) == 9
    for a, b in zip(rows, rows[1:]):
        assert b.purchase_value >= a.purchase_value
        assert b.view_value >= a.view_value
    for r in rows:
        assert abs(r.shift_dollars - (r.purchase_value - r.view_value)) < 1e-9


def test_q276_decomposition_reconstructs(spark):
    """n = trend + dow_effect + residual (up to rounding) and the dow
    effects roughly cancel across a whole week."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q276_seasonal_decompose"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r.n_events - (r.trend + r.dow_effect + r.residual)) < 1e-5


def test_q277_containment_is_directional(spark):
    """Containment >= 0.8 by construction; the contained side never has
    more shingles than the container; a symmetric equal-size pair is
    emitted once."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q277_containment_pairs"](spark, SF_DIR).collect()
    seen = set()
    for r in rows:
        assert r.containment >= 0.8 - 1e-9
        assert r.n_common <= r.n_shingles_contained
        key = frozenset((r.contained_id, r.container_id))
        if r.n_common == r.n_shingles_contained:
            pass
        assert (r.contained_id, r.container_id) not in seen
        seen.add((r.contained_id, r.container_id))


def test_q278_weighted_jaccard_bounds_and_symmetry_free(spark):
    """WJ in (0, 1]; min-sum <= max-sum; each unordered pair appears
    once (source_a < source_b)."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q278_source_weighted_jaccard"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 < r.sum_min <= r.sum_max
        assert 0.0 < r.weighted_jaccard <= 1.0


def test_q279_intrinsic_dimension_plausible(spark):
    """ID > 0 and at most the ambient dimension by a wide margin on the
    synthetic corpus; anchors with duplicate neighbors excluded
    honestly (n_used <= n_anchors)."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    r = QUERIES["q279_intrinsic_dimension"](spark, SF_DIR).collect()[0]
    assert 0 < r.n_used <= r.n_anchors
    assert 0.0 < r.intrinsic_dimension < 200.0


def test_q280_kappa_bounds_and_agreement(spark):
    """kappa in [-1, 1] and below raw agreement (chance correction
    can only shrink it when p_e > 0)."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    r = QUERIES["q280_filter_kappa"](spark, SF_DIR).collect()[0]
    assert -1.0 <= r.kappa <= 1.0
    assert r.kappa <= r.n_agree / r.n + 1e-9


def test_q281_ece_consistent_with_reliability_diagram(spark):
    """ECE equals the doc-weighted mean |gap| recomputed from q171."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rel = QUERIES["q171_classifier_calibration"](spark, SF_DIR).collect()
    n = sum(r.n_docs for r in rel)
    ece = sum(r.n_docs * abs(round(r.mean_p - r.pos_rate, 6)) for r in rel) / n
    out = QUERIES["q281_calibration_ece"](spark, SF_DIR).collect()[0]
    assert out.n_docs == n
    assert abs(out.ece - ece) < 2e-6
    assert 0.0 <= out.ece <= 1.0


def test_q282_percentiles_ordered(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q282_cycle_time_percentiles"](spark, SF_DIR).collect()
    by_pri = {}
    for r in rows:
        by_pri.setdefault(r.o_orderpriority, []).append(r)
    assert len(by_pri) == 5
    for cells in by_pri.values():
        cells.sort(key=lambda r: r.p)
        assert [c.p for c in cells] == [0.5, 0.9, 0.99]
        assert cells[0].value <= cells[1].value <= cells[2].value
        assert all(c.value >= 0 for c in cells)


def test_q283_deciles_partition_users(spark):
    """Every user appears exactly once across deciles; Wilson lower
    bound never exceeds the raw rate; decile 0 = users inactive in the
    first half."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    rows = QUERIES["q283_segment_propensity"](spark, SF_DIR).collect()
    n_users = (
        load_table(spark, "events", SF_DIR)
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_users for r in rows) == n_users
    for r in rows:
        assert 0 <= r.n_converted <= r.n_users
        assert r.wilson_low <= r.conv_rate + 1e-9


def test_q284_novelty_bounds(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q284_catalog_novelty"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_new_item_interactions <= r.n_interactions
        assert 0.0 <= r.novelty_rate <= 1.0


def test_q285_pairwork_share_and_quantiles(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    r = QUERIES["q285_shingle_skew_profile"](spark, SF_DIR).collect()[0]
    assert 1 <= r.df_p50 <= r.df_p99 <= r.df_max
    assert 0.0 <= r.pairwork_share_above_cap <= 1.0
    assert r.pairwork_total >= 0 and r.n_shingles > 0


def test_q286_ci_brackets_median(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q286_median_ci"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.ci_low <= r.median <= r.ci_high
        assert r.n >= 1


def test_q287_rates_monotone_in_window(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = sorted(
        QUERIES["q287_conversion_window_sensitivity"](spark, SF_DIR).collect(),
        key=lambda r: r.window_seconds,
    )
    assert [r.window_seconds for r in rows] == [600, 3600, 86400]
    for a, b in zip(rows, rows[1:]):
        assert b.n_converted >= a.n_converted
        assert b.n_views == a.n_views
    for r in rows:
        assert 0 <= r.n_converted <= r.n_views


def test_q288_cdc_more_stable_than_fixed(spark):
    """The whole point: CDC chunk survival under a one-word edit must
    dominate fixed-window survival by a wide margin."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = {
        r.method: r
        for r in QUERIES["q288_chunking_stability"](spark, SF_DIR).collect()
    }
    assert set(rows) == {"cdc", "fixed"}
    for r in rows.values():
        assert 0 <= r.n_chunks_preserved <= r.n_chunks_orig
    assert rows["cdc"].preserved_share > rows["fixed"].preserved_share + 0.3, (
        rows["cdc"].preserved_share,
        rows["fixed"].preserved_share,
    )


def test_q289_cuped_variance_reduction_valid(spark):
    """rho2 in [0, 1]; arm sizes partition the user base; CUPED shifts
    the delta without changing its scale wildly (sanity band)."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    r = QUERIES["q289_cuped_ab"](spark, SF_DIR).collect()[0]
    n_users = (
        load_table(spark, "events", SF_DIR)
        .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n_a + r.n_b == n_users
    assert 0.0 <= r.variance_reduction_rho2 <= 1.0
    # an md5-parity split of the same population: both deltas are noise
    # around zero at this scale; just pin they are finite and computed
    assert abs(r.raw_delta_cents) < 1e7 and abs(r.cuped_delta_cents) < 1e7


def test_q290_stats_cover_schema_and_bound_ndv(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q290_catalog_stats"](spark, SF_DIR).collect()
    assert len(rows) == 24
    for r in rows:
        assert 0 <= r.n_nulls <= r.n_rows
        assert 1 <= r.ndv <= r.n_rows - r.n_nulls
        # min/max are stringified AFTER the typed aggregate, so only
        # compare numerically where the column is numeric
        try:
            assert float(r.min_value) <= float(r.max_value)
        except ValueError:
            assert r.min_value <= r.max_value
    pk = {r.column_name: r for r in rows}
    # primary keys are unique: ndv == n_rows
    for key in ("c_custkey", "o_orderkey", "p_partkey", "s_suppkey"):
        assert pk[key].ndv == pk[key].n_rows


def test_q291_funnel_monotone(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    r = QUERIES["q291_session_funnel"](spark, SF_DIR).collect()[0]
    assert r.n_sessions >= r.n_view >= r.n_view_click >= r.n_full_funnel >= 0


def test_q292_confusion_marginals(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    rows = QUERIES["q292_langid_confusion"](spark, SF_DIR).collect()
    n_docs = load_table(spark, "documents", SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0.0 <= r.label_recall <= 1.0
    # recall consistency: diagonal / label total
    from collections import defaultdict

    tot = defaultdict(int)
    diag = defaultdict(int)
    rec = {}
    for r in rows:
        tot[r.label_lang] += r.n_docs
        if r.pred_lang == r.label_lang:
            diag[r.label_lang] += r.n_docs
        rec[r.label_lang] = r.label_recall
    for lang in tot:
        assert abs(rec[lang] - diag[lang] / tot[lang]) < 2e-6


def test_q293_error_grows_as_precision_drops(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = {r.level: r for r in QUERIES["q293_quantization_sweep"](spark, SF_DIR).collect()}
    assert set(rows) == {"int8", "int4", "sign"}
    assert rows["int8"].mean_recon_err < rows["int4"].mean_recon_err
    assert rows["int4"].mean_recon_err < rows["sign"].mean_recon_err
    for r in rows.values():
        assert 0 <= r.mean_recon_err <= r.max_recon_err


def test_q294_repeat_share_starts_at_zero(spark):
    """The first week has no possible repeat purchasers."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = sorted(
        QUERIES["q294_repeat_revenue_share"](spark, SF_DIR).collect(),
        key=lambda r: r.week,
    )
    assert rows[0].repeat_revenue_cents == 0
    for r in rows:
        assert 0 <= r.repeat_revenue_cents <= r.revenue_cents
        assert 0.0 <= r.repeat_share <= 1.0


def test_q295_log2_buckets_exact_and_cumulative(spark):
    """Bucket of 2^k - 1 gap is exactly k (the power-of-two boundary a
    float log2 would misfloor); cumulative shares end at 1."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["q295_latency_histogram"](spark, SF_DIR).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for cells in by_type.values():
        cells.sort(key=lambda r: r.bucket)
        assert abs(cells[-1].cum_share - 1.0) < 1e-9
        shares = [c.cum_share for c in cells]
        assert shares == sorted(shares)

    # unit check of the integer log2: bin-length of 8 is 4 -> bucket 3
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        (F.length(F.conv(F.lit(8).cast("string"), 10, 2)) - 1).alias("b")
    )
    assert df.collect()[0].b == 3


def test_q296_rates_bounded_and_consistent(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    rows = QUERIES["q296_cross_source_dup_rate"](spark, SF_DIR).collect()
    n_docs = load_table(spark, "documents", SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.n_cross_dup <= r.n_docs
        assert 0.0 <= r.cross_dup_rate <= 1.0


def test_q297_spectral_sanity(spark):
    """lambda1 >= lambda2 > 0 (deflation gives the SECOND component),
    ratio in (0,1], top-2 energy share in (0,1]."""
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    r = QUERIES["q297_spectral_estimates"](spark, SF_DIR).collect()[0]
    assert r.lambda1 >= r.lambda2 > 0
    assert 0.0 < r.spectral_ratio <= 1.0
    assert 0.0 < r.top2_energy_share <= 1.0


def test_q298_accuracy_bounds_and_separable_identity(spark, tmp_path):
    """Accuracy in [0,1]; constructed separable clusters score 1.0."""
    import os

    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from tests.conftest import SF_DIR

    for r in QUERIES["q298_knn_loo_accuracy"](spark, SF_DIR).collect():
        assert 0 <= r.n_correct <= r.n_anchors
        assert 0.0 <= r.accuracy <= 1.0

    def vec(axis, eps):
        v = [0.0] * 64
        v[axis] = 1.0
        v[5] = eps  # perturb so neighbors are distinct vectors
        return v

    rows = [(i, vec(0, 0.01 * (i + 1)), 0) for i in range(8)] + [
        (100 + i, vec(1, 0.01 * (i + 1)), 1) for i in range(8)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    d = str(tmp_path / "emb298")
    df.write.parquet(os.path.join(d, "embeddings.parquet"))
    out = QUERIES["q298_knn_loo_accuracy"](spark, d).collect()
    assert all(r.accuracy == 1.0 for r in out)


def test_q299_fanout_totals(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    rows = QUERIES["q299_order_fanout_dist"](spark, SF_DIR).collect()
    n_orders = load_table(spark, "orders", SF_DIR).count()
    n_items = load_table(spark, "lineitem", SF_DIR).count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert sum(r.n_items * r.n_orders for r in rows) == n_items


def test_q300_readiness_consistent(spark):
    from airbnb_pyspark_jobs_spark.plans.queries import QUERIES
    from airbnb_pyspark_jobs_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    r = QUERIES["q300_corpus_readiness"](spark, SF_DIR).collect()[0]
    docs = load_table(spark, "documents", SF_DIR)
    assert r.n_docs == docs.count()
    assert 1 <= r.n_unique <= r.n_docs
    for v in (r.exact_dup_rate, r.en_share, r.blank_rate):
        assert 0.0 <= v <= 1.0
    assert r.mean_tokens_per_doc * r.n_docs >= r.n_tokens * 0.99


def test_power_iteration_top2_rank1_data_raises_clear_error(spark):
    """Rank-1 embeddings (all rows along one direction) have no second
    component: the deflated iterate is the zero vector and the operator
    must raise a diagnostic ValueError, not a F.lit(None) TypeError."""
    import pytest

    from airbnb_pyspark_jobs_spark.operators.similarity import power_iteration_top2

    # vectors exactly along e1: v1 = [1,0,0] exactly, deflation zeroes
    # the iterate with NO rounding residue -> n2 = 0 path
    emb = spark.createDataFrame(
        [(i, [2.0, 0.0, 0.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="no second component"):
        power_iteration_top2(emb, dims=3, iters=2)
