"""In-engine quality-classifier training — distributed full-batch
gradient descent with a libm-free squashing link.

The pattern every petabyte-scale "model-based quality filtering" stage
needs (fastText/logistic quality scorers over trillions of tokens):
the TRAINING data never leaves the executors — each iteration is one
scan-side scoring pass + one d-column aggregate (map-side partial
sums), and only the d gradient sums cross to the driver (the k-means
recipe: bounded driver actions per iteration, never row data).

Cross-engine determinism (DuckDB-oracle replayable, unrolled-CTE
style):
- the link is the FAST SIGMOID ``p = 0.5 + 0.5·z/(1+|z|)`` — only
  +,*,/,abs: bit-identical across engines, unlike exp()-based
  logistic whose libm last-ulp differences would diverge over
  iterations;
- every per-row term is rounded (half-away, in-plan) then summed as
  DECIMAL (order-independent), the weight update is one fixed-order
  double expression rounded to ``digits`` — so the whole weight
  trajectory replays exactly in SQL;
- weights re-enter the next iteration as plain double literals
  (rounded values round-trip exactly through ``F.lit``).

Scale: iterations are driver-side Python over BOUNDED aggregates
(d+1 values each); the per-row work is pure Catalyst expressions.
Feature count d is assumed small (≤ dozens) — hashed/bucketed
features, not a vocabulary-sized weight vector (that would need the
broadcast weight-table pattern of DSIR, operators/corpus.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.caching import owned_persist


def _z_expr(feature_cols: list[str], weights: list[float], digits: int):
    """round(x0·w0 + x1·w1 + ..., digits) — fixed left-assoc fold in
    column order (addition order matters in IEEE; both engines spell
    the same chain)."""
    z = None
    for c, w in zip(feature_cols, weights):
        term = F.col(c) * F.lit(float(w))
        z = term if z is None else z + term
    return F.round(z, digits)


def _p_expr(z, digits: int):
    """Fast sigmoid, rounded: 0.5 + (0.5·z)/(1+|z|)."""
    return F.round(
        F.lit(0.5) + F.lit(0.5) * z / (F.lit(1.0) + F.abs(z)), digits
    )


def train_gd_fast_sigmoid(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 5,
    lr: float = 0.5,
    digits: int = 9,
) -> list[float]:
    """Train weights (init 0) by ``iters`` full-batch GD steps:
    ``w_j += lr · Σ round((y−p)·x_j) / n``. Returns the final weights
    (rounded doubles). ``feats`` is persisted for the duration (one
    scoring pass per iteration)."""
    d = len(feature_cols)
    feats = owned_persist(feats.select(label_col, *feature_cols))
    w = [0.0] * d
    dec = "decimal(28,9)"
    for _ in range(iters):
        z = _z_expr(feature_cols, w, digits)
        p = _p_expr(z, digits)
        err = F.col(label_col) - p
        aggs = [
            F.sum(F.round(err * F.col(c), digits).cast(dec)).alias(f"__g{j}")
            for j, c in enumerate(feature_cols)
        ]
        row = (
            feats.agg(*aggs, F.count(F.lit(1)).cast("bigint").alias("__n"))
            .select(
                *[
                    F.round(
                        F.lit(float(w[j]))
                        + F.lit(float(lr))
                        * (
                            F.col(f"__g{j}").cast("double")
                            / F.col("__n").cast("double")
                        ),
                        digits,
                    ).alias(f"__w{j}")
                    for j in range(d)
                ]
            )
            .first()
        )
        w = [row[f"__w{j}"] for j in range(d)]
    return w


def score_fast_sigmoid(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    digits: int = 9,
    out_digits: int = 6,
) -> DataFrame:
    """Scan-side scoring with fixed weights: adds ``p`` (rounded
    ``out_digits``) and ``pred`` (p ≥ 0.5, as bigint 0/1). Pure
    projection — no shuffle, no Python."""
    z = _z_expr(feature_cols, weights, digits)
    p = F.round(_p_expr(z, digits), out_digits)
    return df.withColumn("p", p).withColumn(
        "pred", (F.col("p") >= 0.5).cast("bigint")
    )


def confident_label_suspects(
    scored: DataFrame,
    id_col: str = "doc_id",
    y_col: str = "y",
    p_col: str = "p",
    p_digits: int = 6,
) -> DataFrame:
    """Confident-learning label-noise candidates (Northcutt et al.
    2021, binary case): per class ``j`` the self-confidence threshold
    ``t_j`` is the MEAN predicted probability of class j among examples
    LABELED j; an example is a noise suspect when its predicted
    probability for the OPPOSITE class reaches that class's threshold.
    This is the standard mislabeled-example miner over an in-engine
    classifier's scores (q147) — the curation step before re-labeling
    or dropping suspects from a training corpus.

    Exact-integer arithmetic: ``p`` (rounded to ``p_digits``) converts
    to integer micro-units, each threshold is the round-half-away
    integer quotient ``(2·S + N) div (2·N)`` of BIGINT sums, and every
    comparison happens in micro space — no float means, no cross-engine
    boundary risk. Returns one row per suspect: ``{id_col}, y_label,
    p, suspected_label, margin_micro`` (how far past the threshold in
    micro-units). Scale: one scan-side projection, one tiny 2-class
    aggregate broadcast back — no windows, no collects."""
    scale = 10**p_digits
    pm = F.round(F.col(p_col) * scale).cast("bigint")
    staged = scored.select(
        F.col(id_col),
        F.col(y_col).cast("bigint").alias("y_label"),
        F.col(p_col).alias("p"),
        pm.alias("__pm"),
    )
    # S1/N1 over labeled-1 docs (confidence in class 1), S0/N0 over
    # labeled-0 docs (confidence in class 0 = scale - pm)
    th = staged.agg(
        F.sum(F.when(F.col("y_label") == 1, F.col("__pm"))).alias("__s1"),
        F.count(F.when(F.col("y_label") == 1, 1)).cast("bigint").alias("__n1"),
        F.sum(F.when(F.col("y_label") == 0, F.lit(scale) - F.col("__pm"))).alias(
            "__s0"
        ),
        F.count(F.when(F.col("y_label") == 0, 1)).cast("bigint").alias("__n0"),
    ).select(
        F.when(
            F.col("__n1") > 0,
            F.expr("(2 * __s1 + __n1) div (2 * __n1)"),
        ).alias("__t1"),
        F.when(
            F.col("__n0") > 0,
            F.expr("(2 * __s0 + __n0) div (2 * __n0)"),
        ).alias("__t0"),
    )
    joined = staged.crossJoin(F.broadcast(th))
    conf1 = F.col("__pm")  # confidence the doc is class 1
    conf0 = F.lit(scale) - F.col("__pm")
    return (
        joined.select(
            id_col,
            "y_label",
            "p",
            F.when((F.col("y_label") == 0) & (conf1 >= F.col("__t1")), F.lit(1))
            .when((F.col("y_label") == 1) & (conf0 >= F.col("__t0")), F.lit(0))
            .cast("bigint")
            .alias("suspected_label"),
            F.when(
                (F.col("y_label") == 0) & (conf1 >= F.col("__t1")),
                conf1 - F.col("__t1"),
            )
            .when(
                (F.col("y_label") == 1) & (conf0 >= F.col("__t0")),
                conf0 - F.col("__t0"),
            )
            .cast("bigint")
            .alias("margin_micro"),
        )
        .filter(F.col("suspected_label").isNotNull())
    )
