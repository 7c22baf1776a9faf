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
