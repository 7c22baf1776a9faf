"""OPQ rotation: orthogonality, determinism, and the quantization-error
win on correlated data (the reason the operator exists — on the
isotropic test corpus OPQ ≈ PQ, measured in similarity_queries.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from airbnb_pyspark_jobs_spark.operators.similarity import (
    opq_rotation,
    opq_rotation_from_sample,
    pq_encode,
    pq_train_codebooks,
    rotate_vectors,
)
from airbnb_pyspark_jobs_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def _correlated_sample(n: int = 300, dims: int = 16, seed: int = 7):
    """Anisotropic, cross-correlated vectors: a few high-variance latent
    directions mixed into all dims, so raw coordinate subspaces carry
    wildly unequal (and correlated) variance."""
    rng = np.random.default_rng(seed)
    latent = rng.normal(size=(n, 4)) * np.array([8.0, 4.0, 2.0, 1.0])
    mix = rng.normal(size=(4, dims))
    x = latent @ mix + 0.1 * rng.normal(size=(n, dims))
    return [[float(v) for v in row] for row in x]


def test_rotation_is_orthogonal_and_deterministic():
    sample = _correlated_sample()
    r1 = opq_rotation_from_sample(sample, m=4)
    r2 = opq_rotation_from_sample(sample, m=4)
    assert r1 == r2
    m = np.array(r1)
    assert m.shape == (16, 16)
    # rows orthonormal up to the 6-digit rounding of the entries
    assert np.allclose(m @ m.T, np.eye(16), atol=1e-4)


def test_opq_beats_plain_pq_on_correlated_corpus(spark):
    sample = _correlated_sample()
    df = spark.createDataFrame(
        [(i, row) for i, row in enumerate(sample)], "vec_id long, embedding array<double>"
    ).repartition(4)
    kw = dict(m=4, k=8, iters=2, dims=16)
    plain_books = pq_train_codebooks(df, **kw)
    plain_err = (
        pq_encode(df, plain_books).agg(F.avg("sq_err").alias("e")).first().e
    )
    rot = opq_rotation(df, m=4, sample_max_id=300)
    rotated = rotate_vectors(df, rot)
    opq_books = pq_train_codebooks(rotated, vec_col="rv", **kw)
    opq_err = (
        pq_encode(rotated, opq_books, vec_col="rv")
        .agg(F.avg("sq_err").alias("e"))
        .first()
        .e
    )
    # balanced eigenvalue allocation should cut reconstruction error
    # decisively on anisotropic data (observed ~3x on this construction)
    assert opq_err < plain_err * 0.8, (opq_err, plain_err)


def test_rotate_vectors_matches_numpy(spark):
    emb = load_table(spark, "embeddings", SF_DIR).filter(F.col("vec_id") < 20)
    rot = opq_rotation(emb, m=4, sample_max_id=256)
    got = {
        r.vec_id: r.rv for r in rotate_vectors(emb, rot).collect()
    }
    raw = {
        r.vec_id: np.array(r.v, dtype=np.float64)
        for r in emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).collect()
    }
    m = np.array(rot)
    for vid, v in raw.items():
        assert np.allclose(np.array(got[vid]), m @ v, atol=1e-9)
