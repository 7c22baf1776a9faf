"""Grouped-map (applyInPandas) operators: per-group matrix computations.

``applyInPandas`` is the right tool when a whole GROUP must be in memory
as a matrix — e.g. computing a group centroid and every member's
residual in one BLAS pass. The DataFrame-only alternative (explode to
(row, dim), aggregate per dim, join back, re-aggregate) shuffles the
exploded data twice; grouped-map shuffles the rows once and does the
math vectorized in NumPy over Arrow batches.

Scale: one shuffle on the group key; each GROUP must fit in executor
memory (here: cluster members × dims × 8 bytes — fine for any sane
cluster size; re-chunk by sub-groups if not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RESIDUAL_SCHEMA = "label int, vec_id long, residual double, group_size long"


def label_centroid_residuals(
    emb: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Per-label centroid + per-vector L2 residual (distance to its
    group's centroid). Output rounded for cross-engine reproducibility."""

    def per_group(pdf):
        import numpy as np
        import pandas as pd

        mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        centroid = mat.mean(axis=0)
        resid = np.linalg.norm(mat - centroid, axis=1)
        return pd.DataFrame(
            {
                "label": pdf[label_col].to_numpy(),
                "vec_id": pdf[id_col].to_numpy(),
                "residual": np.round(resid, round_digits),
                "group_size": len(pdf),
            }
        )

    return (
        emb.select(label_col, id_col, vec_col)
        .groupBy(label_col)
        .applyInPandas(per_group, schema=RESIDUAL_SCHEMA)
    )


def label_centroid_residuals_arrow(
    emb: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """applyInArrow twin of :func:`label_centroid_residuals` — the
    group arrives as a ``pyarrow.Table`` and NumPy views the list
    column's flattened buffer directly (``flatten().to_numpy()`` is
    zero-copy for the float values), skipping the Arrow→pandas
    conversion that materializes one Python list PER ROW for nested
    columns. Same math, same rounded output; see SCALE_NOTES for the
    measured difference on wide-vector groups."""

    def per_group(tbl):
        import numpy as np
        import pyarrow as pa

        vecs = tbl.column(vec_col).combine_chunks()
        n = len(vecs)
        mat = vecs.flatten().to_numpy(zero_copy_only=False).reshape(n, -1).astype("float64")
        centroid = mat.mean(axis=0)
        resid = np.linalg.norm(mat - centroid, axis=1)
        return pa.table(
            {
                "label": tbl.column(label_col).cast(pa.int32()),
                "vec_id": tbl.column(id_col),
                "residual": pa.array(np.round(resid, round_digits), pa.float64()),
                "group_size": pa.array([n] * n, pa.int64()),
            }
        )

    return (
        emb.select(label_col, id_col, vec_col)
        .groupBy(label_col)
        .applyInArrow(per_group, schema=RESIDUAL_SCHEMA)
    )
