"""Batched model inference over pose vectors (SURVEY §2.9 U13).

The reference's aspirational stage trains a pose-vector→image network
(``src/core/train.py:5-70``: a torch MLP from a 6-dof pose to a
1×640×640 image). Engine scope is *inference as a dataflow operator*:
an Arrow-batched pandas UDF that applies a model function to whole
record batches — the ``predict_batch_udf`` shape. Training remains a
single-node concern outside the engine (SURVEY §2.9 U13 note).

The model is an injectable ``(np.ndarray (B,6)) -> np.ndarray (B,H,W)``
callable: production passes a loaded torch module's forward; tests and
this container (no torch) use the deterministic linear fake. Batching,
schema, and partitioning — the parts Spark owns — are identical either
way.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

ModelFn = Callable[[np.ndarray], np.ndarray]

OUT_SHAPE = (8, 8)   # fake stand-in for the reference's 640×640


def fake_model(poses: np.ndarray) -> np.ndarray:
    """Deterministic linear 'network': image[i,j] = w·pose + i - j.
    Same pose → same image, vectorized over the whole batch."""
    w = np.arange(1, 7, dtype=np.float64) / 10.0
    base = poses @ w                              # (B,)
    i = np.arange(OUT_SHAPE[0])[:, None]
    j = np.arange(OUT_SHAPE[1])[None, :]
    return base[:, None, None] + (i - j)[None, :, :]


def real_model(poses: np.ndarray) -> np.ndarray:  # pragma: no cover
    """Production path — requires torch + trained weights, neither of
    which ships in this container."""
    raise NotImplementedError(
        "no torch in this environment; inject a loaded model's forward")


def with_pose_inference(poses: DataFrame, model: ModelFn = fake_model,
                        cols=("x", "y", "z", "a", "b", "c")) -> DataFrame:
    """Add a flattened predicted image column (row-major ARRAY<DOUBLE>)
    per 6-dof pose row. One model call per Arrow batch — the
    vectorized inference pattern; at scale, partition count controls
    model-replica parallelism and batch size amortizes per-call
    overhead."""
    @F.pandas_udf(ArrayType(DoubleType()))
    def infer(*series: pd.Series) -> pd.Series:
        batch = np.stack([s.to_numpy(dtype=float) for s in series], axis=1)
        imgs = model(batch)
        return pd.Series([img.ravel().tolist() for img in imgs])

    return poses.withColumn("pred_image", infer(*[F.col(c) for c in cols]))
