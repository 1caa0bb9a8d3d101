"""Camera intrinsic calibration (SURVEY §2.9 U1/U2).

The reference detects chessboard corners per image and solves the
intrinsics globally (``src/core/camera_calib.py:46-102``: per-image
``findChessboardCorners`` + one ``calibrateCamera`` over all views).
Spark-first shape:

- **U1 (per-image corner detection)** — embarrassingly parallel →
  ``mapInPandas`` over binary content. The container has no image
  codec, so detection runs behind the same injectable-decoder seam as
  ``image_ops``; the deterministic fake emits a known planar grid so
  the downstream solve is testable end-to-end.
- **U2 (global solve)** — a *small* reduction over per-view
  homographies: N views × 2 constraint rows is tiny however large the
  image corpus is, so the homography fit is distributed (one
  ``applyInPandas`` per view) and only the final 6×6 solve runs on the
  driver — the same big-compute/small-solve split as the U8 optimizer.

The solve itself is Zhang's classical planar-calibration method
(homography per view → constraints on the image of the absolute conic
→ K by Cholesky), implemented from the published formulation — no
OpenCV.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                               StringType, StructField, StructType)


def homography_dlt_np(world_xy: np.ndarray, pixels: np.ndarray
                      ) -> np.ndarray:
    """Least-squares DLT homography from N ≥ 4 planar correspondences
    (normalized; SVD null-space of the 2N×9 system)."""
    def normalize(pts):
        c = pts.mean(axis=0)
        s = np.sqrt(2) / max(np.linalg.norm(pts - c, axis=1).mean(), 1e-12)
        T = np.array([[s, 0, -s * c[0]], [0, s, -s * c[1]], [0, 0, 1]])
        ph = np.hstack([pts, np.ones((len(pts), 1))]) @ T.T
        return ph[:, :2], T

    src, Ts = normalize(world_xy)
    dst, Td = normalize(pixels)
    A = []
    for (x, y), (u, v) in zip(src, dst):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
    _, _, Vt = np.linalg.svd(np.asarray(A))
    H = Vt[-1].reshape(3, 3)
    H = np.linalg.inv(Td) @ H @ Ts
    return H / H[2, 2]


def _v_ij(H: np.ndarray, i: int, j: int) -> np.ndarray:
    """Zhang's constraint vector v_ij from homography columns."""
    return np.array([
        H[0, i] * H[0, j],
        H[0, i] * H[1, j] + H[1, i] * H[0, j],
        H[1, i] * H[1, j],
        H[2, i] * H[0, j] + H[0, i] * H[2, j],
        H[2, i] * H[1, j] + H[1, i] * H[2, j],
        H[2, i] * H[2, j],
    ])


def intrinsics_from_homographies_np(Hs: list[np.ndarray]) -> np.ndarray:
    """Zhang's method: each view homography contributes 2 rows of
    constraints on B = K^-T K^-1; solve the homogeneous system, then
    recover K. Needs ≥ 3 views for a full 5-dof K (≥ 2 with zero
    skew)."""
    V = []
    for H in Hs:
        V.append(_v_ij(H, 0, 1))
        V.append(_v_ij(H, 0, 0) - _v_ij(H, 1, 1))
    _, _, Vt = np.linalg.svd(np.asarray(V))
    b11, b12, b22, b13, b23, b33 = Vt[-1]
    v0 = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 ** 2)
    lam = b33 - (b13 ** 2 + v0 * (b12 * b13 - b11 * b23)) / b11
    alpha = np.sqrt(lam / b11)
    beta = np.sqrt(lam * b11 / (b11 * b22 - b12 ** 2))
    gamma = -b12 * alpha ** 2 * beta / lam
    u0 = gamma * v0 / beta - b13 * alpha ** 2 / lam
    return np.array([[alpha, gamma, u0], [0.0, beta, v0], [0.0, 0.0, 1.0]])


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

# Ground-truth camera of the fake detector (≈ the reference's 0.5×-
# downscaled intrinsics scale, camera_calib.py:115-119).
FAKE_K = np.array([[2400.0, 0.0, 1250.0],
                   [0.0, 2380.0, 840.0],
                   [0.0, 0.0, 1.0]])

CHESS_SCHEMA = StructType([
    StructField("view_id", StringType()),
    StructField("corner_idx", IntegerType()),
    StructField("gx", DoubleType()),   # board-frame x (columns × square)
    StructField("gy", DoubleType()),
    StructField("u", DoubleType()),
    StructField("v", DoubleType()),
])


def detect_chessboard(files: DataFrame, pattern=(9, 11),
                      square_size: float = 45.0,
                      detector=None) -> DataFrame:
    """U1: per-image chessboard corner detection over binary content.

    ``detector(content bytes) -> (N,2) pixel array or None`` is the
    injectable seam (production: cv2.findChessboardCorners +
    cornerSubPix, camera_calib.py:58-77). The default fake projects
    the board grid through ``FAKE_K`` with a content-derived board
    pose — a geometrically consistent planar scene, so Zhang's solve
    downstream recovers FAKE_K (asserted in tests): the whole
    detect→fit→solve chain is exercised for real, only the pixel
    *detection* is faked."""
    cols, rows = pattern
    grid = np.array([[c * square_size, r * square_size]
                     for r in range(rows) for c in range(cols)])

    def default_detector(content: bytes):
        h = np.frombuffer(content[:3].ljust(3, b"\0"), dtype=np.uint8)
        angles = (h.astype(np.float64) - 128.0) / 255.0 * 0.5  # ±0.25 rad
        from .geometry import rodrigues_to_matrix
        R = rodrigues_to_matrix(angles)
        t = np.array([-200.0 + float(h[0]), -200.0 + float(h[1]),
                      1500.0 + 2.0 * float(h[2])])
        H = FAKE_K @ np.column_stack([R[:, 0], R[:, 1], t])
        ph = np.hstack([grid, np.ones((len(grid), 1))]) @ H.T
        return ph[:, :2] / ph[:, 2:3]

    det = detector or default_detector

    def fn(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                pix = det(bytes(content))
                if pix is None or len(pix) != len(grid):
                    continue   # P7: skip failed detections
                for i, ((gx, gy), (u, v)) in enumerate(zip(grid, pix)):
                    out.append({"view_id": path, "corner_idx": i,
                                "gx": gx, "gy": gy,
                                "u": float(u), "v": float(v)})
            yield pd.DataFrame(
                out, columns=[f.name for f in CHESS_SCHEMA.fields])

    return files.select("path", "content").mapInPandas(fn, CHESS_SCHEMA)


H_SCHEMA = StructType([
    StructField("view_id", StringType()),
    StructField("h", ArrayType(DoubleType())),   # row-major 3×3
])


def per_view_homographies(corners: DataFrame) -> DataFrame:
    """Distributed half of U2: one DLT homography fit per view
    (applyInPandas per view_id — each task owns its views)."""
    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("corner_idx")
        world = pdf[["gx", "gy"]].to_numpy(dtype=float)
        pix = pdf[["u", "v"]].to_numpy(dtype=float)
        if len(pdf) < 4:
            return pd.DataFrame(columns=["view_id", "h"])
        H = homography_dlt_np(world, pix)
        return pd.DataFrame({"view_id": [pdf["view_id"].iloc[0]],
                             "h": [H.ravel().tolist()]})

    return corners.groupBy("view_id").applyInPandas(fit, H_SCHEMA)


def calibrate_intrinsics(corners: DataFrame) -> np.ndarray:
    """U2: full intrinsic solve — distributed homography fits, tiny
    driver-side Zhang reduction (N×6 rows; never large)."""
    hs = per_view_homographies(corners).collect()
    Hs = [np.array(r["h"]).reshape(3, 3) for r in hs]
    if len(Hs) < 3:
        raise ValueError(f"need >= 3 views, got {len(Hs)}")
    return intrinsics_from_homographies_np(Hs)
