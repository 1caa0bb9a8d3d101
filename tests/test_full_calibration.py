"""Stage-4 end-to-end integration (SURVEY §3.1): the full
U1→U2→J2→U6→U8→A4→T2→S6 calibration DAG over a synthetic scene with
known ground truth, mirroring data_pipeline.main() +
ExtrinsicCalibrator.calibrate (extrinsic_calibration.py:236-391)."""

from __future__ import annotations

import numpy as np
import pytest

from light_redistribution_in_3dptf_data_pipeline_spark.plans import calibration as cal
from light_redistribution_in_3dptf_data_pipeline_spark.plans.pipeline import (
    read_stats_artifact,
)
from light_redistribution_in_3dptf_data_pipeline_spark.udf.calibration import FAKE_K
from light_redistribution_in_3dptf_data_pipeline_spark.udf.geometry import (
    rodrigues_to_matrix,
)


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    wd = tmp_path_factory.mktemp("calib_run")
    return str(wd), cal.full_calibration_run(spark, str(wd))


def test_intrinsics_recovered(run):
    _, out = run
    assert np.allclose(out["K"], FAKE_K, rtol=1e-4)


def test_extrinsics_recovered_within_eps(run):
    """The LM refine must land on the ground-truth camera pose: the
    pixel table was projected through (TRUE_RVEC, TRUE_TVEC) with the
    same projection model the optimizer evaluates, so residuals can
    reach ~0 and the pose is identifiable (2976 poses × 4 corners)."""
    _, out = run
    rvec, tvec = out["params"][:3], out["params"][3:]
    # compare rotations as matrices (rvec may differ by 2π wraps)
    R_hat = rodrigues_to_matrix(rvec)
    R_true = rodrigues_to_matrix(cal.TRUE_RVEC)
    assert np.allclose(R_hat, R_true, atol=1e-6)
    assert np.allclose(tvec, cal.TRUE_TVEC, atol=1e-3)


def test_rmse_history_monotone_and_converged(run):
    _, out = run
    hist = out["history"]
    assert len(hist) >= 2
    assert all(b <= a + 1e-12 for a, b in zip(hist, hist[1:])), hist
    assert hist[-1] < 1e-4, hist
    assert out["stats"]["rmse"] < 1e-4
    assert out["stats"]["max_error"] >= out["stats"]["mean_error"]


def test_worst_pose_report_shape(run):
    _, out = run
    rows = out["worst"].collect()
    assert len(rows) == 10
    errs = [r["mean_err"] for r in rows]
    assert errs == sorted(errs, reverse=True)


def test_artifact_roundtrip(run, spark):
    wd, out = run
    matrices, stats = read_stats_artifact(spark, f"{wd}/camera_extrinsic")
    assert matrices["extrinsic_matrix"].shape == (4, 4)
    R = matrices["extrinsic_matrix"][:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-8)
    assert np.allclose(matrices["camera_matrix"], out["K"])
    assert stats["rmse"] == pytest.approx(out["stats"]["rmse"])


def test_stage_memoization(run, spark):
    """Re-running reuses the Parquet-memoized stage outputs (the
    reference's 'stage done = slot filled' semantics)."""
    import os
    wd, _ = run
    marker = os.path.join(wd, "stages", "world_points", "_SUCCESS")
    mtime = os.path.getmtime(marker)
    cal.full_calibration_run(spark, wd, max_iters=1)
    assert os.path.getmtime(marker) == mtime
