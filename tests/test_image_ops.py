"""Tests for the image UDF plumbing (decoder-seam stubs, real Spark
dataflow) and the external-process HDR merge pattern."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.sources import binary_catalog
from light_redistribution_in_3dptf_data_pipeline_spark.udf import image_ops


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    t = 1_700_000_000
    for pose in range(3):
        n = 5 if pose != 1 else 3  # pose 1 incomplete
        for exp in range(n):
            p = d / f"{pose}_{exp}.JPG"
            p.write_bytes(bytes([pose * 16 + exp]) * 80)
            os.utime(p, (t, t))
            t += 2
    return str(d)


def test_extract_corners_schema_and_determinism(spark, image_dir):
    files = binary_catalog.scan_files(spark, image_dir, glob="*.JPG",
                                      with_content=True)
    out1 = sorted(map(tuple, image_ops.extract_corners(files).collect()))
    out2 = sorted(map(tuple, image_ops.extract_corners(files).collect()))
    assert out1 == out2
    assert len(out1) == 13
    path, n_vertices, corners = out1[0]
    assert n_vertices == 4
    assert len(corners) == 4
    assert all(c.u is not None and c.v is not None for c in corners)


def test_corner_quads_feed_homography(spark, image_dir):
    """U3 output flows into U4 (the act_img.py:285→199 chain)."""
    from light_redistribution_in_3dptf_data_pipeline_spark.udf import geometry as geo

    files = binary_catalog.scan_files(spark, image_dir, glob="*.JPG",
                                      with_content=True)
    quads = image_ops.extract_corners(files).filter(
        F.col("n_vertices") == 4)
    h = geo.with_homography(quads).collect()
    assert all(len(r.homography) == 9 for r in h)
    assert all(abs(r.homography[8] - 1.0) < 1e-12 for r in h)


def test_center_crop_dimensions(spark, image_dir):
    files = binary_catalog.scan_files(spark, image_dir, glob="*.JPG",
                                      with_content=True)
    out = image_ops.center_crop(files, out_frac=0.75).collect()
    assert all((r.width, r.height) == (6, 6) for r in out)  # 8→6
    assert all(len(r.content) == 36 for r in out)


def test_fake_decode_deterministic():
    a = image_ops.fake_decode(b"hello world")
    b = image_ops.fake_decode(b"hello world")
    assert np.array_equal(a, b)
    assert a.shape == (8, 8)


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        image_ops.real_decode(b"\xff\xd8")


def test_hdr_merge_subprocess(spark, image_dir, tmp_path):
    """The applyInPandas+subprocess pattern with `cat` standing in for
    hdrgen: complete groups produce an output file, incomplete groups
    are skipped like handlehdrgen.py:25-27."""
    cat = binary_catalog.file_catalog(
        binary_catalog.scan_files(spark, image_dir, glob="*.JPG"))
    out = {r.pose_id: r for r in image_ops.hdr_merge_groups(
        cat, str(tmp_path)).collect()}
    assert out[0].ok == 1 and out[2].ok == 1
    assert out[1].ok == 0 and out[1].output == ""  # incomplete
    merged = open(out[0].output, "rb").read()
    assert len(merged) == 5 * 80  # cat of 5 inputs
    assert not os.path.exists(str(tmp_path) + "/1.hdr")
