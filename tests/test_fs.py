"""Hadoop FileSystem control-plane helpers: round-trips and edge
cases on the local FS (the same code path resolves s3a/hdfs/abfss
URIs through the session's Hadoop configuration)."""

from __future__ import annotations

import os

from light_redistribution_in_3dptf_data_pipeline_spark import fs


def test_text_roundtrip_and_overwrite(spark, tmp_path):
    p = str(tmp_path / "nested" / "m.json")
    assert not fs.path_exists(spark, p)
    fs.write_text(spark, p, '{"a": 1}')
    assert fs.path_exists(spark, p)
    assert fs.read_text(spark, p) == '{"a": 1}'
    fs.write_text(spark, p, "v2 — unicode ✓")
    assert fs.read_text(spark, p) == "v2 — unicode ✓"


def test_list_dir_sorted_and_missing(spark, tmp_path):
    d = str(tmp_path / "d")
    for name in ("b.json", "a.json", "c.txt"):
        fs.write_text(spark, f"{d}/{name}", "x")
    assert fs.list_dir(spark, d) == ["a.json", "b.json", "c.txt"]
    assert fs.list_dir(spark, str(tmp_path / "missing")) == []


def test_delete_recursive_and_idempotent(spark, tmp_path):
    d = str(tmp_path / "tree")
    fs.write_text(spark, f"{d}/sub/x.txt", "x")
    assert fs.delete_path(spark, d) is True
    assert not os.path.exists(d)
    assert fs.delete_path(spark, d) is False  # already gone: no error


def test_mkdirs(spark, tmp_path):
    d = str(tmp_path / "a" / "b" / "c")
    fs.mkdirs(spark, d)
    assert fs.path_exists(spark, d) and os.path.isdir(d)
