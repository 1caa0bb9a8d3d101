"""Multimodal-column queries (SURVEY §2.9 U3/U9 + Phase 6).

The pattern for image/audio/video at 100 TB: payloads are opaque
``BINARY`` columns with typed metadata columns beside them; decode /
feature-extract / resize run as Arrow-batched ``mapInPandas`` UDFs
behind an injectable decoder seam (``udf/image_ops.py``). The fixture
tables carry no real media, so these queries synthesize deterministic
binary payloads from ``documents.text`` — the Spark-side plumbing
(binary columns, UDF schemas, batching, partitioning) is exactly what
production would run; only the codec is faked.

Rows-only checked: mapInPandas stages are not SQL-expressible. Shape
and determinism properties are asserted in ``tests/test_image_ops.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..udf.image_ops import center_crop, extract_corners
from .registry import register


def _binary_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (path, pose_id, content BINARY): the binaryFile-scan
    shape (S1) with a derived group key (F1), synthesized so tests run
    without a real image directory."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.format_string("img/%d_%d.JPG", "doc_id",
                        F.pmod("doc_id", F.lit(5))).alias("path"),
        F.floor(F.col("doc_id") / 5).cast("int").alias("pose_id"),
        F.encode("text", "UTF-8").alias("content"))


@register(
    "mm1_mm2_mm3_media_pipeline", None,
    doc="Multimodal pipeline over image/audio/video binary columns, "
        "one declared result joined per file: mapInPandas decode + "
        "corner extraction (U3) → relational post-filter on "
        "n_vertices (P6), the binary-in/binary-out crop UDF (U9, the "
        "800→640 center crop) with its byte accounting, video frame "
        "sampling (1→N fan-out with frame index/count) and "
        "fixed-window audio features (RMS + zero crossings) — the "
        "decode, feature-extract, resize, frame-sample and "
        "audio-feature stages of a media dataset build. Decoders are "
        "the injectable deterministic fakes; batch shapes, schemas, "
        "partitioning and the fan-out are the production path "
        "(rows-only: UDF stages)")
def media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..udf.media_ops import audio_window_features, sample_frames

    files = _binary_corpus(spark, sf_dir)
    corners = extract_corners(files)
    quad = (corners.filter(F.col("n_vertices") == 4)
            .select("path", "n_vertices",
                    F.round(F.aggregate(
                        F.transform("corners", lambda c: c["u"]),
                        F.lit(0.0), lambda a, x: a + x) / 4.0, 6)
                    .alias("mean_u")))
    cropped = center_crop(files, out_frac=0.75).select(
        "path", "width", "height",
        F.length("content").cast("bigint").alias("n_bytes"))
    frames = sample_frames(files).select(
        "path", "frame_idx", "n_frames",
        F.length("content").cast("bigint").alias("frame_bytes"))
    audio = (audio_window_features(files)
             .groupBy("path")
             .agg(F.count("*").cast("bigint").alias("n_windows"),
                  F.round(F.sum(F.round("rms", 9)), 6).alias("rms_sum"),
                  F.sum("zero_crossings").cast("bigint")
                   .alias("total_zero_crossings")))
    per_file = (quad.join(cropped, "path")
                .select("path", "n_vertices", "mean_u",
                        "width", "height", "n_bytes"))
    return (frames.join(audio, "path").join(per_file, "path")
            .orderBy("path", "frame_idx"))
