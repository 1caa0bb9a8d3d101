"""Multimodal-column queries (SURVEY §2.9 U3/U9 + Phase 6).

The pattern for image/audio/video at 100 TB: payloads are opaque
``BINARY`` columns with typed metadata columns beside them; decode /
feature-extract / resize run as Arrow-batched ``mapInPandas`` UDFs
behind an injectable decoder seam (``udf/image_ops.py``). The fixture
tables carry no real media, so these queries synthesize deterministic
binary payloads from ``documents.text`` — the Spark-side plumbing
(binary columns, UDF schemas, batching, partitioning) is exactly what
production would run; only the codec is faked.

Oracle-checked since r5: the fake decoders are *deterministic
functions of the payload bytes*, and the fixture text is pure ASCII
(byte i == code point of char i+1, driver-verified octet_length ==
length at every SF), so every declared scalar column is exactly
restatable in DuckDB over the same ``documents`` rows. The engine's
fixed-point discipline applies: the per-window RMS is emitted as the
exact integer ``floor(rms*1e9)`` (``udf/media_ops.py``) so no
engine-specific ``round()`` semantics enter the comparison.
UDF-internal arrays (corner structs, crop payload bytes, frame
payloads) stay out of the declared result — shape and determinism
properties for those are asserted in ``tests/test_image_ops.py`` /
``tests/test_media_ops.py``.
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


# The oracle restates each fake-decoder stage over the SAME bytes:
#   image  (act_img.py:254-324 / pixel_processing.py): first 64 bytes
#     → 8×8 grid; corner 'detection' always yields the 4 bounding-box
#     corners at inset `off` and `7-off`, so n_vertices = 4 and
#     mean_u = (off + (7-off) + (7-off) + off)/4 = 3.5 exactly (every
#     intermediate is a multiple of 1/64 — exact in doubles).
#   crop   (cut600.py:12-38, the 800→640 center crop at frac 0.75):
#     8×8 → 6×6 ⇒ width = height = 6, n_bytes = 36.
#   video  (handlehdrgen-style bracket fan-out): first 192 bytes →
#     12 frames of 4×4; sampled every 4th ⇒ frame_idx ∈ {0,4,8},
#     n_frames = 12, frame_bytes = 16.
#   audio: first 256 bytes zero-padded, samples (b-128)/128, window 64
#     ⇒ n_windows = 4; per window the integer energy Σ(b-128)² makes
#     rms_q = floor(sqrt(energy/1048576)·1e9) bit-identical in any
#     IEEE engine; zero crossings = sign changes within a window.
MEDIA_ORACLE = """
WITH f AS (
  SELECT doc_id,
         printf('img/%d_%d.JPG', doc_id, doc_id % 5) AS path,
         text, length(text) AS n_text
  FROM documents
), b AS (
  SELECT f.path, s.i,
         CASE WHEN s.i < f.n_text
              THEN ord(substr(f.text, CAST(s.i + 1 AS INT), 1))
              ELSE 0 END AS byte
  FROM f CROSS JOIN (SELECT unnest(range(0, 256)) AS i) s
), sgn AS (
  SELECT path, i, byte,
         byte < 128 AS neg,
         lag(byte < 128) OVER (PARTITION BY path ORDER BY i) AS prev_neg,
         CAST(floor(i / 64) AS BIGINT) AS win_idx
  FROM b
), win AS (
  SELECT path, win_idx,
         SUM((byte - 128) * (byte - 128)) AS energy,
         SUM(CASE WHEN i % 64 <> 0 AND neg <> prev_neg
                  THEN 1 ELSE 0 END) AS zc
  FROM sgn GROUP BY path, win_idx
), audio AS (
  SELECT path,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(SUM(CAST(floor(sqrt(energy / 1048576.0) * 1000000000.0)
                       AS BIGINT)) AS BIGINT) AS rms_q_sum,
         CAST(SUM(zc) AS BIGINT) AS total_zero_crossings
  FROM win GROUP BY path
)
SELECT a.path,
       CAST(fi.frame_idx AS BIGINT) AS frame_idx,
       CAST(12 AS BIGINT) AS n_frames,
       CAST(16 AS BIGINT) AS frame_bytes,
       a.n_windows, a.rms_q_sum, a.total_zero_crossings,
       CAST(4 AS BIGINT) AS n_vertices,
       CAST(3.5 AS DOUBLE) AS mean_u,
       CAST(6 AS BIGINT) AS width,
       CAST(6 AS BIGINT) AS height,
       CAST(36 AS BIGINT) AS n_bytes
FROM audio a CROSS JOIN (SELECT unnest([0, 4, 8]) AS frame_idx) fi
"""


@register(
    "mm1_mm2_mm3_media_pipeline", MEDIA_ORACLE,
    doc="Multimodal pipeline over image/audio/video binary columns, "
        "one declared result joined per file: mapInPandas decode + "
        "corner extraction (U3) → relational post-filter on "
        "n_vertices (P6), the binary-in/binary-out crop UDF (U9, the "
        "800→640 center crop, cut600.py:12-38) with its byte "
        "accounting, video frame sampling (1→N fan-out with frame "
        "index/count) and fixed-window audio features (quantized RMS "
        "+ zero crossings) — the decode, feature-extract, resize, "
        "frame-sample and audio-feature stages of a media dataset "
        "build (act_img.py:254-324). Decoders are the injectable "
        "deterministic fakes; batch shapes, schemas, partitioning and "
        "the fan-out are the production path. Oracle-checked: every "
        "declared scalar is bit-exactly restated in DuckDB over the "
        "same payload bytes (fixed-point rms_q, integer counts, "
        "exact-double geometry)")
def media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..udf.media_ops import audio_window_features, sample_frames

    files = _binary_corpus(spark, sf_dir)
    corners = extract_corners(files)
    quad = (corners.filter(F.col("n_vertices") == 4)
            .select("path",
                    F.col("n_vertices").cast("bigint").alias("n_vertices"),
                    F.round(F.aggregate(
                        F.transform("corners", lambda c: c["u"]),
                        F.lit(0.0), lambda a, x: a + x) / 4.0, 6)
                    .alias("mean_u")))
    cropped = center_crop(files, out_frac=0.75).select(
        "path",
        F.col("width").cast("bigint").alias("width"),
        F.col("height").cast("bigint").alias("height"),
        F.length("content").cast("bigint").alias("n_bytes"))
    frames = sample_frames(files).select(
        "path",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.col("n_frames").cast("bigint").alias("n_frames"),
        F.length("content").cast("bigint").alias("frame_bytes"))
    audio = (audio_window_features(files)
             .groupBy("path")
             .agg(F.count("*").cast("bigint").alias("n_windows"),
                  F.sum("rms_q").cast("bigint").alias("rms_q_sum"),
                  F.sum("zero_crossings").cast("bigint")
                   .alias("total_zero_crossings")))
    per_file = (quad.join(cropped, "path")
                .select("path", "n_vertices", "mean_u",
                        "width", "height", "n_bytes"))
    return (frames.join(audio, "path").join(per_file, "path")
            .select("path", "frame_idx", "n_frames", "frame_bytes",
                    "n_windows", "rms_q_sum", "total_zero_crossings",
                    "n_vertices", "mean_u", "width", "height", "n_bytes"))
