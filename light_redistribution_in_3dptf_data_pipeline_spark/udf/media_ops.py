"""Audio/video UDF stages — the multimodal pattern of
``udf/image_ops.py`` extended to time-series media: opaque ``binary``
content + typed metadata in, typed feature/frame rows out, all via
Arrow-batched ``mapInPandas``.

The container ships no media codecs, so decoding is an injectable
seam exactly like the image decoder: production passes an
av/ffmpeg/librosa-backed function; tests use the deterministic fakes.
Everything Spark-side — schemas, the 1→N frame fan-out, per-file
windowing, batch shapes — is real and tested.

Scale notes: frame sampling fans one video row out to N frame rows —
keep the fan-out AFTER any per-video filtering so pruning happens on
1× rows, and repartition by (path) before heavier per-frame stages so
one task owns one video's frames (the pose_id pattern from the image
pipeline).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField,
                               StructType)

VideoDecoder = Callable[[bytes], np.ndarray]   # (frames, h, w)
AudioDecoder = Callable[[bytes], np.ndarray]   # (samples,) float64


def fake_video_decode(content: bytes) -> np.ndarray:
    """Deterministic stand-in for a video decoder: derives
    (frames=12, 4, 4) grayscale frames from the byte payload."""
    h = np.frombuffer(content[:192].ljust(192, b"\0"), dtype=np.uint8)
    return h.reshape(12, 4, 4).astype(np.float64)


def real_video_decode(content: bytes) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "no video codec in this environment; inject an av/ffmpeg decoder")


def fake_audio_decode(content: bytes) -> np.ndarray:
    """Deterministic stand-in for an audio decoder: 256 samples in
    [-1, 1) derived from the byte payload."""
    h = np.frombuffer(content[:256].ljust(256, b"\0"), dtype=np.uint8)
    return (h.astype(np.float64) - 128.0) / 128.0


def real_audio_decode(content: bytes) -> np.ndarray:
    """Production audio decoder. RIFF/WAVE integer-PCM payloads decode
    via the zero-dependency spec parser in ``udf/codecs.py`` (8/16-bit
    PCM, mono downmix) — a REAL container format through the same seam
    as the fake (tests/test_media_ops.py drives the feature stage over
    encoded WAV bytes). Compressed formats still need an injected
    librosa/ffmpeg decoder."""
    if content[:4] == b"RIFF":
        from .codecs import wav_decode

        return wav_decode(content)
    raise NotImplementedError(
        "no MP3/OGG codec in this environment; inject a librosa/ffmpeg "
        "decoder (RIFF/WAVE PCM decodes natively via udf/codecs.py)")


FRAME_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("content", BinaryType()),
])


def sample_frames(files: DataFrame, every_k: int = 4,
                  decoder: VideoDecoder = fake_video_decode) -> DataFrame:
    """Video frame sampling: one binary video row fans out to every
    k-th frame as its own binary row (the UDTF-ish 1→N explode of the
    multimodal pipeline). Output carries the source frame index and
    total frame count so downstream stages can reconstruct timing."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                frames = decoder(bytes(content))
                n = frames.shape[0]
                for i in range(0, n, every_k):
                    rows.append({
                        "path": path, "frame_idx": i, "n_frames": n,
                        "content": frames[i].astype(np.uint8).tobytes()})
            yield pd.DataFrame(rows, columns=["path", "frame_idx",
                                              "n_frames", "content"])

    return files.select("path", "content").mapInPandas(fn, FRAME_SCHEMA)


AUDIO_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("win_idx", IntegerType()),
    StructField("rms", DoubleType()),
    StructField("rms_q", LongType()),
    StructField("zero_crossings", IntegerType()),
])


def audio_window_features(files: DataFrame, window: int = 64,
                          decoder: AudioDecoder = fake_audio_decode
                          ) -> DataFrame:
    """Audio feature extraction: fixed-size windows per file, RMS +
    zero-crossing count per window — the feature-extract stage of an
    audio corpus pipeline (each file → samples/window feature rows).

    ``rms_q`` is the oracle-checkable form of the RMS: the exact
    integer ``floor(rms * 1e9)``. With the fake decoder every
    intermediate is an exact double (samples are multiples of 1/128,
    squares multiples of 2^-14, partial sums bounded by the window
    size — all well inside 53 mantissa bits), and sqrt / the 1e9
    multiply are single correctly-rounded IEEE ops, so ANY engine
    that computes ``floor(sqrt(sum((b-128)^2)/(128^2*window))*1e9)``
    over the same bytes produces the identical integer — no
    engine-specific decimal-rounding semantics anywhere (the trap
    with ``round()``: Spark rounds the shortest decimal repr, DuckDB
    rounds ``x*10^d``)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                samples = decoder(bytes(content))
                n_win = len(samples) // window
                for w in range(n_win):
                    seg = samples[w * window:(w + 1) * window]
                    rms = float(np.sqrt(np.mean(seg * seg)))
                    rows.append({
                        "path": path, "win_idx": w,
                        "rms": rms,
                        "rms_q": int(np.floor(rms * 1e9)),
                        "zero_crossings": int(
                            np.count_nonzero(np.diff(np.signbit(seg)))),
                    })
            yield pd.DataFrame(rows, columns=["path", "win_idx", "rms",
                                              "rms_q", "zero_crossings"])

    return files.select("path", "content").mapInPandas(fn, AUDIO_SCHEMA)
