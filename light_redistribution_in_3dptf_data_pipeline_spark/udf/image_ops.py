"""Image UDF stages (SURVEY §2.9 U3/U5/U9/U10) and the external-
process sink pattern (U10/U11/U12 — ``hdrgen``/``pcomb``).

The container has no image codec libraries, so *decoding* is an
injectable function: production would pass a cv2/PIL-backed decoder;
tests pass the deterministic fake below. Everything Spark-side — the
binary column flow, Arrow batching, schemas, per-pose partitioning,
subprocess fan-out — is real and tested.
"""

from __future__ import annotations

import subprocess
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType,
                               IntegerType, StringType, StructField,
                               StructType)

Decoder = Callable[[bytes], np.ndarray]


def fake_decode(content: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: derives an 8×8
    grayscale 'image' from the byte payload. Same bytes → same image,
    so downstream stages are testable end-to-end."""
    h = np.frombuffer(content[:64].ljust(64, b"\0"), dtype=np.uint8)
    return h.reshape(8, 8).astype(np.float64)


def real_decode(content: bytes) -> np.ndarray:
    """Production decoder. Binary netpbm payloads (PGM ``P5`` / PPM
    ``P6``) decode via the zero-dependency spec parser in
    ``udf/codecs.py`` — a REAL on-disk format exercising the same
    seam as the fakes (tests/test_image_ops.py drives the mm stages
    over encoded PGM bytes). Anything else (JPEG/PNG/...) still needs
    an injected cv2/PIL decoder."""
    if content[:2] in (b"P5", b"P6"):
        from .codecs import pnm_decode

        return pnm_decode(content)
    raise NotImplementedError(
        "no JPEG/PNG codec in this environment; inject a cv2/PIL "
        "decoder (netpbm P5/P6 decodes natively via udf/codecs.py)")


CORNER_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("n_vertices", IntegerType()),
    StructField("corners", ArrayType(StructType([
        StructField("u", DoubleType()), StructField("v", DoubleType())]))),
])


def extract_corners(files: DataFrame,
                    decoder: Decoder = fake_decode) -> DataFrame:
    """U3: per-image quadrilateral corner extraction over binary
    content via mapInPandas (pixel_processing.py:14-43's
    blur→threshold→contour→approx chain, behind the decoder seam).

    The fake path detects the 'quad' deterministically: 4 corner
    pixels of the decoded array's bounding box, weighted by content —
    enough to exercise schema, batching and the downstream T4 sort +
    P6 ``n_vertices == 4`` filter.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img = decoder(bytes(content))
                h, w = img.shape
                # deterministic pseudo-detection: corner offsets from
                # image statistics (stands in for contour analysis)
                off = float(img.mean() % 7)
                quad = [
                    {"u": off, "v": off},
                    {"u": w - 1 - off, "v": off},
                    {"u": w - 1 - off, "v": h - 1 - off},
                    {"u": off, "v": h - 1 - off},
                ]
                rows.append({"path": path, "n_vertices": 4,
                             "corners": quad})
            yield pd.DataFrame(rows, columns=["path", "n_vertices",
                                              "corners"])

    return files.select("path", "content").mapInPandas(fn, CORNER_SCHEMA)


CROP_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("content", BinaryType()),
])


def center_crop(files: DataFrame, out_frac: float = 0.8,
                decoder: Decoder = fake_decode) -> DataFrame:
    """U9: center crop (cut600.py:29-32's 800→640 center crop,
    generalized to a fraction). Re-encodes via raw bytes of the
    cropped array — the binary-out plumbing of an image sink (S8)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img = decoder(bytes(content))
                h, w = img.shape
                ch, cw = int(h * out_frac), int(w * out_frac)
                y0, x0 = (h - ch) // 2, (w - cw) // 2
                crop = img[y0:y0 + ch, x0:x0 + cw]
                rows.append({"path": path, "width": cw, "height": ch,
                             "content": crop.astype(np.uint8).tobytes()})
            yield pd.DataFrame(rows, columns=["path", "width", "height",
                                              "content"])

    return files.select("path", "content").mapInPandas(fn, CROP_SCHEMA)


HDR_SCHEMA = StructType([
    StructField("pose_id", IntegerType()),
    StructField("n_inputs", IntegerType()),
    StructField("ok", IntegerType()),
    StructField("output", StringType()),
])


FILTER_SCHEMA = StructType([
    StructField("path", StringType()),
    StructField("ok", IntegerType()),
    StructField("output", StringType()),
])


def external_filter_per_file(catalog: DataFrame, out_dir: str,
                             command: list[str] | None = None,
                             suffix: str = ".out") -> DataFrame:
    """U12: per-file external filter — the ``pcomb -s 0.9 in > out``
    luminance rescale (lumiadjust.py:10-18), generalized. One
    subprocess per row inside ``mapInPandas``; Spark task scheduling
    bounds concurrency (vs the reference's sequential loop). Default
    command is ``cat`` so the plumbing is testable without Radiance
    binaries installed."""
    cmd = command or ["cat"]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                local = path.removeprefix("file:")
                out = f"{out_dir}/{local.rsplit('/', 1)[-1]}{suffix}"
                with open(out, "wb") as fh:
                    res = subprocess.run(cmd + [local], stdout=fh,
                                         check=False)
                rows.append({"path": path,
                             "ok": int(res.returncode == 0),
                             "output": out})
            yield pd.DataFrame(rows, columns=["path", "ok", "output"])

    return catalog.select("path").mapInPandas(fn, FILTER_SCHEMA)


def hdr_merge_groups(catalog: DataFrame, out_dir: str,
                     command: list[str] | None = None,
                     expected: int = 5) -> DataFrame:
    """U11: external-process merge per exposure group
    (handlehdrgen.py:24-42). One ``applyInPandas`` task per pose
    replaces the reference's 8-thread pool — parallelism is Spark task
    scheduling, bounded by executor slots, with groups co-located by
    the pose_id shuffle.

    ``command`` is the external binary argv prefix; paths are appended
    and ``{out}`` is substituted (default: the portable ``cat`` as an
    hdrgen stand-in — the subprocess plumbing is what's under test).
    Incomplete groups are skipped exactly like the reference
    (handlehdrgen.py:25-27).
    """
    cmd = command or ["cat"]

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pose = int(pdf["pose_id"].iloc[0])
        paths = sorted(pdf["path"].tolist())
        if len(paths) < expected:
            return pd.DataFrame([{"pose_id": pose, "n_inputs": len(paths),
                                  "ok": 0, "output": ""}])
        out = f"{out_dir}/{pose}.hdr"
        argv = [a.replace("{out}", out) for a in cmd] + paths
        with open(out, "wb") as fh:
            res = subprocess.run(argv, stdout=fh, check=False)
        return pd.DataFrame([{"pose_id": pose, "n_inputs": len(paths),
                              "ok": int(res.returncode == 0),
                              "output": out}])

    local = catalog.select(
        "pose_id",
        F.regexp_replace("path", "^file:", "").alias("path"))
    return local.groupBy("pose_id").applyInPandas(merge, HDR_SCHEMA)
