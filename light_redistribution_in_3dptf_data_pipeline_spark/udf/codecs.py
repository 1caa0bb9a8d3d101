"""Pure-Python public-format codecs for the multimodal decoder seams.

The container ships no image/audio libraries, so the mm pipeline's
decode stages are injectable (``udf/image_ops.py`` /
``udf/media_ops.py``) with deterministic fakes as the default. These
two REAL codecs — implemented from the published format specs alone,
zero dependencies beyond numpy — close the "fake decoder only" gap
for the formats simple enough to parse by hand:

- **netpbm** (PGM ``P5`` binary grayscale / PPM ``P6`` binary RGB):
  the classic whitespace-token header (with ``#`` comments) followed
  by a raw raster, 1 byte per sample at maxval<=255, 2 bytes
  big-endian above. Spec: the netpbm format pages (pgm(5)/ppm(5)).
- **WAV** (RIFF little-endian container, ``fmt `` + ``data`` chunks,
  PCM integer samples): 8-bit unsigned or 16-bit signed LE, any
  channel count (channels are averaged to mono — the standard mono
  downmix for feature extraction). Spec: the RIFF/WAVE chunk layout
  (Microsoft multimedia file formats documentation).

``real_decode``/``real_audio_decode`` in the UDF modules route
recognizable payloads (magic-sniffed) here and still raise
``NotImplementedError`` for formats that genuinely need a codec
library (JPEG/PNG/MP3/...), so the seam's contract is unchanged —
it just stops being stub-only.

Reference parity: the reference's pipelines read camera frames and
write image artifacts via OpenCV (pixel_processing.py, cut600.py);
these parsers give the same binary-in/array-out seam a real on-disk
format without adding dependencies.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------- netpbm

def _pnm_tokens(buf: bytes, start: int):
    """Yield (token, end_offset) over the PNM header: tokens are
    whitespace-separated; ``#`` starts a comment running to EOL."""
    i = start
    n = len(buf)
    while i < n:
        c = buf[i:i + 1]
        if c in b" \t\r\n\x0b\x0c":
            i += 1
        elif c == b"#":
            while i < n and buf[i:i + 1] not in b"\r\n":
                i += 1
        else:
            j = i
            while j < n and buf[j:j + 1] not in b" \t\r\n\x0b\x0c#":
                j += 1
            yield buf[i:j], j
            i = j


def pnm_decode(content: bytes) -> np.ndarray:
    """Decode binary PGM (``P5``) → (h, w) float64, or binary PPM
    (``P6``) → (h, w) float64 grayscale via the floor-mean of the
    three channels (integer arithmetic — deterministic everywhere).

    Raises ``ValueError`` on malformed or truncated payloads and
    ``NotImplementedError`` for the ASCII variants (P1-P3) — decode
    errors and unsupported-format errors stay distinguishable so the
    pipeline's quarantine path can route them differently.
    """
    magic = content[:2]
    if magic in (b"P1", b"P2", b"P3"):
        raise NotImplementedError(f"ASCII netpbm {magic!r} not supported")
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: {content[:2]!r}")
    fields = []
    pos = 2
    for tok, pos in _pnm_tokens(content, 2):
        if not tok.isdigit():
            raise ValueError(f"bad netpbm header token {tok!r}")
        fields.append(int(tok))
        if len(fields) == 3:
            break
    if len(fields) < 3:
        raise ValueError("truncated netpbm header")
    w, h, maxval = fields
    if not (0 < maxval < 65536 and w > 0 and h > 0):
        raise ValueError(f"bad netpbm dimensions {w}x{h} maxval={maxval}")
    # exactly ONE whitespace byte separates maxval from the raster
    raster = pos + 1
    channels = 3 if magic == b"P6" else 1
    wide = maxval > 255
    need = w * h * channels * (2 if wide else 1)
    if len(content) < raster + need:
        raise ValueError(
            f"truncated netpbm raster: need {need} bytes, "
            f"have {len(content) - raster}")
    dt = np.dtype(">u2") if wide else np.dtype("u1")
    arr = np.frombuffer(content, dtype=dt, count=w * h * channels,
                        offset=raster)
    if channels == 3:
        rgb = arr.reshape(h, w, 3).astype(np.int64)
        gray = (rgb[:, :, 0] + rgb[:, :, 1] + rgb[:, :, 2]) // 3
        return gray.astype(np.float64)
    return arr.reshape(h, w).astype(np.float64)


def pnm_encode(img: np.ndarray, maxval: int = 255,
               comment: str | None = None) -> bytes:
    """(h, w) integer-valued array → binary PGM ``P5`` payload.
    The S8-style image-write counterpart used by roundtrip tests.
    Samples outside [0, maxval] raise instead of silently wrapping
    in the width cast."""
    h, w = img.shape
    arr = np.ascontiguousarray(img, dtype=np.int64)
    if arr.size and (arr.min() < 0 or arr.max() > maxval):
        raise ValueError(
            f"pnm_encode: sample range [{arr.min()}, {arr.max()}] "
            f"outside [0, {maxval}]")
    header = f"P5\n{'# ' + comment + chr(10) if comment else ''}" \
             f"{w} {h}\n{maxval}\n".encode()
    dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    return header + arr.astype(dt).tobytes()


def ppm_encode_rgb(rgb: np.ndarray, maxval: int = 255) -> bytes:
    """(h, w, 3) integer-valued array → binary PPM ``P6`` payload."""
    h, w, c = rgb.shape
    if c != 3:
        raise ValueError("ppm_encode_rgb needs (h, w, 3)")
    header = f"P6\n{w} {h}\n{maxval}\n".encode()
    dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
    return header + np.ascontiguousarray(rgb, dtype=np.int64) \
        .astype(dt).tobytes()


# ----------------------------------------------------------------- WAV

def wav_decode(content: bytes) -> np.ndarray:
    """RIFF/WAVE PCM → (samples,) float64 in [-1, 1), mono (channels
    floor-averaged in integer space then normalized — deterministic).

    Supports the integer PCM encodings a header-only parser can
    handle: format tag 1 (PCM), 8-bit unsigned or 16-bit signed LE.
    ``ValueError`` for malformed RIFF, ``NotImplementedError`` for
    compressed/float formats (those need a real codec library).
    """
    if len(content) < 12 or content[:4] != b"RIFF" \
            or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        (size,) = struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)       # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("truncated fmt chunk")
    tag, n_ch, _rate, _bps, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0)
    if tag != 1:
        raise NotImplementedError(
            f"WAV format tag {tag} needs a codec library (PCM only)")
    if n_ch < 1:
        raise ValueError("WAV with zero channels")
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2",
                            count=len(data) // 2).astype(np.int64)
        scale = 32768.0
    elif bits == 8:
        raw = np.frombuffer(data, dtype="u1").astype(np.int64) - 128
        scale = 128.0
    else:
        raise NotImplementedError(f"{bits}-bit WAV PCM not supported")
    n_frames = len(raw) // n_ch
    frames = raw[:n_frames * n_ch].reshape(n_frames, n_ch)
    # integer floor-mean downmix, then one exact float divide
    mono = np.floor_divide(frames.sum(axis=1), n_ch)
    return mono.astype(np.float64) / scale


def wav_encode(samples: np.ndarray, rate: int = 16000,
               bits: int = 16, channels: int = 1) -> bytes:
    """(n,) or (n, channels) integer samples → RIFF/WAVE PCM payload
    (16-bit signed LE or 8-bit unsigned). Roundtrip-test counterpart."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.shape[1] != channels:
        raise ValueError(f"expected {channels} channels, "
                         f"got shape {arr.shape}")
    lo, hi = (-32768, 32767) if bits == 16 else (-128, 127)
    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16")
    a64 = arr.astype(np.int64)
    if a64.size and (a64.min() < lo or a64.max() > hi):
        raise ValueError(
            f"wav_encode: sample range [{a64.min()}, {a64.max()}] "
            f"outside {bits}-bit PCM [{lo}, {hi}]")
    if bits == 16:
        data = a64.astype("<i2").tobytes()
    else:
        data = (a64 + 128).astype("u1").tobytes()
    align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * align,
                      align, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data
              + (b"\0" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
