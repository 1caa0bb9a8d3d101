"""Real public-format codecs behind the multimodal decoder seams:
netpbm (PGM/PPM) and RIFF/WAVE PCM, implemented from the published
specs with zero dependencies. Roundtrip properties plus the mm
pipeline stages driven over REAL encoded payloads — the seam contract
(schema, batching, shapes) demonstrated on an actual on-disk format,
not just the deterministic fakes."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from light_redistribution_in_3dptf_data_pipeline_spark.udf import image_ops, media_ops
from light_redistribution_in_3dptf_data_pipeline_spark.udf.codecs import (
    pnm_decode,
    pnm_encode,
    ppm_encode_rgb,
    wav_decode,
    wav_encode,
)


class TestNetpbm:
    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 10**6))
    def test_pgm_roundtrip_8bit(self, h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w))
        out = pnm_decode(pnm_encode(img, maxval=255))
        assert out.shape == (h, w)
        assert np.array_equal(out, img.astype(np.float64))

    @settings(max_examples=10, deadline=None)
    @given(st.integers(1, 8), st.integers(1, 8), st.integers(0, 10**6))
    def test_pgm_roundtrip_16bit(self, h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 65536, size=(h, w))
        out = pnm_decode(pnm_encode(img, maxval=65535))
        assert np.array_equal(out, img.astype(np.float64))

    def test_ppm_rgb_floor_mean(self):
        rgb = np.array([[[10, 20, 31], [255, 0, 0]],
                        [[1, 1, 2], [100, 100, 100]]])
        out = pnm_decode(ppm_encode_rgb(rgb))
        # integer floor-mean per pixel
        assert np.array_equal(out, np.array([[20.0, 85.0],
                                             [1.0, 100.0]]))

    def test_header_comments_and_whitespace(self):
        img = np.arange(6).reshape(2, 3)
        payload = pnm_encode(img, comment="made by a test")
        assert b"# made by a test" in payload
        assert np.array_equal(pnm_decode(payload), img.astype(float))
        # spec allows any whitespace mix between header tokens
        exotic = b"P5 #c\n 3\t2 #more\n\t255\n" + bytes(range(6))
        assert np.array_equal(pnm_decode(exotic), img.astype(float))

    def test_raster_starts_after_single_whitespace_byte(self):
        """The byte after maxval is the ONE separator; a raster whose
        first pixel is 0x0A (newline) must not be eaten by a naive
        whitespace skip."""
        raster = bytes([0x0A, 0x20, 0x23, 5, 6, 7])  # \n, space, '#'
        payload = b"P5\n3 2\n255\n" + raster
        out = pnm_decode(payload)
        assert out[0, 0] == 0x0A and out[0, 1] == 0x20 and \
            out[0, 2] == 0x23

    def test_malformed_payloads_raise(self):
        with pytest.raises(ValueError):
            pnm_decode(b"JFIF....")
        with pytest.raises(ValueError):
            pnm_decode(b"P5\n3 2\n255\n\x00\x01")      # truncated raster
        with pytest.raises(ValueError):
            pnm_decode(b"P5\n3 2\n")                   # truncated header
        with pytest.raises(ValueError):
            pnm_decode(b"P5\n3 -2\n255\n")             # bad token
        with pytest.raises(NotImplementedError):
            pnm_decode(b"P2\n1 1\n255\n7")             # ASCII variant


class TestWav:
    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 300), st.integers(0, 10**6))
    def test_pcm16_mono_roundtrip(self, n, seed):
        rng = np.random.default_rng(seed)
        samples = rng.integers(-32768, 32768, size=n)
        out = wav_decode(wav_encode(samples))
        assert np.array_equal(out, samples.astype(np.float64) / 32768.0)

    def test_pcm8_roundtrip(self):
        samples = np.array([-128, -1, 0, 1, 127])
        out = wav_decode(wav_encode(samples, bits=8))
        assert np.array_equal(out, samples.astype(np.float64) / 128.0)

    def test_stereo_floor_mean_downmix(self):
        stereo = np.array([[100, 201], [-5, -6], [32767, -32768]])
        out = wav_decode(wav_encode(stereo, channels=2))
        # integer floor-mean: (100+201)//2=150, (-5-6)//2=-6 (floor),
        # (32767-32768)//2=-1
        assert np.array_equal(out * 32768.0,
                              np.array([150.0, -6.0, -1.0]))

    def test_odd_data_chunk_is_word_aligned(self):
        """RIFF chunks pad odd sizes; an 8-bit mono stream of odd
        length exercises the pad path on encode AND the aligned walk
        on decode."""
        samples = np.array([-128, 0, 127])
        payload = wav_encode(samples, bits=8)
        assert len(payload) % 2 == 0
        assert np.array_equal(wav_decode(payload) * 128.0,
                              samples.astype(np.float64))

    def test_encoders_reject_out_of_range_samples(self):
        with pytest.raises(ValueError, match="outside"):
            wav_encode(np.array([40000]))              # > int16
        with pytest.raises(ValueError, match="outside"):
            wav_encode(np.array([-129]), bits=8)
        with pytest.raises(ValueError, match="outside"):
            pnm_encode(np.array([[256]]))              # > maxval 255
        with pytest.raises(ValueError, match="outside"):
            pnm_encode(np.array([[-1]]))

    def test_unsupported_and_malformed(self):
        import struct

        with pytest.raises(ValueError):
            wav_decode(b"OggS....")
        with pytest.raises(ValueError):
            wav_decode(b"RIFF\x04\x00\x00\x00WAVE")     # no chunks
        # IEEE-float format tag (3) → explicitly unsupported
        fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
        payload = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8)
                   + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt))
                   + fmt + b"data" + struct.pack("<I", 0))
        with pytest.raises(NotImplementedError):
            wav_decode(payload)


@pytest.fixture(scope="module")
def real_media_dir(tmp_path_factory):
    """Real encoded payloads: 3 PGM images (12x10) and 3 WAV files
    (200 samples, PCM16 mono), deterministic content."""
    d = tmp_path_factory.mktemp("realmedia")
    for i in range(3):
        img = (np.arange(120).reshape(10, 12) * (i + 3)) % 256
        (d / f"{i}_0.pgm").write_bytes(pnm_encode(img))
        t = np.arange(200)
        wav = (3000 * (i + 1) * np.sin(t / (4.0 + i))).astype(np.int64)
        (d / f"{i}_0.wav").write_bytes(wav_encode(wav))
    return str(d)


class TestPipelineOverRealPayloads:
    """The mm Spark stages run unchanged over real-format bytes with
    the REAL decoders — proving the seam carries an actual codec, not
    only the fakes the driver row uses."""

    def test_extract_corners_over_pgm(self, spark, real_media_dir):
        from light_redistribution_in_3dptf_data_pipeline_spark.sources import binary_catalog

        files = binary_catalog.scan_files(
            spark, real_media_dir, glob="*.pgm", with_content=True)
        out = image_ops.extract_corners(
            files, decoder=image_ops.real_decode).collect()
        assert len(out) == 3
        for r in out:
            assert r.n_vertices == 4 and len(r.corners) == 4
            # exact check against the REAL decoded 12x10 geometry —
            # a fallback to the 8x8 fake would shift every corner
            img = pnm_decode(
                open(r.path.removeprefix("file:"), "rb").read())
            assert img.shape == (10, 12)
            off = float(img.mean() % 7)
            want = [(off, off), (11 - off, off),
                    (11 - off, 9 - off), (off, 9 - off)]
            assert [(c.u, c.v) for c in r.corners] == want

    def test_center_crop_over_pgm(self, spark, real_media_dir):
        from light_redistribution_in_3dptf_data_pipeline_spark.sources import binary_catalog

        files = binary_catalog.scan_files(
            spark, real_media_dir, glob="*.pgm", with_content=True)
        out = image_ops.center_crop(
            files, out_frac=0.5, decoder=image_ops.real_decode).collect()
        assert len(out) == 3
        for r in out:
            assert (r.width, r.height) == (6, 5)        # 12x10 → 6x5
            assert len(r.content) == 30
        # crop content equals the numpy slice of the decoded original
        one = min(out, key=lambda r: r.path)
        orig = pnm_decode(
            open(one.path.removeprefix("file:"), "rb").read())
        want = orig[2:7, 3:9].astype(np.uint8).tobytes()
        assert bytes(one.content) == want

    def test_audio_features_over_wav(self, spark, real_media_dir):
        from light_redistribution_in_3dptf_data_pipeline_spark.sources import binary_catalog

        files = binary_catalog.scan_files(
            spark, real_media_dir, glob="*.wav", with_content=True)
        out = media_ops.audio_window_features(
            files, window=50,
            decoder=media_ops.real_audio_decode).collect()
        assert len(out) == 12                           # 3 files × 4
        by_path = {}
        for r in out:
            by_path.setdefault(r.path, []).append(r)
        for path, rows in by_path.items():
            samples = wav_decode(
                open(path.removeprefix("file:"), "rb").read())
            for r in rows:
                seg = samples[r.win_idx * 50:(r.win_idx + 1) * 50]
                want = float(np.sqrt(np.mean(seg * seg)))
                assert abs(r.rms - want) < 1e-12
                assert r.rms_q == int(np.floor(want * 1e9))
