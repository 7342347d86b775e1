"""Pure-stdlib media codecs: encode/decode roundtrips + real features."""

import numpy as np
import pytest

from texoo_ray.core.codecs import (
    UnsupportedMediaError,
    audio_features,
    decode_bmp,
    decode_ppm,
    decode_ppmv_frames,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_ppmv,
    encode_wav,
    image_features,
    resize_nearest,
    sniff_media,
)


def _img(h=10, w=14):
    rng = np.random.RandomState(3)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestRoundtrips:
    def test_wav(self):
        rng = np.random.RandomState(0)
        samples = (rng.randn(500) * 5000).astype(np.int16)
        payload = encode_wav(samples, 8000)
        got, rate = decode_wav(payload)
        assert rate == 8000 and got.shape == (500, 1)
        assert np.array_equal(got[:, 0], samples)

    def test_wav_stereo(self):
        s = np.stack([np.arange(100), -np.arange(100)], axis=1).astype(np.int16)
        got, rate = decode_wav(encode_wav(s, 44100))
        assert rate == 44100 and np.array_equal(got, s)

    def test_ppm(self):
        img = _img()
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)

    def test_ppm_with_comment(self):
        img = _img(4, 4)
        payload = b"P6\n# a comment line\n4 4\n255\n" + img.tobytes()
        assert np.array_equal(decode_ppm(payload), img)

    def test_bmp(self):
        for w in (4, 5, 6, 7):  # exercise all row paddings
            img = _img(3, w)
            assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_ppmv_frame_sampling(self):
        frames = [_img(6, 6) for _ in range(10)]
        payload = encode_ppmv(frames)
        got = decode_ppmv_frames(payload, every=3)
        assert len(got) == 4  # frames 0,3,6,9
        assert np.array_equal(got[1], frames[3])
        limited = decode_ppmv_frames(payload, every=1, limit=2)
        assert len(limited) == 2

    def test_sniffing(self):
        assert sniff_media(encode_wav(np.zeros(4, np.int16))) == "wav"
        assert sniff_media(encode_ppm(_img(2, 2))) == "ppm"
        assert sniff_media(encode_bmp(_img(2, 2))) == "bmp"
        assert sniff_media(encode_ppmv([_img(2, 2)])) == "ppmv"
        assert sniff_media(b"\x89PNG....") == "unknown"

    def test_unsupported_raise(self):
        with pytest.raises(UnsupportedMediaError):
            decode_ppm(b"P3\n1 1\n255\n0 0 0")
        with pytest.raises(UnsupportedMediaError):
            decode_bmp(b"XX")


class TestTransformsFeatures:
    def test_resize_nearest(self):
        img = _img(8, 8)
        out = resize_nearest(img, 4, 2)
        assert out.shape == (2, 4, 3)
        assert np.array_equal(resize_nearest(img, 8, 8), img)

    def test_image_features_sane(self):
        flat = np.full((8, 8, 3), 128, np.uint8)
        f = image_features(flat)
        assert f.shape == (32,) and f[0] == 8 and f[1] == 8
        assert abs(f[2] - 128 / 255) < 0.01  # mean R
        assert f[5] < 1e-6  # std of a flat image is 0

    def test_audio_features_tone(self):
        rate = 8000
        t = np.arange(rate)  # 1 second
        tone = (10000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
        f = audio_features(tone, rate)
        assert abs(f[0] - 1.0) < 1e-3  # duration
        assert abs(f[1] - 10000 / 32768 / np.sqrt(2)) < 0.01  # RMS of sine
        # spectral centroid of a pure 440 Hz tone ~ 440/(rate/2)
        assert abs(f[3] - 440 / (rate / 2)) < 0.02
