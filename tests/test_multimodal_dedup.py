"""Perceptual image dedup: dhash64 / image_from_dhash / image_dhash_dedup.

Also pins the PLANTED-ORACLE preconditions of the image_dedup contract
query: the 25 family codewords (md5 "imgfam-0-{f}") must stay pairwise
hamming >= 11 with all four 16-bit bands pairwise distinct — that is
what guarantees families cluster exactly and never merge."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from texoo_ray.core.codecs import decode_ppm, encode_bmp, encode_ppm
from texoo_ray.stages.multimodal import (
    dhash64,
    image_dhash_dedup,
    image_from_dhash,
)


def _codewords():
    return [
        int.from_bytes(hashlib.md5(b"imgfam-0-%d" % f).digest()[:8], "big")
        for f in range(25)
    ]


class TestDhash:
    def test_image_from_dhash_roundtrip_exact(self):
        for t in (0, 1, 2**63, 0xDEADBEEFCAFEF00D, (1 << 64) - 1):
            img = image_from_dhash(t)
            assert dhash64(decode_ppm(encode_ppm(img))) == t

    def test_contract_codewords_separated(self):
        ws = _codewords()
        for i in range(len(ws)):
            for j in range(i + 1, len(ws)):
                assert bin(ws[i] ^ ws[j]).count("1") >= 11
                for b in range(4):
                    assert (ws[i] >> (16 * b)) & 0xFFFF != (
                        ws[j] >> (16 * b)
                    ) & 0xFFFF

    def test_dhash_insensitive_to_2x_upscale(self):
        t = 0xDEADBEEFCAFEF00D
        img = image_from_dhash(t)
        big = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
        assert dhash64(big) == t


class TestImageDhashDedup:
    def _run(self, rows):
        import ray.data

        tbl = pa.table(
            {
                "media_id": pa.array([r[0] for r in rows], pa.int64()),
                "payload": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
        out = image_dhash_dedup(
            ray.data.from_arrow(tbl).repartition(2)
        ).to_pandas()
        return dict(zip(out["media_id"], out["cluster_id"]))

    def test_near_dups_cluster_far_do_not(self, ray_session):
        w = _codewords()[0]
        w3 = w ^ 0b111  # hamming 3 -> same cluster
        w4 = w ^ 0b1111  # hamming 4 -> NOT clustered
        other = _codewords()[1]
        rows = [
            (1, encode_ppm(image_from_dhash(w))),
            (2, encode_ppm(image_from_dhash(w3))),
            (3, encode_ppm(image_from_dhash(w4))),
            (4, encode_ppm(image_from_dhash(other))),
            (5, encode_bmp(image_from_dhash(w))),  # BMP decodes too
        ]
        got = self._run(rows)
        assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 1}

    def test_undecodable_skipped_or_raises(self, ray_session):
        rows = [
            (1, encode_ppm(image_from_dhash(_codewords()[0]))),
            (2, b"\x89PNG not really decodable"),
        ]
        assert self._run(rows) == {1: 1}
        import ray.data

        tbl = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "payload": pa.array([b"garbage"], pa.binary()),
            }
        )
        with pytest.raises(Exception):
            image_dhash_dedup(
                ray.data.from_arrow(tbl), on_unknown="error"
            ).to_pandas()


def _audio_codewords():
    return [
        int.from_bytes(hashlib.md5(b"audfam-0-%d" % f).digest()[:8], "big")
        for f in range(25)
    ]


class TestAudioFingerprint:
    def test_roundtrip_exact(self):
        from texoo_ray.core.codecs import decode_wav, encode_wav
        from texoo_ray.stages.multimodal import (
            audio_fingerprint64,
            audio_from_fingerprint64,
        )

        for t in (0, 1, 2**63, 0xDEADBEEFCAFEF00D, (1 << 64) - 1):
            s = audio_from_fingerprint64(t)
            assert audio_fingerprint64(decode_wav(encode_wav(s, 8000))[0]) == t

    def test_contract_codewords_separated(self):
        ws = _audio_codewords()
        for i in range(len(ws)):
            for j in range(i + 1, len(ws)):
                assert bin(ws[i] ^ ws[j]).count("1") >= 11
                for b in range(4):
                    assert (ws[i] >> (16 * b)) & 0xFFFF != (
                        ws[j] >> (16 * b)
                    ) & 0xFFFF

    def test_stereo_mixdown_and_too_short(self):
        import numpy as np

        from texoo_ray.core.codecs import UnsupportedMediaError
        from texoo_ray.stages.multimodal import (
            audio_fingerprint64,
            audio_from_fingerprint64,
        )

        t = 0xDEADBEEFCAFEF00D
        mono = audio_from_fingerprint64(t)
        stereo = np.stack([mono, mono], axis=1)
        assert audio_fingerprint64(stereo) == t
        with pytest.raises(UnsupportedMediaError):
            audio_fingerprint64(np.zeros(64, np.int16))


class TestAudioDedup:
    def test_near_dups_cluster(self, ray_session):
        import ray.data

        from texoo_ray.core.codecs import encode_wav
        from texoo_ray.stages.multimodal import (
            audio_fingerprint_dedup,
            audio_from_fingerprint64,
        )

        w = _audio_codewords()[0]
        other = _audio_codewords()[1]
        rows = [
            (1, encode_wav(audio_from_fingerprint64(w), 8000)),
            (2, encode_wav(audio_from_fingerprint64(w ^ 0b101), 8000)),
            (3, encode_wav(audio_from_fingerprint64(w ^ 0b11110), 8000)),
            (4, encode_wav(audio_from_fingerprint64(other), 8000)),
            (5, b"not a wav"),  # skipped
        ]
        tbl = pa.table(
            {
                "media_id": pa.array([r[0] for r in rows], pa.int64()),
                "payload": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
        out = audio_fingerprint_dedup(
            ray.data.from_arrow(tbl).repartition(2)
        ).to_pandas()
        got = dict(zip(out["media_id"], out["cluster_id"]))
        assert got == {1: 1, 2: 1, 3: 3, 4: 4}


class TestVideoFingerprint:
    def test_steady_shot_equals_frame_dhash(self):
        from texoo_ray.core.codecs import encode_ppmv
        from texoo_ray.stages.multimodal import (
            image_from_dhash,
            video_fingerprint64,
        )

        t = 0xDEADBEEFCAFEF00D
        payload = encode_ppmv([image_from_dhash(t)] * 5)
        assert video_fingerprint64(payload) == t
        # frame sampling must not change a steady shot
        assert video_fingerprint64(payload, every=3) == t

    def test_majority_across_cuts(self):
        from texoo_ray.core.codecs import encode_ppmv
        from texoo_ray.stages.multimodal import (
            image_from_dhash,
            video_fingerprint64,
        )

        t = _codewords()[0]
        tf = t ^ 0b1  # one frame disagrees in one bit
        payload = encode_ppmv(
            [image_from_dhash(t), image_from_dhash(t), image_from_dhash(tf)]
        )
        assert video_fingerprint64(payload, every=1) == t

    def test_video_dedup_clusters(self, ray_session):
        import ray.data

        from texoo_ray.core.codecs import encode_ppmv
        from texoo_ray.stages.multimodal import (
            image_from_dhash,
            video_fingerprint_dedup,
        )

        w = _codewords()[0]
        rows = [
            (1, encode_ppmv([image_from_dhash(w)] * 3)),
            (2, encode_ppmv([image_from_dhash(w ^ 0b11)] * 4)),
            (3, encode_ppmv([image_from_dhash(_codewords()[1])] * 3)),
            (4, b"not a video"),
        ]
        tbl = pa.table(
            {
                "media_id": pa.array([r[0] for r in rows], pa.int64()),
                "payload": pa.array([r[1] for r in rows], pa.binary()),
            }
        )
        out = video_fingerprint_dedup(
            ray.data.from_arrow(tbl).repartition(2)
        ).to_pandas()
        assert dict(zip(out["media_id"], out["cluster_id"])) == {
            1: 1,
            2: 1,
            3: 3,
        }
