"""Multimodal (image/audio/video) column plumbing + real stdlib decode.

Media payloads are opaque ``binary`` columns with typed metadata
(``media_type``, ``width``, ``height``, ``duration_ms``). The Ray-side
plumbing — schema, batch sizing for wide binary rows, actor-pool stage
shape, output layout — is real and tested, and so is the decode path for
the formats the standard library + numpy can handle (``core/codecs.py``):
RIFF/PCM WAV, P6 PPM, 24-bit BMP, and the PPMV frame container with
every-k-th frame sampling. Features are real numpy signal/image stats
(moments, histograms, RMS/ZCR/spectral centroid, FFT band profile).

Formats beyond that set (JPEG/PNG/MP3/MP4...) need codec libraries this
sandbox doesn't ship; ``on_unknown`` picks the policy — ``"fake"``
(deterministic pseudo-features, the previous stub behavior), ``"skip"``
(zero features), or ``"error"``.

Scale note: binary rows are wide — callers should pass a SMALL
``batch_size`` (e.g. 32) and let ``DataContext.target_max_block_size``
keep blocks bounded rather than splitting payloads.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import List, Optional

import numpy as np
import pyarrow as pa

from ..core.codecs import (
    UnsupportedMediaError,
    audio_features,
    decode_bmp,
    decode_ppm,
    decode_ppmv_frames,
    decode_wav,
    image_features,
    resize_nearest,
    sniff_media,
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 32


class MediaFeatureStage:
    """Actor-pool stage: decode + feature-extract media payloads.

    requires: ``payload`` — attaches: ``features`` (list<float32> of
    FEATURE_DIM), ``payload_bytes`` (int64), and for ``decode="real"``
    also ``container`` (sniffed format string).

    - ``decode="real"``: sniff container, decode with the stdlib codecs,
      resize images to ``thumb`` before feature extraction (bounded work
      per row regardless of source resolution), frame-sample videos at
      ``frame_every``.
    - ``decode="fake"``: deterministic pseudo-features from keyed hashes
      (the plumbing-only mode).
    """

    def __init__(
        self,
        decode: str = "real",
        on_unknown: str = "fake",
        thumb: int = 64,
        frame_every: int = 5,
        max_frames: int = 4,
    ):
        assert decode in ("real", "fake")
        assert on_unknown in ("fake", "skip", "error")
        self.decode = decode
        self.on_unknown = on_unknown
        self.thumb = thumb
        self.frame_every = frame_every
        self.max_frames = max_frames

    def _fake_features(self, payload: bytes) -> np.ndarray:
        # deterministic pseudo-embedding from keyed hashes of the bytes
        data = payload or b""
        h = b"".join(
            hashlib.blake2b(data, digest_size=64, salt=b"%d" % i).digest()
            for i in range((FEATURE_DIM * 4 + 63) // 64)
        )[: FEATURE_DIM * 4]
        return (
            np.frombuffer(h, dtype=np.uint32).astype(np.float32) / np.float32(2**32)
        )

    def _real_features(self, payload: bytes, kind: str) -> np.ndarray:
        if kind == "wav":
            samples, rate = decode_wav(payload)
            return audio_features(samples, rate, FEATURE_DIM)
        if kind in ("ppm", "bmp"):
            img = decode_ppm(payload) if kind == "ppm" else decode_bmp(payload)
            img = resize_nearest(img, self.thumb, self.thumb)
            return image_features(img, FEATURE_DIM)
        if kind == "ppmv":
            frames = decode_ppmv_frames(
                payload, every=self.frame_every, limit=self.max_frames
            )
            if not frames:
                return np.zeros(FEATURE_DIM, dtype=np.float32)
            per = [
                image_features(
                    resize_nearest(f, self.thumb, self.thumb), FEATURE_DIM
                )
                for f in frames
            ]
            return np.mean(per, axis=0).astype(np.float32)
        raise UnsupportedMediaError("unknown container")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats: List[np.ndarray] = []
        containers: List[str] = []
        for p in payloads:
            p = p or b""
            if self.decode == "fake":
                feats.append(self._fake_features(p))
                containers.append("fake")
                continue
            kind = sniff_media(p)
            containers.append(kind)
            if kind == "unknown":
                if self.on_unknown == "error":
                    raise UnsupportedMediaError(
                        "unknown media container (%d bytes)" % len(p)
                    )
                feats.append(
                    self._fake_features(p)
                    if self.on_unknown == "fake"
                    else np.zeros(FEATURE_DIM, dtype=np.float32)
                )
            else:
                feats.append(self._real_features(p, kind))
        sizes = [len(p or b"") for p in payloads]
        batch = batch.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )
        batch = batch.append_column("payload_bytes", pa.array(sizes, pa.int64()))
        if self.decode == "real":
            batch = batch.append_column(
                "container", pa.array(containers, pa.string())
            )
        return batch


def synthetic_media_table(n: int, seed: int = 42, real_payloads: bool = False) -> pa.Table:
    """Deterministic media rows. ``real_payloads=True`` emits REAL
    decodable bytes — WAV sine tones, PPM gradient images, PPMV frame
    sequences — so the real decode path can be exercised end-to-end."""
    from ..core.codecs import encode_ppm, encode_ppmv, encode_wav

    rng = np.random.RandomState(seed)
    types = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width", "height", "duration_ms")}
    for i in range(n):
        t = types[i % 3]
        if not real_payloads:
            size = int(rng.randint(64, 4096))
            payload = rng.bytes(size)
            w = int(rng.randint(16, 1920)) if t != "audio" else 0
            h = int(rng.randint(16, 1080)) if t != "audio" else 0
            dur = int(rng.randint(100, 60000)) if t != "image" else 0
        elif t == "image":
            w, h, dur = int(rng.randint(16, 64)), int(rng.randint(16, 64)), 0
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)),
                    (yy * 255 // max(h - 1, 1)),
                    ((xx + yy) * 255 // max(w + h - 2, 1)),
                ],
                axis=2,
            ).astype(np.uint8)
            payload = encode_ppm(img)
        elif t == "audio":
            rate = 8000
            dur = int(rng.randint(100, 1000))
            w = h = 0
            tt = np.arange(int(rate * dur / 1000.0))
            freq = float(rng.randint(100, 2000))
            payload = encode_wav(
                (10000 * np.sin(2 * np.pi * freq * tt / rate)).astype(np.int16), rate
            )
        else:
            w = h = 16
            n_frames = int(rng.randint(4, 12))
            dur = n_frames * 40
            frames = [
                np.full((h, w, 3), (fi * 37) % 256, dtype=np.uint8)
                for fi in range(n_frames)
            ]
            payload = encode_ppmv(frames)
        rows["media_id"].append(i)
        rows["media_type"].append(t)
        rows["payload"].append(payload)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash of an RGB image (the classic perceptual
    fingerprint): integer BT.601 luma, nearest-resize to 9x8, one bit
    per horizontal neighbor comparison (row-major, MSB first). All
    integer arithmetic — bit-reproducible across workers."""
    small = resize_nearest(img, 9, 8).astype(np.int64)
    lum = (
        299 * small[..., 0] + 587 * small[..., 1] + 114 * small[..., 2]
    ) // 1000
    bits = (lum[:, 1:] > lum[:, :-1]).ravel()
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


class ImageDHashStage:
    """Actor-pool stage: decode image payloads (PPM/BMP) and emit their
    64-bit dHash as int64 (two's complement). Non-image rows and
    undecodable payloads are skipped (``on_unknown="skip"``) or raise
    (``"error"``) — a perceptual hash of bytes we can't decode would be
    noise, not a feature.

    requires: ``media_id``, ``payload`` — emits (media_id, sig)."""

    def __init__(self, on_unknown: str = "skip"):
        if on_unknown not in ("skip", "error"):
            raise ValueError("on_unknown must be 'skip' or 'error'")
        self.on_unknown = on_unknown

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, sigs = [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            kind = sniff_media(payload or b"")
            try:
                if kind == "ppm":
                    img = decode_ppm(payload)
                elif kind == "bmp":
                    img = decode_bmp(payload)
                else:
                    raise UnsupportedMediaError(kind)
            except (UnsupportedMediaError, ValueError):
                if self.on_unknown == "error":
                    raise
                continue
            ids.append(mid)
            sigs.append(np.uint64(dhash64(img)).astype(np.int64))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sig": pa.array(np.array(sigs, dtype=np.int64), pa.int64()),
            }
        )


def image_dhash_dedup(
    ds,
    id_col: str = "media_id",
    max_hamming: int = 3,
    batch_size: int = 32,
    concurrency=2,
    on_unknown: str = "skip",
):
    """Perceptual image near-dup clustering: dHash every decodable
    image (actor pool, small batches — binary rows are wide), then the
    same banded 16-bit-quarter candidate + full-popcount verify +
    min-label closure as :func:`..stages.dedup.simhash_dedup`
    (``hamming_cluster_64``). Returns Dataset[(id_col, cluster_id)]
    over the DECODABLE image rows only.

    Scale shape: the signature pass reduces each image to 8 bytes, so
    everything after the decode is the text-simhash pipeline — the
    shuffle moves (id, sig) rows, never pixels."""
    from .dedup import hamming_cluster_64

    sigs = ds.map_batches(
        ImageDHashStage,
        fn_constructor_kwargs=dict(on_unknown=on_unknown),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if id_col != "media_id":
        sigs = sigs.rename_columns({"media_id": id_col})
    sigs = sigs.materialize()
    return hamming_cluster_64(
        sigs, sigs.select_columns([id_col]), id_col, max_hamming
    )


def image_from_dhash(target: int, base: int = 120, step: int = 8) -> np.ndarray:
    """9x8 gray RGB image whose :func:`dhash64` is EXACTLY ``target``:
    each row is a luminance ladder stepping +-``step`` according to the
    target's bits (row-major, MSB first — the dhash64 bit order). The
    planted-ground-truth generator that makes perceptual dedup
    SQL-oracle-checkable: flip k bits of the target and the planted
    image is a hamming-k near-duplicate by construction."""
    bits = np.unpackbits(
        np.frombuffer(int(target).to_bytes(8, "big"), np.uint8)
    ).reshape(8, 8)
    g = np.empty((8, 9), np.int64)
    g[:, 0] = base
    for c in range(8):
        g[:, c + 1] = g[:, c] + np.where(bits[:, c] == 1, step, -step)
    if g.min() < 0 or g.max() > 255:
        raise ValueError("base/step overflow uint8")
    return np.repeat(g.astype(np.uint8)[:, :, None], 3, axis=2)


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit time-domain audio fingerprint — the dHash idea over
    segment energies: mix to mono (integer mean), cut the first
    65*(n//65) samples into 65 equal segments, sum |amplitude| per
    segment, one bit per consecutive-segment comparison (MSB first).
    Pure integer arithmetic — bit-reproducible. Needs >= 65 samples
    (raises UnsupportedMediaError below that)."""
    if samples.ndim == 2:
        samples = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
    s = np.abs(samples.astype(np.int64))
    seg = len(s) // 65
    if seg < 1:
        raise UnsupportedMediaError("audio too short to fingerprint")
    e = s[: seg * 65].reshape(65, seg).sum(axis=1)
    bits = (e[1:] > e[:-1]).ravel()
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


def audio_from_fingerprint64(
    target: int, seg_len: int = 16, base: int = 16000, step: int = 250
) -> np.ndarray:
    """int16 mono samples whose :func:`audio_fingerprint64` is EXACTLY
    ``target``: 65 constant-amplitude segments whose energies ladder
    +-``step`` per target bit — the audio analogue of
    :func:`image_from_dhash`, making perceptual audio dedup
    oracle-checkable via planted codewords."""
    bits = np.unpackbits(
        np.frombuffer(int(target).to_bytes(8, "big"), np.uint8)
    ).astype(np.int64)
    amp = np.empty(65, np.int64)
    amp[0] = base
    amp[1:] = base + np.cumsum(np.where(bits == 1, step, -step))
    if amp.min() < 0 or amp.max() > 32767:
        raise ValueError("base/step overflow int16")
    return np.repeat(amp, seg_len).astype(np.int16)


class AudioFingerprintStage:
    """Actor-pool stage: decode WAV payloads and emit their 64-bit
    fingerprint as int64. Non-audio / undecodable rows skip or raise
    (same policy contract as ImageDHashStage)."""

    def __init__(self, on_unknown: str = "skip"):
        if on_unknown not in ("skip", "error"):
            raise ValueError("on_unknown must be 'skip' or 'error'")
        self.on_unknown = on_unknown

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, sigs = [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                if sniff_media(payload or b"") != "wav":
                    raise UnsupportedMediaError("not wav")
                samples, _ = decode_wav(payload)
                sig = audio_fingerprint64(samples)
            except (UnsupportedMediaError, ValueError):
                if self.on_unknown == "error":
                    raise
                continue
            ids.append(mid)
            sigs.append(np.uint64(sig).astype(np.int64))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sig": pa.array(np.array(sigs, dtype=np.int64), pa.int64()),
            }
        )


def audio_fingerprint_dedup(
    ds,
    id_col: str = "media_id",
    max_hamming: int = 3,
    batch_size: int = 32,
    concurrency=2,
    on_unknown: str = "skip",
):
    """Perceptual audio near-dup clustering: fingerprint every decodable
    WAV (actor pool), then the banded hamming<=3 candidate/verify/
    closure (stages/dedup.py::hamming_cluster_64). Returns
    Dataset[(id_col, cluster_id)] over the decodable audio rows. Same
    scale shape as image_dhash_dedup: 8 bytes per row after the decode
    pass; the shuffle never moves samples."""
    from .dedup import hamming_cluster_64

    sigs = ds.map_batches(
        AudioFingerprintStage,
        fn_constructor_kwargs=dict(on_unknown=on_unknown),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if id_col != "media_id":
        sigs = sigs.rename_columns({"media_id": id_col})
    sigs = sigs.materialize()
    return hamming_cluster_64(
        sigs, sigs.select_columns([id_col]), id_col, max_hamming
    )


def video_fingerprint64(payload: bytes, every: int = 2, limit: int = 32) -> int:
    """64-bit video fingerprint: frame-sampled decode (every ``every``-th
    frame, at most ``limit`` — the whole point of the PPMV index is
    skipping undecoded frames), :func:`dhash64` per sampled frame,
    BITWISE MAJORITY across frames (ties count as set — deterministic).
    A steady shot collapses to its frame dHash; cuts average out.
    Integer-exact and sample-stable for the planted-oracle contract."""
    frames = decode_ppmv_frames(payload, every=every, limit=limit)
    if not frames:
        raise UnsupportedMediaError("video has no frames")
    sigs = [dhash64(f) for f in frames]
    # fixed big-endian bit layout across platforms
    be = np.frombuffer(
        b"".join(s.to_bytes(8, "big") for s in sigs), np.uint8
    ).reshape(len(sigs), 8)
    bits = np.unpackbits(be, axis=1)
    maj = (2 * bits.sum(axis=0)) >= len(sigs)
    return int.from_bytes(np.packbits(maj).tobytes(), "big")


class VideoFingerprintStage:
    """Actor-pool stage: PPMV payloads -> 64-bit majority dHash as
    int64 (same policy contract as the image/audio stages)."""

    def __init__(self, on_unknown: str = "skip", every: int = 2):
        if on_unknown not in ("skip", "error"):
            raise ValueError("on_unknown must be 'skip' or 'error'")
        self.on_unknown = on_unknown
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, sigs = [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            try:
                if sniff_media(payload or b"") != "ppmv":
                    raise UnsupportedMediaError("not ppmv")
                sig = video_fingerprint64(payload, every=self.every)
            except (UnsupportedMediaError, ValueError, _struct.error):
                if self.on_unknown == "error":
                    raise
                continue
            ids.append(mid)
            sigs.append(np.uint64(sig).astype(np.int64))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sig": pa.array(np.array(sigs, dtype=np.int64), pa.int64()),
            }
        )


def video_fingerprint_dedup(
    ds,
    id_col: str = "media_id",
    max_hamming: int = 3,
    batch_size: int = 32,
    concurrency=2,
    on_unknown: str = "skip",
    every: int = 2,
):
    """Perceptual video near-dup clustering: majority frame-dHash per
    decodable PPMV (actor pool, frame-sampled decode), then the banded
    hamming<=3 closure (stages/dedup.py::hamming_cluster_64). Returns
    Dataset[(id_col, cluster_id)]; the shuffle moves 8 bytes per video,
    never frames."""
    from .dedup import hamming_cluster_64

    sigs = ds.map_batches(
        VideoFingerprintStage,
        fn_constructor_kwargs=dict(on_unknown=on_unknown, every=every),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if id_col != "media_id":
        sigs = sigs.rename_columns({"media_id": id_col})
    sigs = sigs.materialize()
    return hamming_cluster_64(
        sigs, sigs.select_columns([id_col]), id_col, max_hamming
    )
