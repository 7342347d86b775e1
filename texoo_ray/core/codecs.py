"""Pure-stdlib media codecs + feature extraction (no external libraries).

Real decode paths for the formats the Python standard library + numpy can
handle bit-exactly:

- WAV (RIFF PCM, 16-bit) via the stdlib ``wave`` module.
- PPM (P6 binary) — full parse incl. comments and maxval.
- BMP (24-bit uncompressed, BITMAPINFOHEADER) — struct parse with
  bottom-up row order, BGR channel order and 4-byte row padding.
- "PPMV": a trivial video container for the synthetic corpus — magic
  ``PPMV`` + uint32 frame count + concatenated P6 frames. Frame sampling
  decodes every k-th frame only (the plumbing a real container demuxer
  would use).

Feature extraction is real signal/image processing in numpy: per-channel
moments + luminance histogram for images; RMS, zero-crossing rate,
spectral centroid and an 8-band FFT power profile for audio.

Formats outside this set raise ``UnsupportedMediaError`` — the honest
boundary where Pillow/torchaudio would plug in.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import List, Tuple

import numpy as np


class UnsupportedMediaError(ValueError):
    pass


# --- WAV -------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Mono/stereo int16 PCM -> RIFF WAV bytes."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    s = np.clip(s, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """RIFF WAV -> (samples [n, channels] int16, sample_rate)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise UnsupportedMediaError(
                    "only 16-bit PCM WAV supported, got %d-byte samples"
                    % w.getsampwidth()
                )
            n = w.getnframes()
            raw = w.readframes(n)
            rate = w.getframerate()
            ch = w.getnchannels()
    except wave.Error as e:
        raise UnsupportedMediaError("bad WAV: %s" % e) from e
    return np.frombuffer(raw, dtype="<i2").reshape(-1, ch), rate


# --- PPM (P6) --------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _ppm_token(buf: memoryview, pos: int) -> Tuple[bytes, int]:
    # skip whitespace and '#' comments
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            while pos < n and buf[pos] != ord("\n"):
                pos += 1
        else:
            break
    start = pos
    while pos < n and buf[pos] not in b" \t\r\n":
        pos += 1
    return bytes(buf[start:pos]), pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 -> (h, w, 3) uint8."""
    if payload[:2] != b"P6":
        raise UnsupportedMediaError("not a P6 PPM")
    mv = memoryview(payload)
    pos = 2
    vals: List[int] = []
    for _ in range(3):
        tok, pos = _ppm_token(mv, pos)
        vals.append(int(tok))
    w, h, maxval = vals
    if maxval != 255:
        raise UnsupportedMediaError("only maxval=255 PPM supported")
    pos += 1  # single whitespace after maxval
    data = np.frombuffer(mv, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


# --- BMP (24-bit uncompressed) ---------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BMP."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    row = w * 3
    pad = (-row) % 4
    body = io.BytesIO()
    for y in range(h - 1, -1, -1):
        body.write(img[y, :, ::-1].tobytes())  # RGB -> BGR
        body.write(b"\x00" * pad)
    data = body.getvalue()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB (handles bottom-up
    and top-down row order, 4-byte padding)."""
    if payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise UnsupportedMediaError("BITMAPCOREHEADER not supported")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise UnsupportedMediaError("only 24-bit uncompressed BMP supported")
    h = abs(h_raw)
    row = w * 3
    stride = row + ((-row) % 4)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        y = (h - 1 - i) if h_raw > 0 else i  # bottom-up vs top-down
        off = data_offset + i * stride
        out[y] = np.frombuffer(payload, np.uint8, count=row, offset=off).reshape(
            w, 3
        )[:, ::-1]
    return out


# --- PPMV (synthetic video container) --------------------------------------


def encode_ppmv(frames: List[np.ndarray]) -> bytes:
    """Frames [(h,w,3) uint8] -> PPMV container."""
    out = io.BytesIO()
    out.write(b"PPMV")
    out.write(struct.pack("<I", len(frames)))
    for f in frames:
        p = encode_ppm(f)
        out.write(struct.pack("<I", len(p)))
        out.write(p)
    return out.getvalue()


def decode_ppmv_frames(
    payload: bytes, every: int = 1, limit: int = 0
) -> List[np.ndarray]:
    """Frame-sampled decode: parse the index, decode every ``every``-th
    frame (others are skipped without decoding — the point of frame
    sampling)."""
    if payload[:4] != b"PPMV":
        raise UnsupportedMediaError("not a PPMV container")
    n = struct.unpack_from("<I", payload, 4)[0]
    pos = 8
    frames = []
    for i in range(n):
        (size,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if i % max(1, every) == 0:
            frames.append(decode_ppm(payload[pos : pos + size]))
            if limit and len(frames) >= limit:
                break
        pos += size
    return frames


# --- transforms / features -------------------------------------------------


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbour resize, pure numpy indexing."""
    sh, sw = img.shape[:2]
    ys = (np.arange(h) * (sh / h)).astype(np.int64).clip(0, sh - 1)
    xs = (np.arange(w) * (sw / w)).astype(np.int64).clip(0, sw - 1)
    return img[ys[:, None], xs[None, :]]


def image_features(img: np.ndarray, dim: int = 32) -> np.ndarray:
    """Real image stats: dims, per-channel mean/std, 8-bin luminance
    histogram, edge energy — padded/truncated to ``dim``."""
    f = np.asarray(img, dtype=np.float64)
    lum = f.mean(axis=2)
    hist = np.histogram(lum, bins=8, range=(0, 255))[0] / max(lum.size, 1)
    gy = np.abs(np.diff(lum, axis=0)).mean() if lum.shape[0] > 1 else 0.0
    gx = np.abs(np.diff(lum, axis=1)).mean() if lum.shape[1] > 1 else 0.0
    feats = np.concatenate(
        [
            [img.shape[1], img.shape[0]],
            f.mean(axis=(0, 1)) / 255.0,
            f.std(axis=(0, 1)) / 255.0,
            hist,
            [gx / 255.0, gy / 255.0],
        ]
    )
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, feats.size)] = feats[:dim]
    return out


def audio_features(samples: np.ndarray, rate: int, dim: int = 32) -> np.ndarray:
    """Real audio stats: duration, RMS, zero-crossing rate, spectral
    centroid, 8-band FFT power profile — padded/truncated to ``dim``."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    n = mono.size
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    x = mono / 32768.0
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    centroid = float((freqs * spec).sum() / spec.sum()) if spec.sum() > 0 else 0.0
    bands = np.array_split(spec, 8)
    band_power = np.array([b.mean() if b.size else 0.0 for b in bands])
    total = band_power.sum()
    band_profile = band_power / total if total > 0 else band_power
    feats = np.concatenate(
        [[n / rate, rms, zcr, centroid / max(rate / 2.0, 1.0)], band_profile]
    )
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, feats.size)] = feats[:dim]
    return out


def sniff_media(payload: bytes) -> str:
    """Magic-byte container sniffing."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"PPMV":
        return "ppmv"
    return "unknown"
