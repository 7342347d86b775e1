"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(``media_type``, ``width``, ``height``, ``duration_ms``). The Ray-side
plumbing — schema, batch sizing for wide binary rows, actor-pool stage
shape, output layout — is real and tested; the actual codec work is
STUBBED (the sandbox has no image/audio libraries): ``decode=fake``
produces deterministic pseudo-features from the bytes, ``decode=real``
raises NotImplementedError at construction.

Scale note: binary rows are wide — callers should pass a SMALL
``batch_size`` (e.g. 32) and let ``DataContext.target_max_block_size``
keep blocks bounded rather than splitting payloads.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pyarrow as pa

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

    requires: ``payload``, ``media_type`` — attaches: ``features``
    (list<float32> of FEATURE_DIM), ``payload_bytes`` (int64).
    """

    def __init__(self, decode: str = "fake"):
        if decode == "real":
            raise NotImplementedError(
                "real media decoding requires image/audio codecs not present "
                "in this environment; wire Pillow/torchaudio here and keep "
                "the same batch contract"
            )
        assert decode == "fake"

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

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = [self._fake_features(p) for p in payloads]
        sizes = [len(p or b"") for p in payloads]
        batch = batch.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )
        batch = batch.append_column("payload_bytes", pa.array(sizes, pa.int64()))
        return batch


def synthetic_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.RandomState(seed)
    types = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width", "height", "duration_ms")}
    for i in range(n):
        t = types[i % 3]
        size = int(rng.randint(64, 4096))
        rows["media_id"].append(i)
        rows["media_type"].append(t)
        rows["payload"].append(rng.bytes(size))
        rows["width"].append(int(rng.randint(16, 1920)) if t != "audio" else 0)
        rows["height"].append(int(rng.randint(16, 1080)) if t != "audio" else 0)
        rows["duration_ms"].append(int(rng.randint(100, 60000)) if t != "image" else 0)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
