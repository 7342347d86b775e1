"""Vectorized 64-bit string hashing over Arrow string arrays.

FNV-1-style polynomial over raw UTF-8 bytes, computed column-at-a-time:
the outer loop runs over BYTE POSITIONS (bounded by the longest string),
each iteration a masked numpy update over every string — so hashing a
100k-word batch dictionary costs ~max_len vector ops instead of 100k
Python-level hashlib calls (the per-word md5 loop this replaces was the
only Python loop left in the n-gram overlap partials).

Used for internal gram/word identities only (dedup keys, membership
probes) — never where an oracle compares hash VALUES (those stay md5,
e.g. hash_split / stratified sampling, whose DuckDB oracles recompute
md5(text) in SQL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_PRIME = np.uint64(1099511628211)
_BASIS_A = np.uint64(14695981039346656037)
# independent second stream for 128-bit-equivalent pairing
_PRIME_B = np.uint64(0x9E3779B97F4A7C15)
_BASIS_B = np.uint64(0xC2B2AE3D27D4EB4F)


def _flat_utf8(arr) -> tuple[np.ndarray, np.ndarray]:
    """(byte offsets int64 [n+1], data uint8) views of a string array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.offset != 0:
        # normalize the slice so buffer views start at element 0
        arr = pa.concat_arrays([arr])
    if isinstance(arr, pa.LargeStringArray):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    off = np.frombuffer(buffers[1], off_dtype)[: len(arr) + 1].astype(np.int64)
    data = (
        np.frombuffer(buffers[2], np.uint8)
        if buffers[2] is not None
        else np.zeros(0, np.uint8)
    )
    return off, data


def utf8_hash64(arr, seed: int = 0) -> np.ndarray:
    """One uint64 FNV-1 hash per string (nulls hash like empty strings).

    ``seed`` selects an independent (basis, prime) stream; pass 0 and 1
    to build a 128-bit-equivalent pair.
    """
    basis, prime = ((_BASIS_A, _FNV_PRIME), (_BASIS_B, _PRIME_B))[seed]
    off, data = _flat_utf8(arr)
    n = len(off) - 1
    h = np.full(n, basis, np.uint64)
    if n == 0:
        return h
    starts = off[:-1]
    lens = off[1:] - starts
    max_len = int(lens.max()) if n else 0
    err = np.seterr(over="ignore")
    try:
        for j in range(max_len):
            m = lens > j
            hm = h[m]
            h[m] = (hm * prime) ^ data[starts[m] + j]
    finally:
        np.seterr(**err)
    return h
