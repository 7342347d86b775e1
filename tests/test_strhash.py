"""Unit tests for the vectorized string hash (core/strhash.py)."""

import numpy as np
import pyarrow as pa

from texoo_ray.core.strhash import utf8_hash64


def _ref_fnv(s: bytes, basis: int, prime: int) -> int:
    h = basis
    for b in s:
        h = ((h * prime) & 0xFFFFFFFFFFFFFFFF) ^ b
    return h


def test_matches_scalar_fnv_reference():
    words = ["hello", "", "wörld", "a", "x" * 300, "tab\tsep"]
    h = utf8_hash64(pa.array(words))
    basis, prime = 14695981039346656037, 1099511628211
    for w, got in zip(words, h):
        assert int(got) == _ref_fnv(w.encode("utf-8"), basis, prime)


def test_null_hashes_like_empty():
    h = utf8_hash64(pa.array(["", None, "x"]))
    assert h[0] == h[1] and h[0] != h[2]


def test_sliced_and_chunked_views():
    a = pa.array(["aa", "bb", "cc", "dd", "ee"])
    full = utf8_hash64(a)
    assert (utf8_hash64(a.slice(1, 3)) == full[1:4]).all()
    ca = pa.chunked_array([a.slice(0, 2), a.slice(2)])
    assert (utf8_hash64(ca) == full).all()


def test_seeds_are_independent():
    a = pa.array(["one", "two", "three"])
    h0, h1 = utf8_hash64(a, seed=0), utf8_hash64(a, seed=1)
    assert (h0 != h1).all()


def test_no_collisions_on_ascii_vocab():
    import random
    import string

    rng = random.Random(3)
    words = list(
        {
            "".join(rng.choice(string.ascii_letters) for _ in range(rng.randrange(1, 12)))
            for _ in range(50_000)
        }
    )
    h = utf8_hash64(pa.array(words))
    assert len(np.unique(h)) == len(words)


def test_empty_array():
    assert len(utf8_hash64(pa.array([], pa.string()))) == 0
