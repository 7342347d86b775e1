"""Trainable lookup encoders: bag-of-words vocabulary and Bloom filter.

Mirrors BagOfWordsEncoder.java:64-118 (preprocess -> stopword filter ->
count -> truncate by min frequency) and BloomEncoder.java:29-76 /
BitArrayBloomFilter (4096 bits, 5 hashes, bitwise-OR mergeable).

Vocab building is the distributed aggregation (flat tokens -> per-batch
partial counts -> groupby(word).sum -> top-N collected to the driver and
broadcast); the built encoder is tiny and ships to actors whole.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np
import pyarrow as pa

from ..core.stopwords import STOPWORDS_EN

_WORD_RE = re.compile(r"\w+", re.UNICODE)

BLOOM_BITS = 4096
BLOOM_HASHES = 5


def build_vocab(
    ds,
    text_col: str = "text",
    min_freq: int = 1,
    max_size: int = 50_000,
    skip_stopwords: bool = True,
) -> List[str]:
    """Distributed vocabulary build -> ordered word list (count desc, word asc)."""
    from ray.data.aggregate import Sum

    stop = STOPWORDS_EN if skip_stopwords else frozenset()

    def partial(batch: pa.Table) -> pa.Table:
        counts: Dict[str, int] = {}
        for t in batch[text_col].to_pylist():
            for w in _WORD_RE.findall((t or "").lower()):
                if w not in stop:
                    counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "word": pa.array(list(counts.keys()), pa.string()),
                "cnt": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    top = agg.sort(["cnt", "word"], descending=[True, False]).limit(max_size).to_pandas()
    return [w for w, c in zip(top["word"], top["cnt"]) if c >= min_freq]


_ASCII_WORD_RE = re.compile(r"[a-z0-9]+")


def build_ngram_vocab(
    ds,
    n: int = 2,
    text_col: str = "text",
    top_k: int = 50,
):
    """Word n-gram vocabulary build (the SURVEY §2.7 n-gram vocab row,
    cf. LetterNGramEncoder's trainModel counting loop generalized to word
    n-grams): per-batch partial counts of space-joined lowercase word
    n-grams -> ``groupby(ngram).sum`` -> global top-k. The shuffle moves
    one row per distinct n-gram per block; the result is top_k rows.
    Returns Dataset[(ngram, cnt)] ordered (cnt desc, ngram asc)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Dict[str, int] = {}
        for t in batch[text_col].to_pylist():
            words = _ASCII_WORD_RE.findall((t or "").lower())
            for i in range(len(words) - n + 1):
                g = " ".join(words[i : i + n])
                counts[g] = counts.get(g, 0) + 1
        return pa.table(
            {
                "ngram": pa.array(list(counts.keys()), pa.string()),
                "cnt": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return agg.sort(["cnt", "ngram"], descending=[True, False]).limit(top_k)


class BagOfWordsEncoder:
    """vocab -> index map; encode(words) = count vector over the vocab."""

    def __init__(self, vocab: Sequence[str]):
        self.vocab = list(vocab)
        self.index = {w: i for i, w in enumerate(self.vocab)}

    def encode(self, text: str) -> np.ndarray:
        v = np.zeros(len(self.vocab), dtype=np.float32)
        for w in _WORD_RE.findall((text or "").lower()):
            i = self.index.get(w)
            if i is not None:
                v[i] += 1.0
        return v

    def is_unknown(self, word: str) -> bool:
        return word.lower() not in self.index


def _bloom_positions(word: str, bits: int = BLOOM_BITS, hashes: int = BLOOM_HASHES) -> List[int]:
    """k positions via double hashing (Kirsch-Mitzenmacher, the standard
    public construction used by Guava-style blooms)."""
    d = hashlib.blake2b(word.encode("utf-8"), digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [((h1 + i * h2) % (1 << 61)) % bits for i in range(hashes)]


class BloomFilter:
    """Fixed-size bit-array Bloom filter; merge = bitwise OR."""

    def __init__(self, bits: int = BLOOM_BITS, hashes: int = BLOOM_HASHES, array: Optional[np.ndarray] = None):
        self.bits = bits
        self.hashes = hashes
        self.arr = array if array is not None else np.zeros(bits // 64, dtype=np.uint64)

    def add(self, word: str) -> None:
        for p in _bloom_positions(word, self.bits, self.hashes):
            self.arr[p >> 6] |= np.uint64(1) << np.uint64(p & 63)

    def __contains__(self, word: str) -> bool:
        one = np.uint64(1)
        for p in _bloom_positions(word, self.bits, self.hashes):
            if not (self.arr[p >> 6] >> np.uint64(p & 63)) & one:
                return False
        return True

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        return BloomFilter(self.bits, self.hashes, self.arr | other.arr)

    def to_bytes(self) -> bytes:
        return self.arr.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, bits: int = BLOOM_BITS, hashes: int = BLOOM_HASHES):
        return cls(bits, hashes, np.frombuffer(data, dtype=np.uint64).copy())

    def encode(self, text: str) -> np.ndarray:
        """Per-word membership-bit vector (BloomEncoder.encode analogue):
        OR of the k positions for each word of ``text``."""
        v = np.zeros(self.bits, dtype=np.float32)
        for w in _WORD_RE.findall((text or "").lower()):
            for p in _bloom_positions(w, self.bits, self.hashes):
                v[p] = 1.0
        return v


def build_bloom(
    ds, text_col: str = "text", bits: int = BLOOM_BITS, hashes: int = BLOOM_HASHES
) -> BloomFilter:
    """Distributed Bloom build: one partial filter per batch (bitwise-OR
    mergeable sketch), OR-merged in a tiny final step."""

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(bits, hashes)
        for t in batch[text_col].to_pylist():
            for w in _WORD_RE.findall((t or "").lower()):
                bf.add(w)
        return pa.table({"bloom": pa.array([bf.to_bytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out = BloomFilter(bits, hashes)
    for row in parts:
        out = out.merge(BloomFilter.from_bytes(row["bloom"], bits, hashes))
    return out
