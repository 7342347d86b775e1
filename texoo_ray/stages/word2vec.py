"""Word-embedding matrix encoder: the reference's Word2Vec/FastText load
path re-expressed for Ray actors.

Mirrors the observable contract of Word2VecEncoder.java:
- load a word->vector matrix from disk once (here: parquet written by the
  engine itself; the reference reads word2vec text/binary formats,
  Word2VecEncoder.java:97-145),
- ``encode(word_or_phrase)``: per-word preprocessed lookup; a phrase is
  the SUM of known-word vectors divided by the TOTAL word count (unknown
  words contribute zeros but still count — Word2VecEncoder.java:276-288),
- OOV single word -> zero vector (":276 'Returns nullvector if word was
  not found'"), ``is_unknown`` (:255-257).

Ray mapping: the matrix loads once per ACTOR in ``__init__`` (constructor
argument = path, not the matrix — nothing heavy is pickled per batch);
stages hold the encoder and stay pure per-batch functions. The matrix
itself is built distributed (``build_word_vectors``: vocab aggregation ->
deterministic per-word vectors -> parquet), so the whole path — train,
persist, reload in an actor pool — exercises the real plumbing even
though the vectors are hashed-ngram stand-ins rather than SGD-trained.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..core.features import hashed_ngram_vector

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_SPACES_RE = re.compile(r"\s+")


def preprocess(word: str) -> str:
    """MinimalLowercasePreprocessor analogue (the reference's default
    token preprocessor for index lookups)."""
    return (word or "").strip().lower()


def build_word_vectors(
    ds,
    out_path: str,
    text_col: str = "text",
    dim: int = 64,
    min_freq: int = 1,
    max_size: int = 100_000,
) -> str:
    """Distributed build of a (word, vector) parquet: per-batch partial
    counts -> groupby(word).sum -> top-N -> deterministic vector per word.

    The vocab aggregation is the same shuffle shape as build_vocab
    (one row per distinct word per block); vector synthesis is a cheap
    driver-side pass over the final (small) vocab table."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Dict[str, int] = {}
        for t in batch[text_col].to_pylist():
            for w in _WORD_RE.findall((t or "").lower()):
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
    words = [w for w, c in zip(top["word"], top["cnt"]) if c >= min_freq]
    mat = np.stack([hashed_ngram_vector(w, dim) for w in words]) if words else np.zeros((0, dim), np.float32)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = (mat / np.maximum(norms, 1e-12)).astype(np.float32)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    tbl = pa.table(
        {
            "word": pa.array(words, pa.string()),
            "vector": pa.array([v.tolist() for v in mat], pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, out_path)
    return out_path


class Word2VecEncoder:
    """Embedding-matrix encoder loaded from a (word, vector) parquet.

    Load in actor ``__init__`` (once per actor process); lookups are O(1)
    dict probes into a contiguous float32 matrix."""

    def __init__(self, path: str):
        tbl = pq.read_table(path)
        words = tbl["word"].to_pylist()
        vecs = tbl["vector"]
        if len(words):
            flat = np.asarray(vecs.combine_chunks().values, dtype=np.float32)
            self.dim = flat.size // len(words)
            self.matrix = flat.reshape(len(words), self.dim)
        else:
            self.dim = 0
            self.matrix = np.zeros((0, 0), np.float32)
        self.index: Dict[str, int] = {w: i for i, w in enumerate(words)}
        self.path = path

    def is_unknown(self, word: str) -> bool:
        return preprocess(word) not in self.index

    def encode_word(self, word: str) -> np.ndarray:
        i = self.index.get(preprocess(word))
        if i is None:
            return np.zeros(self.dim, dtype=np.float32)
        return self.matrix[i]

    def encode(self, text: str) -> np.ndarray:
        """Mean over space-split words; unknown words count toward the
        divisor with zero contribution (Word2VecEncoder.java:276-288)."""
        out = np.zeros(self.dim, dtype=np.float32)
        n = 0
        for w in _SPACES_RE.split(text or ""):
            if not w.strip():
                continue
            i = self.index.get(preprocess(w))
            if i is not None:
                out += self.matrix[i]
            n += 1
        return out if n == 0 else out / n

    def sentence_vector(self, token_texts: Sequence[str]) -> np.ndarray:
        """Per-sentence embedding from token texts (the SECTOR input)."""
        out = np.zeros(self.dim, dtype=np.float32)
        n = 0
        for t in token_texts:
            if not t or not t.strip():
                continue
            i = self.index.get(preprocess(t))
            if i is not None:
                out += self.matrix[i]
            n += 1
        if n:
            out /= n
        norm = float(np.linalg.norm(out))
        return out / norm if norm > 0 else out

    def nearest(self, word: str, k: int = 10) -> List[str]:
        """Brute-force cosine neighbours over the matrix
        (Word2VecEncoder.java:289-301 wordsNearest)."""
        v = self.encode_word(word)
        norm = float(np.linalg.norm(v))
        if norm == 0 or not len(self.matrix):
            return []
        sims = self.matrix @ (v / norm)
        order = np.argsort(-sims)
        words = list(self.index.keys())
        out = []
        for i in order:
            if words[i] != preprocess(word):
                out.append(words[i])
            if len(out) >= k:
                break
        return out


class FastTextEncoder(Word2VecEncoder):
    """FastText-semantics encoder: OOV words are COMPOSED from subword
    character n-grams instead of returning the null vector.

    Mirrors FastTextEncoder.java:160-174 (getWordVector delegates to
    fastText, which sums subword n-gram vectors for OOV words;
    ``isUnknown`` is true only for words that produce an all-zero
    vector). Subword inventory follows the fastText paper: the word is
    boundary-marked as ``<word>`` and n-grams with n in [minn, maxn]
    (defaults 3..6) are hashed; each gram's vector is the engine's
    deterministic hashed-ngram stand-in, unit-normalized after the mean
    like the known-word matrix rows."""

    def __init__(self, path: str, minn: int = 3, maxn: int = 6):
        super().__init__(path)
        self.minn = minn
        self.maxn = maxn

    def _subword_vector(self, word: str) -> np.ndarray:
        marked = "<%s>" % word
        out = np.zeros(self.dim, dtype=np.float32)
        n_grams = 0
        for n in range(self.minn, self.maxn + 1):
            if len(marked) < n:
                break
            for i in range(len(marked) - n + 1):
                out += hashed_ngram_vector(marked[i : i + n], self.dim)
                n_grams += 1
        if n_grams:
            out /= n_grams
        norm = float(np.linalg.norm(out))
        return out / norm if norm > 0 else out

    def encode_word(self, word: str) -> np.ndarray:
        w = preprocess(word)
        i = self.index.get(w)
        if i is not None:
            return self.matrix[i]
        if not w:
            return np.zeros(self.dim, dtype=np.float32)
        return self._subword_vector(w)

    def is_unknown(self, word: str) -> bool:
        """FastTextEncoder.java:171-174: unknown iff the produced vector
        is the null vector."""
        return float(np.linalg.norm(self.encode_word(word))) == 0.0

    def sentence_vector(self, token_texts: Sequence[str]) -> np.ndarray:
        out = np.zeros(self.dim, dtype=np.float32)
        n = 0
        for t in token_texts:
            if not t or not t.strip():
                continue
            out += self.encode_word(t)
            n += 1
        if n:
            out /= n
        norm = float(np.linalg.norm(out))
        return out / norm if norm > 0 else out


class Word2VecEmbedStage:
    """requires: ``tokens`` — attaches: ``turn_embedding`` (list<float>).

    Actor-pool stage: matrix loads once per actor from ``path``; per batch
    it mean-pools token vectors per turn. Pass to
    ``map_batches(Word2VecEmbedStage, fn_constructor_kwargs=dict(path=...),
    concurrency=N)``."""

    def __init__(self, path: str, tokens_col: str = "tokens"):
        self.enc = Word2VecEncoder(path)
        self.tokens_col = tokens_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = []
        for toks in batch[self.tokens_col].to_pylist():
            texts = [t["text"] for t in (toks or [])]
            vecs.append(self.enc.sentence_vector(texts).tolist())
        if "turn_embedding" in batch.column_names:
            batch = batch.drop_columns(["turn_embedding"])
        return batch.append_column(
            "turn_embedding", pa.array(vecs, pa.list_(pa.float32()))
        )
