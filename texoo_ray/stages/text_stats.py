"""Text analysis stages: quality scoring, token counting, fingerprinting,
language id — vectorized ``map_batches`` transforms over a documents table.

These are the training-data-pipeline operators the reference lacks but a
10^12-turn corpus needs (task brief); implemented as stateless Arrow
transforms with partial-aggregate-friendly integer outputs.
"""

from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.langid import detect_language

_DIGIT_RE = re.compile(r"[0-9]")
_UPPER_RE = re.compile(r"[A-Z]")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_WS_RUN_RE = re.compile(r"\s+")
# BPE-ish pre-tokenization: alnum runs or single non-space symbols
BPE_TOKEN_RE = re.compile(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]")
BPE_TOKEN_SQL = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """attaches: n_chars_q, n_words, n_digits, n_upper, n_alpha, alpha_ratio.

    Counts use ASCII classes so the DuckDB oracle (regexp_replace with the
    same classes) is bit-identical.
    """
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    n_words = np.empty(n, dtype=np.int64)
    n_digits = np.empty(n, dtype=np.int64)
    n_upper = np.empty(n, dtype=np.int64)
    n_alpha = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        n_words[i] = len(t.split())
        n_digits[i] = len(_DIGIT_RE.findall(t))
        n_upper[i] = len(_UPPER_RE.findall(t))
        n_alpha[i] = len(_ALPHA_RE.findall(t))
    alpha_ratio = n_alpha / np.maximum(n_chars, 1)
    batch = batch.append_column("n_chars_q", pa.array(n_chars))
    batch = batch.append_column("n_words", pa.array(n_words))
    batch = batch.append_column("n_digits", pa.array(n_digits))
    batch = batch.append_column("n_upper", pa.array(n_upper))
    batch = batch.append_column("n_alpha", pa.array(n_alpha))
    batch = batch.append_column("alpha_ratio", pa.array(alpha_ratio))
    return batch


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """attaches: n_ws_tokens (whitespace), n_bpe_tokens (BPE-ish regex)."""
    texts = batch[text_col].to_pylist()
    ws = pa.array([len((t or "").split()) for t in texts], pa.int64())
    bpe = pa.array([len(BPE_TOKEN_RE.findall(t or "")) for t in texts], pa.int64())
    batch = batch.append_column("n_ws_tokens", ws)
    batch = batch.append_column("n_bpe_tokens", bpe)
    return batch


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """attaches: fingerprint = md5 of the whitespace-normalized, lowercased
    text (document fingerprinting; DuckDB-reproducible)."""
    texts = batch[text_col].to_pylist()
    fps = [
        hashlib.md5(_WS_RUN_RE.sub(" ", (t or "").lower()).encode("utf-8")).hexdigest()
        for t in texts
    ]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def content_hash(batch: pa.Table, text_col: str = "text", col: str = "text_hash") -> pa.Table:
    """attaches: 16-byte blake2b hex digest of the exact text (exact-dedup key)."""
    texts = batch[text_col].to_pylist()
    hs = [
        hashlib.blake2b((t or "").encode("utf-8"), digest_size=16).hexdigest()
        for t in texts
    ]
    return batch.append_column(col, pa.array(hs, pa.string()))


def language_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """attaches: pred_lang (heuristic n-gram/stopword detector)."""
    texts = batch[text_col].to_pylist()
    return batch.append_column(
        "pred_lang", pa.array([detect_language(t or "") for t in texts], pa.string())
    )
