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


def _count_re(text: pa.ChunkedArray | pa.Array, pattern: str) -> pa.Array:
    return pc.cast(pc.count_substring_regex(text, pattern), pa.int64())


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """attaches: n_chars_q, n_words, n_digits, n_upper, n_alpha, alpha_ratio.

    Counts use ASCII classes so the DuckDB oracle (regexp_replace with the
    same classes) is bit-identical. Fully vectorized in pyarrow.compute —
    no Python row loop (single-char classes: match count == char count;
    word count = non-overlapping ``\\S+`` matches == len(str.split())).
    """
    text = pc.fill_null(batch[text_col], "")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_words = _count_re(text, r"\S+")
    n_digits = _count_re(text, "[0-9]")
    n_upper = _count_re(text, "[A-Z]")
    n_alpha = _count_re(text, "[A-Za-z]")
    def _np(a):
        return (
            a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        ).to_numpy(zero_copy_only=False)

    alpha_ratio = _np(n_alpha).astype(np.float64) / np.maximum(_np(n_chars), 1)
    batch = batch.append_column("n_chars_q", n_chars)
    batch = batch.append_column("n_words", n_words)
    batch = batch.append_column("n_digits", n_digits)
    batch = batch.append_column("n_upper", n_upper)
    batch = batch.append_column("n_alpha", n_alpha)
    batch = batch.append_column("alpha_ratio", pa.array(alpha_ratio))
    return batch


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """attaches: n_ws_tokens (whitespace), n_bpe_tokens (BPE-ish regex).
    Vectorized: both counts are non-overlapping regex match counts."""
    text = pc.fill_null(batch[text_col], "")
    batch = batch.append_column("n_ws_tokens", _count_re(text, r"\S+"))
    batch = batch.append_column("n_bpe_tokens", _count_re(text, BPE_TOKEN_SQL))
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
