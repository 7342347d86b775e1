"""Deterministic token/sentence feature extraction.

Surface features mirror SurfaceEncoder.java:60-82 (11 booleans),
structure features mirror StructureEncoder.java:85-155, letter n-grams
mirror LetterNGramEncoder.java:59-110 (``#word#`` character n-grams with a
hashing trick instead of a trained vocab). These feed the deterministic
feature tagger (stages.tagger) and the SECTOR-style sentence embeddings
(core.sections).
"""

from __future__ import annotations

import re
import zlib
from typing import List, Sequence

import numpy as np

from .spans import Sentence, Token

_PUNCT_START_RE = re.compile(r"^[^\w\s]", re.UNICODE)
_PUNCT_END_RE = re.compile(r"[^\w\s]$", re.UNICODE)

SURFACE_DIM = 11
STRUCTURE_DIM = 7


def surface_features(token: str) -> np.ndarray:
    """11 surface-form booleans (SurfaceEncoder.java:60-82)."""
    t = token.strip()
    has_alpha = any(c.isalpha() for c in t)
    starts_upper = bool(t) and t[0].isupper()
    starts_lower = bool(t) and t[0].islower()
    all_upper = has_alpha and t.isupper()
    all_lower = has_alpha and t.islower()
    mixed = has_alpha and not all_upper and not all_lower
    all_num = bool(t) and t.isdigit()
    inc_num = any(c.isdigit() for c in t)
    starts_num = bool(t) and t[0].isdigit()
    ends_num = bool(t) and t[-1].isdigit()
    starts_punct = bool(_PUNCT_START_RE.match(t))
    ends_punct = bool(_PUNCT_END_RE.search(t))
    return np.array(
        [
            starts_upper, starts_lower, all_upper, all_lower, mixed, all_num,
            inc_num, starts_num, ends_num, starts_punct, ends_punct,
        ],
        dtype=np.float32,
    )


def _is_nl(text: str) -> bool:
    return text == "\n" or text == "*NL*"


def structure_features_tokens(sentences: Sequence[Sentence]) -> np.ndarray:
    """Per-token [beginDoc, beginPar, isList, beginSent, endSent, endPar,
    endDoc] (StructureEncoder.encodeTokens, :114-141)."""
    rows: List[np.ndarray] = []
    begin_doc = True
    last_was_nl = True
    n_sent = len(sentences)
    for si, s in enumerate(sentences):
        end_doc = si == n_sent - 1
        begin_sent = True
        toks = s.tokens
        for i, t in enumerate(toks):
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            end_sent = nxt is None
            is_list = begin_sent and t.text == "-"
            is_nl = _is_nl(t.text)
            is_next_nl = nxt is not None and _is_nl(nxt.text)
            rows.append(
                np.array(
                    [
                        begin_doc and begin_sent,
                        last_was_nl and begin_sent,
                        is_list,
                        begin_sent,
                        (end_sent and not is_nl) or is_next_nl,
                        is_nl or (end_doc and end_sent),
                        end_doc and end_sent,
                    ],
                    dtype=np.float32,
                )
            )
            begin_sent = False
            last_was_nl = is_nl
        begin_doc = False
    if not rows:
        return np.zeros((0, STRUCTURE_DIM), dtype=np.float32)
    return np.stack(rows)


def structure_features_sentences(sentences: Sequence[Sentence]) -> np.ndarray:
    """Per-sentence structure vector (StructureEncoder.encodeSentences,
    :143-155): [beginDoc, beginPar, 0, 0, endPar, endDoc, isList]."""
    rows: List[np.ndarray] = []
    begin_doc = True
    begin_par = True
    n = len(sentences)
    for si, s in enumerate(sentences):
        end_doc = si == n - 1
        end_par = any(_is_nl(t.text) for t in s.tokens)
        is_list = s.text().startswith("- ")
        rows.append(
            np.array(
                [
                    begin_doc,
                    begin_par or begin_doc,
                    False,
                    False,
                    end_par or end_doc,
                    end_doc,
                    is_list,
                ],
                dtype=np.float32,
            )
        )
        begin_doc = False
        begin_par = end_par
    if not rows:
        return np.zeros((0, STRUCTURE_DIM), dtype=np.float32)
    return np.stack(rows)


CHAR_CLASS_DIM = 11

_SYMBOLS = frozenset(["#", "$", "%", "@", "^", "_", "~", "¢", "£", "¥", "§", "€"])
_OPERATORS = frozenset(["&", "*", "+", "="])
_OPEN_QUOTES = frozenset(['"', "`", "``"])
_CLOSE_QUOTES = frozenset(["'", "''"])
_OPEN_PARENS = frozenset(["(", "<", "[", "{", "-LRB-"])
_CLOSE_PARENS = frozenset([")", ">", "]", "}", "-RRB-"])
_SLASHES = frozenset(["/", "\\", "|"])
_DASHES = frozenset(["-", "–", "--", "---"])
_TERMINATORS = frozenset([".", "!", "?"])
_COLONS = frozenset([":", ";", "..."])


def char_class_features(token: str) -> np.ndarray:
    """11 punctuation-class booleans (CharClassEncoder.java:52-131:
    symbol, operator, open/close quote, open/close paren, slash, comma,
    dash, sentence terminator, colon). The reference's quote predicates
    accidentally test the symbol set (:88-97); we implement the evident
    intent (the quote sets)."""
    t = token.strip()
    return np.array(
        [
            t in _SYMBOLS,
            t in _OPERATORS,
            t in _OPEN_QUOTES,
            t in _CLOSE_QUOTES,
            t in _OPEN_PARENS,
            t in _CLOSE_PARENS,
            t in _SLASHES,
            t == ",",
            t in _DASHES,
            t in _TERMINATORS,
            t in _COLONS,
        ],
        dtype=np.float32,
    )


def letter_ngrams(word: str, n: int = 3) -> List[str]:
    """``#word#`` character n-grams (LetterNGramEncoder.java:59-110)."""
    w = "#" + "".join(c for c in word.lower() if c.isprintable() and not c.isspace()) + "#"
    if len(w) < n:
        return [w]
    return [w[i : i + n] for i in range(len(w) - n + 1)]


def hashed_ngram_vector(word: str, dim: int = 64, n: int = 3) -> np.ndarray:
    """Hashing-trick n-gram vector (deterministic stand-in for the trained
    trigram vocab of LetterNGramEncoder)."""
    v = np.zeros(dim, dtype=np.float32)
    for g in letter_ngrams(word, n):
        h = zlib.crc32(g.encode("utf-8"))
        v[h % dim] += 1.0 if (h >> 16) & 1 else -1.0
    return v


def sentence_embedding(tokens: Sequence[Token], dim: int = 64) -> np.ndarray:
    """Deterministic hashed bag-of-ngrams sentence embedding, L2-normalized.

    Stand-in for the reference's learned SECTOR sentence embeddings
    (SectorTagger.java:412-456); the segmentation heuristics in
    core.sections operate on any per-sentence vector series.
    """
    v = np.zeros(dim, dtype=np.float32)
    for t in tokens:
        if t.text and not _is_nl(t.text):
            v += hashed_ngram_vector(t.text, dim)
    norm = float(np.linalg.norm(v))
    if norm > 0:
        v /= norm
    return v
