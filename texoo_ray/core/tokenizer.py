"""Deterministic rule-based tokenizer.

Two-pass design mirroring the reference's TokenizerMENL
(/root/reference/texoo-core/src/main/java/de/datexis/preprocess/TokenizerMENL.java):

Pass 1 (``TokenizerMENL.java:89-129``, whitespace-with-newline): whitespace
separates tokens; ``\\n`` and each of ``\"()[]{}`` are emitted as single-char
tokens that also terminate the current token.

Pass 2 (``TokenizerMENL.java:131-179``): each pass-1 chunk is kept whole if it
is shorter than 2 chars, purely alphanumeric, or a known abbreviation
(WordHelpers.java:39-50); otherwise it is split at punctuation boundaries.
The reference uses an OpenNLP MaxEnt model for this step; we substitute a
deterministic Penn-treebank-style rule set (clitic split, leading/trailing
punctuation runs, protected internal punctuation) — our unit fixtures pin
this behavior (self-consistency is the conformance contract, SURVEY.md §7.4).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from .abbrev import ABBREVIATIONS_ALL

SINGLE_CHAR_TOKENS = frozenset('"()[]{}')

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_ALL_WORD_RE = re.compile(r"\w+\Z", re.UNICODE)
# digits with single internal . or , separators: 1,007  29.7  44,928,923
_NUMBER_RE = re.compile(r"\d+(?:[.,]\d+)*\Z")
# word-char runs joined by single non-word separators: km/h  U.S  e-mail  o'clock
_INTERNAL_RE = re.compile(r"\w+(?:\W\w+)+\Z", re.UNICODE)
# leading / trailing run of one repeated non-word char: "..." "--" "!!"
_LEAD_RUN_RE = re.compile(r"(\W)\1*", re.UNICODE)
_TRAIL_RUN_RE = re.compile(r"(\W)\1*\Z", re.UNICODE)
# pieces for the fallback splitter: word runs or same-char punct runs
_PIECE_RE = re.compile(r"\w+|(\W)\1*", re.UNICODE)

# English clitics split off as their own token (longest first).
_CLITICS = ("n't", "'re", "'ve", "'ll", "'s", "'d", "'m")


def _is_protected(chunk: str) -> bool:
    """Chunks never split further."""
    return (
        len(chunk) < 2
        or _ALL_WORD_RE.match(chunk) is not None
        or chunk in ABBREVIATIONS_ALL
        or _NUMBER_RE.match(chunk) is not None
    )


def _split_chunk(chunk: str, out: List[Tuple[int, int]], base: int) -> None:
    """Append (begin, end) sub-spans of ``chunk`` to ``out`` (offsets + base)."""
    if _is_protected(chunk):
        out.append((base, base + len(chunk)))
        return

    low = chunk.lower()
    for cl in _CLITICS:
        if low.endswith(cl) and len(chunk) > len(cl) and chunk[-len(cl) - 1].isalnum():
            _split_chunk(chunk[: -len(cl)], out, base)
            out.append((base + len(chunk) - len(cl), base + len(chunk)))
            return

    m = _LEAD_RUN_RE.match(chunk)
    if m:
        out.append((base, base + m.end()))
        if m.end() < len(chunk):
            _split_chunk(chunk[m.end() :], out, base + m.end())
        return

    m = _TRAIL_RUN_RE.search(chunk)
    if m:
        _split_chunk(chunk[: m.start()], out, base)
        out.append((base + m.start(), base + len(chunk)))
        return

    if _INTERNAL_RE.match(chunk):
        out.append((base, base + len(chunk)))
        return

    # mixed leftovers (e.g. "a-b.c-") — split into word runs / punct runs
    for pm in _PIECE_RE.finditer(chunk):
        out.append((base + pm.start(), base + pm.end()))


# pass-1 chunking at regex (C) speed: either a run of chars that are neither
# whitespace nor single-char tokens, or one single-char token / newline
_PASS1_RE = re.compile(r'[^\s"()\[\]{}]+|[\n"()\[\]{}]')


def whitespace_newline_spans(text: str) -> List[Tuple[int, int]]:
    """Pass 1: split on whitespace, emitting ``\\n`` and ``\"()[]{}``
    as single-char tokens (TokenizerMENL.java:89-129)."""
    return [(m.start(), m.end()) for m in _PASS1_RE.finditer(text)]


from functools import lru_cache


@lru_cache(maxsize=131072)
def _chunk_spans(chunk: str) -> Tuple[Tuple[int, int], ...]:
    """Pass-2 sub-spans of a chunk, relative to the chunk start. Chunks
    repeat heavily across a corpus, so this is memoized."""
    if _is_protected(chunk):
        return ((0, len(chunk)),)
    out: List[Tuple[int, int]] = []
    _split_chunk(chunk, out, 0)
    return tuple(out)


@lru_cache(maxsize=65536)
def _tokenize_spans_cached(text: str) -> Tuple[Tuple[int, int], ...]:
    out: List[Tuple[int, int]] = []
    append = out.append
    chunk_spans = _chunk_spans
    for m in _PASS1_RE.finditer(text):
        chunk = m.group()
        spans = chunk_spans(chunk)
        begin = m.start()
        if len(spans) == 1:  # common case: unsplit word
            append((begin, begin + len(chunk)))
        else:
            for rb, re_ in spans:
                append((begin + rb, begin + re_))
    return tuple(out)


def tokenize_spans(text: str) -> List[Tuple[int, int]]:
    """Full tokenization: pass 1 + pass 2. Returns (begin, end) spans.

    Memoized on the full input string (on top of the per-chunk cache):
    the inputs are SENTENCES, which are Zipf-distributed in transcript
    corpora (boilerplate lines recur across otherwise-distinct turns),
    so the hit rate survives even when whole-turn memoization misses."""
    return list(_tokenize_spans_cached(text))


def tokenize(text: str) -> List[str]:
    """Token texts only."""
    return [text[b:e] for b, e in tokenize_spans(text)]
