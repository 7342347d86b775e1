"""Span primitives and whitespace-exact text reconstruction.

Semantics mirror the reference's span model (Span.java:27-55,89-99 —
character-cursor offsets, exclusive end, ordering by ``(begin, end)``) and
its text re-assembly helpers (WordHelpers.java:96-137).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, List, Optional, Sequence

from .abbrev import SKIP_SPACE_AFTER, SKIP_SPACE_BEFORE


@dataclass(slots=True)
class Token:
    """Atomic span; ``text`` is stored, not sliced (Token.java:15-57)."""

    text: str
    begin: int
    end: int

    @property
    def length(self) -> int:
        return self.end - self.begin

    def is_empty(self) -> bool:
        return not self.text


@dataclass(slots=True)
class Sentence:
    """Span owning tokens; begin/end derive from first/last token
    (Sentence.java:98-113)."""

    tokens: List[Token] = field(default_factory=list)

    @property
    def begin(self) -> int:
        return self.tokens[0].begin if self.tokens else 0

    @property
    def end(self) -> int:
        return self.tokens[-1].end if self.tokens else 0

    def text(self) -> str:
        """Whitespace-exact reconstruction (Sentence.java:131-142)."""
        return tokens_to_text(self.tokens, self.begin)

    def tokenized_text(self) -> str:
        """Tokens joined by single spaces (Sentence.java:toTokenizedString)."""
        return " ".join(t.text for t in self.tokens)


def tokens_to_text(tokens: Iterable[Token], begin_offset: int) -> str:
    """Rebuild original text from token offsets (WordHelpers.java:113-137).

    Pads spaces up to each token's begin, truncates token text longer than
    its span, space-pads token text shorter than its span. Wrong (backward)
    offsets degrade to single-space separation.
    """
    out: List[str] = []
    cursor = begin_offset
    for t in tokens:
        if t.is_empty():
            continue
        if cursor > t.begin:
            out.append(" ")
            cursor = t.begin
        if cursor < t.begin:
            out.append(" " * (t.begin - cursor))
            cursor = t.begin
        word = t.text
        span_len = t.length
        if span_len == len(word):
            out.append(word)
        elif span_len < len(word):
            out.append(word[:span_len])
        else:
            out.append(word + " " * (span_len - len(word)))
        cursor = t.end
    return "".join(out)


def words_to_text(words: Iterable[str]) -> str:
    """Join words with rule-based spacing (WordHelpers.java:96-105)."""
    out: List[str] = []
    last = ""
    for w in words:
        if last not in SKIP_SPACE_AFTER and w not in SKIP_SPACE_BEFORE:
            out.append(" ")
        out.append(w)
        last = w
    return "".join(out).strip()


def tokens_from_tokenized_text(text: str, offset: int = 0) -> List[Token]:
    """Rebuild offsets for pre-tokenized (space-separated) text using the
    spacing rules (DocumentFactory.java:349-364)."""
    tokens: List[Token] = []
    last = ""
    cursor = offset
    for word in text.split():
        begin, end = cursor, cursor + len(word)
        if last not in SKIP_SPACE_AFTER and word not in SKIP_SPACE_BEFORE:
            begin += 1
            end += 1
        cursor = end
        tokens.append(Token(word, begin, end))
        last = word
    return tokens


def span_overlap_length(a_begin: int, a_end: int, b_begin: int, b_end: int) -> int:
    """Length of character overlap between two spans (WordHelpers.java:205-210)."""
    begin = max(a_begin, b_begin)
    end = min(a_end, b_end)
    return end - begin if begin < end else 0


def spans_intersect(a_begin: int, a_end: int, b_begin: int, b_end: int) -> bool:
    """Any shared character position (Annotation.java:111-115)."""
    return (a_begin <= b_begin < a_end) or (b_begin <= a_begin < b_end)


def span_contains(a_begin: int, a_end: int, b_begin: int, b_end: int) -> bool:
    """a completely contains b (Annotation.java:122-125)."""
    return a_begin <= b_begin and a_end >= b_end


def spans_match_strong(a_begin: int, a_end: int, b_begin: int, b_end: int) -> bool:
    """Exact boundary match (Annotation.java:154-157, Cornolti et al. 2013)."""
    return a_begin == b_begin and (a_end - a_begin) == (b_end - b_begin)


def spans_match_weak(a_begin: int, a_end: int, b_begin: int, b_end: int) -> bool:
    """Weak (overlapping, inclusive-end) boundary match (Annotation.java:146-152)."""
    p1, p2 = a_begin, b_begin
    e1, e2 = a_begin + (a_end - a_begin) - 1, b_begin + (b_end - b_begin) - 1
    return (p1 <= p2 <= e1) or (p1 <= e2 <= e1) or (p2 <= p1 <= e2) or (p2 <= e1 <= e2)


def tokens_in_range(
    tokens: Sequence[Token], begin: int, end: int, enclosed: bool
) -> List[Token]:
    """Tokens enclosed in / overlapping [begin, end) (Document.java:156-174)."""
    if enclosed:
        return [t for t in tokens if t.begin >= begin and t.end <= end]
    return [t for t in tokens if t.begin < end and t.end > begin]
