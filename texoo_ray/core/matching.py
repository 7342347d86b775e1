"""Gazetteer (term-list) matching with longest-match / non-overlap semantics.

Mirrors MatchingAnnotator.java:42-239 in
/root/reference/texoo-entity-recognition/src/main/java/de/datexis/ner/:

- term preprocessing per MatchingStrategy (``convertTerms``, :80-106):
  CASE_SENSITIVE keeps terms as-is (distinct only); LOWERCASE lowercases
  words of length >= 4 except all-uppercase acronyms shorter than 8 chars;
  SKIP_STOPWORDS additionally drops stopwords; LOWERCASE/SKIP_STOPWORDS
  also drop terms shorter than ``min_word_length`` (default 3)
- matching is leftmost-longest, non-overlapping (the reference uses
  SetBackwardOracleMatching with LONGEST_MATCH+NON_OVERLAP, :200-210; we
  use a longest-first regex alternation, which implements the documented
  semantics exactly — the reference's own comment flags its library's
  LONGEST_MATCH as "invalid", :119-121, so counts may differ on
  adversarial overlaps)
- a match is accepted only when its span lies exactly on token boundaries
  (``spanIsAtTokenBoundaries``, :235-239)

At 100 TB scale the term list is broadcast once (``ray.put``) and the
compiled automaton is built per actor in ``__init__`` — see
``texoo_ray.stages.matcher``.
"""

from __future__ import annotations

import re
from enum import Enum
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from .mentions import GENERIC
from .spans import Token, tokens_in_range, tokens_to_text
from .stopwords import STOPWORDS_EN

_WORD4_RE = re.compile(r"\b\w{4,}\b", re.UNICODE)
_UPPER_RE = re.compile(r"^[A-Z0-9]+$")


class MatchingStrategy(Enum):
    CASE_SENSITIVE = "case_sensitive"
    LOWERCASE = "lowercase"
    SKIP_STOPWORDS = "skip_stopwords"


def convert_to_lowercase(text: str) -> str:
    """Lowercase all words of length >= 4, except all-uppercase acronyms of
    length < 8 (MatchingAnnotator.convertToLowercase, :169-185)."""

    def repl(m: re.Match) -> str:
        w = m.group()
        if _UPPER_RE.match(w):
            return w.lower() if len(w) >= 8 else w
        return w.lower()

    return _WORD4_RE.sub(repl, text)


def convert_terms(
    terms: Iterable[str],
    strategy: MatchingStrategy = MatchingStrategy.CASE_SENSITIVE,
    min_word_length: int = 3,
) -> List[str]:
    """Normalize/filter/dedupe the term list (convertTerms, :80-106)."""
    if strategy is MatchingStrategy.LOWERCASE:
        out = [convert_to_lowercase(t) for t in terms if len(t) >= min_word_length]
    elif strategy is MatchingStrategy.SKIP_STOPWORDS:
        out = [
            t
            for t in terms
            if len(t) >= min_word_length and t.lower() not in STOPWORDS_EN
        ]
    else:
        out = list(terms)
    seen = set()
    deduped = []
    for t in out:
        if t and t not in seen:
            seen.add(t)
            deduped.append(t)
    if strategy is not MatchingStrategy.CASE_SENSITIVE:
        deduped.sort(key=len, reverse=True)
    return deduped


class Gazetteer:
    """Compiled term matcher; build once per actor, apply per text."""

    def __init__(
        self,
        terms: Iterable[str],
        strategy: MatchingStrategy = MatchingStrategy.CASE_SENSITIVE,
        source: str = "SILVER",
        mention_type: str = GENERIC,
        min_word_length: int = 3,
    ):
        self.strategy = strategy
        self.source = source
        self.mention_type = mention_type
        self.terms = convert_terms(terms, strategy, min_word_length)
        if self.terms:
            alternation = "|".join(
                re.escape(t) for t in sorted(self.terms, key=len, reverse=True)
            )
            self._regex: Optional[re.Pattern] = re.compile(alternation)
        else:
            self._regex = None

    def find(self, text: str) -> List[Tuple[int, int]]:
        """Leftmost-longest non-overlapping raw matches."""
        if self._regex is None:
            return []
        if self.strategy is MatchingStrategy.LOWERCASE:
            text = convert_to_lowercase(text)
        return [(m.start(), m.end()) for m in self._regex.finditer(text)]

    def annotate(self, text: str, tokens: Sequence[Token]) -> List[Dict]:
        """Matches at exact token boundaries → mentions (annotate, :196-230).

        Token lookup is O(log n) via bisect over the sorted begin offsets
        (tokens are in document order by construction)."""
        from bisect import bisect_left

        mentions: List[Dict] = []
        toks = list(tokens)
        begins = [t.begin for t in toks]
        n = len(toks)
        for begin, end in self.find(text):
            i = bisect_left(begins, begin)
            covered: List[Token] = []
            while i < n and begins[i] < end:
                if toks[i].end <= end:
                    covered.append(toks[i])
                i += 1
            if not covered:
                continue
            if covered[0].begin == begin and covered[-1].end == end:
                mentions.append(
                    {
                        "begin": begin,
                        "end": end,
                        "text": tokens_to_text(covered, begin),
                        "type": self.mention_type,
                        "confidence": 1.0,
                        "source": self.source,
                    }
                )
        return mentions
