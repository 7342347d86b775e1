"""Deterministic feature-based mention tagger.

Stands in for the reference's BLSTM MentionTagger
(MentionTagger.java:86-138,241-268) with identical *tag semantics*: emits
per-token BIOES score vectors (label order S,B,I,E,O), applies the CRF
validity repair, converts to BIO2 and decodes mentions downstream — the
same requires/attaches contract ("requires Token features, attaches
BIOESTag then BIO2Tag", MentionTagger.java:236-238). The scoring itself is
a deterministic capitalization/surface heuristic, since model weights are
not part of the semantics contract (SURVEY.md §2.5).
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import numpy as np

from .spans import Sentence
from .stopwords import STOPWORDS_DE, STOPWORDS_EN
from .tags import BIOES_INDEX, correct_crf

_HAS_ALPHA_RE = re.compile(r"[^\W\d_]", re.UNICODE)
_HAS_DIGIT_RE = re.compile(r"\d")

# lowercase connectors allowed INSIDE a capitalized run ("University of Oslo")
_CONNECTORS = frozenset(["of", "de", "la", "von", "van", "der", "und", "and", "for"])


class FeatureTagger:
    """Callable per-document tagger; construct once (per actor), apply often."""

    def __init__(self, language: str = "en", threshold: float = 0.5):
        self.threshold = threshold
        self.stopwords = STOPWORDS_DE if language == "de" else STOPWORDS_EN
        # split position-0 / position>0 score caches: one plain-string dict
        # get per token on the hot path (no tuple-key allocation)
        self._cache0: dict = {}
        self._cache1: dict = {}

    def entity_score(self, token: str, position: int) -> float:
        """Deterministic [0,1] evidence that a token is part of a mention."""
        t = token
        if not t or not _HAS_ALPHA_RE.search(t):
            return 0.0
        lower = t.lower()
        if lower in self.stopwords:
            return 0.05
        first_upper = t[0].isupper()
        all_upper = t.isupper() and len(t) >= 2
        has_digit = bool(_HAS_DIGIT_RE.search(t))
        if all_upper:
            return 0.95
        if first_upper and has_digit:
            return 0.9
        if first_upper and position > 0:
            return 0.9
        if first_upper and position == 0:
            # sentence-initial capitalization is ambiguous -> below threshold
            return 0.4
        return 0.05

    def score_sentence(self, tokens: Sequence[str]) -> np.ndarray:
        """(T, 5) BIOES score matrix for one sentence."""
        T = len(tokens)
        ent = np.zeros(T)
        for i, tok in enumerate(tokens):
            ent[i] = self.entity_score(tok, i)
        # connectors join two entity tokens ("University of Oslo")
        for i in range(1, T - 1):
            if (
                tokens[i].lower() in _CONNECTORS
                and ent[i - 1] >= self.threshold
                and ent[i + 1] >= self.threshold
            ):
                ent[i] = self.threshold + 0.1

        scores = np.zeros((T, 5), dtype=np.float64)
        in_run = ent >= self.threshold
        for i in range(T):
            e = float(ent[i])
            if not in_run[i]:
                scores[i, BIOES_INDEX["O"]] = 1.0 - e
                scores[i, BIOES_INDEX["S"]] = e / 2
                scores[i, BIOES_INDEX["B"]] = e / 2
                continue
            prev_in = i > 0 and in_run[i - 1]
            next_in = i + 1 < T and in_run[i + 1]
            if not prev_in and not next_in:
                label = "S"
            elif not prev_in:
                label = "B"
            elif next_in:
                label = "I"
            else:
                label = "E"
            scores[i, BIOES_INDEX[label]] = e
            scores[i, BIOES_INDEX["O"]] = 1.0 - e
        return scores

    def _entity_scores(self, tokens: Sequence[str]) -> List[float]:
        T = len(tokens)
        c0 = self._cache0
        c1 = self._cache1
        ent = [0.0] * T
        for i, tok in enumerate(tokens):
            cache = c1 if i else c0
            e = cache.get(tok)
            if e is None:
                e = self.entity_score(tok, 1 if i else 0)
                if len(cache) < 200_000:
                    cache[tok] = e
            ent[i] = e
        # connectors join two entity tokens ("University of Oslo");
        # all connectors are <=3 chars, so gate the lower() call on length.
        # Updates are sequential in i on purpose: a bumped connector can
        # enable the next one's left-neighbor check (same as the original
        # in-place loop).
        th = self.threshold
        for i in range(1, T - 1):
            t = tokens[i]
            if (
                len(t) <= 3
                and ent[i - 1] >= th
                and ent[i + 1] >= th
                and t.lower() in _CONNECTORS
            ):
                ent[i] = th + 0.1
        return ent

    def tag_sentences(
        self, sentences: Sequence[Sentence]
    ) -> Tuple[List[str], List[float]]:
        """Flat per-token BIOES labels + confidences for a document.

        The run-structured labeling is valid-by-construction, so the CRF
        repair (applied in full when consuming external score sequences,
        e.g. via ``correct_crf``) is a no-op here and skipped. Confidence
        follows BIOESTag(INDArray,...) (BIOESTag.java:58-65): O -> P(O),
        otherwise 1 - P(O) where P(O) = 1 - entity score.
        """
        labels: List[str] = []
        confs: List[float] = []
        th = self.threshold
        for s in sentences:
            toks = [t.text for t in s.tokens]
            if not toks:
                continue
            ent = self._entity_scores(toks)
            T = len(ent)
            in_run = [e >= th for e in ent]
            for i in range(T):
                e = ent[i]
                if not in_run[i]:
                    labels.append("O")
                    confs.append(1.0 - e)
                    continue
                prev_in = i > 0 and in_run[i - 1]
                next_in = i + 1 < T and in_run[i + 1]
                if not prev_in and not next_in:
                    labels.append("S")
                elif not prev_in:
                    labels.append("B")
                elif next_in:
                    labels.append("I")
                else:
                    labels.append("E")
                confs.append(e)
        return labels, confs
