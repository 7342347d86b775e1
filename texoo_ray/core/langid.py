"""Heuristic language identification (en / de / "" unknown).

Stands in for the reference's optimaize n-gram detector
(DocumentFactory.java:75-87,269-276). The reference only ships models for
EN and DE and routes everything else to EN
(GenericMentionAnnotator.java:64-78, DocumentFactory.java:243 getOrDefault),
so a stopword/character-ngram scorer over those two languages preserves
the observable routing behavior. Returns "" on empty/undecidable input,
like the reference's failure path (DocumentFactory.java:269-276).
"""

from __future__ import annotations

import re
from typing import Dict

_WORD_RE = re.compile(r"[a-zäöüß]+")

# High-frequency function words; disjoint marker sets keep scoring sharp.
_EN_MARKERS = frozenset(
    """the and of to in is that it for on with as was at by an be this have
    from or are not but had his they which you were her she there been their
    has would when who will more no if out so said what its about than them
    can only other time new some could these may then do any my now such""".split()
)
_DE_MARKERS = frozenset(
    """der die das und ist nicht von sie mit dem den ein eine einer eines im
    für auf des sich auch als an es nach wie bei aus um zum zur über wird
    sind war dass wurde werden noch durch kann beim vom ab wenn nur hat sehr
    schon mehr gegen ohne bis unter zwischen ihre seinem ihren dieser diese""".split()
)
# Character sequences essentially unique to German orthography.
_DE_CHARS_RE = re.compile(r"[äöüß]")


def detect_language(text: str) -> str:
    """Return "en", "de", or "" when no evidence is found."""
    if not text:
        return ""
    sample = text[:4000].lower()
    words = _WORD_RE.findall(sample)
    if not words:
        return ""
    en = sum(1 for w in words if w in _EN_MARKERS)
    de = sum(1 for w in words if w in _DE_MARKERS)
    de += 2 * len(_DE_CHARS_RE.findall(sample))
    if en == 0 and de == 0:
        return ""
    return "de" if de > en else "en"
