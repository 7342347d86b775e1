"""Heuristic language identification over ~15 languages.

Stands in for the reference's optimaize n-gram detector
(DocumentFactory.java:75-87,269-276). Detection is two-stage, all public
knowledge:

1. **Script detection** for non-Latin scripts (Cyrillic -> ru, Greek ->
   el, Arabic -> ar, Hebrew -> he, Devanagari -> hi, Hangul -> ko,
   kana -> ja, Han without kana -> zh, Thai -> th) — a single pass over a
   bounded sample.
2. **Marker-word scoring** for Latin-script languages (en de fr es it pt
   nl), top function words per language plus orthography bonuses
   (ä/ö/ü/ß -> de, ñ/¿/¡ -> es, ã/õ -> pt, è/ò/ù -> it, ij/zijn -> nl).

Returns "" on empty/undecidable input, like the reference's failure path
(DocumentFactory.java:269-276). The reference ships models only for EN/DE
and routes everything else to EN (GenericMentionAnnotator.java:64-78,
DocumentFactory.java:243 getOrDefault); per-language routing in
``stages/extract.py`` keys off these codes the same way.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

_WORD_RE = re.compile(r"[a-zà-öø-ÿāēīōū]+")

# High-frequency function words; scoring is count-of-matches per language.
_MARKER_SETS: Dict[str, frozenset] = {
    "en": frozenset(
        """the and of to in is that it for on with as was at by an be this have
        from or are not but had his they which you were her she there been their
        has would when who will more no if out so said what its about than them
        can only other time new some could these may then do any my now such
        over into after all we our your me him up down just because""".split()
    ),
    "de": frozenset(
        """der die das und ist nicht von sie mit dem den ein eine einer eines im
        für auf des sich auch als an es nach wie bei aus um zum zur über wird
        sind war dass wurde werden noch durch kann beim vom ab wenn nur hat sehr
        schon mehr gegen ohne bis unter zwischen ihre seinem ihren dieser diese""".split()
    ),
    "fr": frozenset(
        """le la les des du et en un une est que qui dans pour sur avec ne pas
        ce cette il elle nous vous ils sont au aux été être par plus mais où si
        leur comme tout aussi bien après sans peut ses dont elles je tu cela
        notre votre leurs était même deux très faire ont""".split()
    ),
    "es": frozenset(
        """el los las de y en un una es que no se por con para su al lo como
        más pero sus le ya o este sí porque esta entre cuando muy sin sobre
        también hasta hay donde quien desde todo nos uno les ni contra otros
        ese eso ante ellos e esto antes algunos qué unos yo otro otras otra él""".split()
    ),
    "it": frozenset(
        """il lo la gli le di e che in un una è non per con del della si da
        come più ma anche sono questo questa tra quando molto senza dove chi
        tutto nella nel alla dei delle sulla perché cosa questi ancora dopo
        essere stato erano loro suo sua questo già ogni""".split()
    ),
    "pt": frozenset(
        """o os as de e que em um uma é não se por com para sua seu ao dos das
        como mais mas ou quando muito sem sobre também até onde quem desde nos
        já foi são tem à às pelo pela isso ele ela eles elas você depois ainda
        entre mesmo outros seus suas era ser está""".split()
    ),
    "nl": frozenset(
        """de het een en van in is dat op te niet met voor zijn er aan ook als
        maar om dan nog wordt uit bij naar heeft werd deze door over meer tot
        kan geen worden wel hij zij we je ik dit die al naar onder tussen hun
        na toen zich hebben twee andere alle veel""".split()
    ),
}

# Orthography signatures essentially unique to one Latin language.
# Split by whether the pattern can ever match pure-ASCII text: for ASCII
# input (the overwhelming majority of turns) only the French apostrophe
# contractions apply, so the hot path runs at most one of these scans.
_CHAR_BONUSES: Tuple[Tuple[str, re.Pattern, int], ...] = (
    ("de", re.compile(r"[äöüß]"), 2),
    ("es", re.compile(r"[ñ¿¡]"), 3),
    ("pt", re.compile(r"[ãõ]"), 3),
    ("fr", re.compile(r"[êâîôûœ]|\bc'|\bd'|\bl'|\bqu'"), 2),
    ("it", re.compile(r"[òù]|\bperché\b|\bpiù\b"), 3),
)
_ASCII_FR_RE = re.compile(r"\bc'|\bd'|\bl'|\bqu'")

# Non-Latin scripts resolve by a single range scan.
_SCRIPTS: Tuple[Tuple[str, re.Pattern], ...] = (
    ("ja", re.compile(r"[぀-ヿ]")),  # kana beats Han
    ("zh", re.compile(r"[一-鿿]")),
    ("ko", re.compile(r"[가-힯ᄀ-ᇿ]")),
    ("ru", re.compile(r"[Ѐ-ӿ]")),
    ("el", re.compile(r"[Ͱ-Ͽ]")),
    ("ar", re.compile(r"[؀-ۿ]")),
    ("he", re.compile(r"[֐-׿]")),
    ("hi", re.compile(r"[ऀ-ॿ]")),
    ("th", re.compile(r"[฀-๿]")),
)

_MIN_SCRIPT_CHARS = 4

# merged word -> languages map: one dict lookup per token in the hot path.
# Single-character markers (es 'y'/'o', it/pt 'e', pt 'a'/'o') are dropped:
# they false-positive on abbreviations like "e.g." in any language.
_WORD_LANGS: Dict[str, Tuple[str, ...]] = {}
for _lang, _ms in _MARKER_SETS.items():
    for _w in _ms:
        if len(_w) >= 2:
            _WORD_LANGS[_w] = _WORD_LANGS.get(_w, ()) + (_lang,)


def detect_language(text: str) -> str:
    """Return an ISO-639-1 code or "" when no evidence is found."""
    if not text:
        return ""
    sample = text[:4000]
    is_ascii = sample.isascii()
    if not is_ascii:
        # script pass: first script with enough characters wins; kana is
        # checked before Han so Japanese text with kanji resolves to ja
        best_lang, best_n = "", 0
        for lang, pat in _SCRIPTS:
            n = len(pat.findall(sample))
            if lang == "ja" and n >= _MIN_SCRIPT_CHARS:
                return "ja"
            if n > best_n:
                best_lang, best_n = lang, n
        if best_n >= _MIN_SCRIPT_CHARS:
            return best_lang
    low = sample.lower()
    words = _WORD_RE.findall(low)
    if not words:
        return ""
    scores: Dict[str, int] = {}
    for w in words:
        for lang in _WORD_LANGS.get(w, ()):
            scores[lang] = scores.get(lang, 0) + 1
    if is_ascii:
        # only the fr apostrophe contractions can match ASCII text
        if "'" in low:
            hits = len(_ASCII_FR_RE.findall(low))
            if hits:
                scores["fr"] = scores.get("fr", 0) + 2 * hits
    else:
        for lang, pat, weight in _CHAR_BONUSES:
            hits = len(pat.findall(low))
            if hits:
                scores[lang] = scores.get(lang, 0) + weight * hits
    if not scores:
        return ""
    # deterministic tie-break: highest score, then alphabetical
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
