"""String normalizers and token preprocessors.

Mirrors WordHelpers.java:29-35,171-203 and the token preprocessors in
/root/reference/texoo-core/src/main/java/de/datexis/preprocess/*Preprocessor.java.
"""

from __future__ import annotations

import re
import unicodedata

_UMLAUT_REPLACEMENTS = (
    ("Ä", "Ae"), ("Ü", "Ue"), ("Ö", "Oe"),
    ("ä", "ae"), ("ü", "ue"), ("ö", "oe"),
    ("ß", "ss"), ("–", "-"),
)

DASH_RE = re.compile(r"[\-_\/]+")
PUNCT_RE = re.compile(r"[^\w\s\-_]+", re.UNICODE)
SPACE_RE = re.compile(r"\s+")
NUMERIC_RE = re.compile(r"\d+")
BRACKETS_RE = re.compile(r'[\(\)\[\]"]')


def replace_accents(text: str) -> str:
    """NFD normalization (WordHelpers.java:171-176)."""
    return unicodedata.normalize("NFD", text)


def replace_umlauts(text: str) -> str:
    for src, dst in _UMLAUT_REPLACEMENTS:
        text = text.replace(src, dst)
    return text


def replace_dashes(text: str, rep: str = " ") -> str:
    return DASH_RE.sub(rep, text)


def replace_punctuation(text: str, rep: str = " ") -> str:
    return PUNCT_RE.sub(rep, text)


def replace_numbers(text: str, rep: str = "#") -> str:
    return NUMERIC_RE.sub(rep, text)


def replace_spaces(text: str, rep: str = " ") -> str:
    return SPACE_RE.sub(rep, text)


def split_spaces(text: str) -> list:
    return SPACE_RE.split(text)


# --- token preprocessors (IdentityPreprocessor etc., 20-23 LoC each) -------

def identity(token: str) -> str:
    return token


def lowercase(token: str) -> str:
    return token.lower()


def minimal_lowercase(token: str) -> str:
    """Lowercase only; keep digits/punct as-is (MinimalLowercasePreprocessor)."""
    return token.strip().lower()


def minimal_lowercase_newline(token: str) -> str:
    """Like minimal_lowercase, but newline tokens map to the *NL* marker."""
    return "*NL*" if token == "\n" else token.strip().lower()


def lowercase_letters(token: str) -> str:
    """Keep only lowercase letters (LowercaseLetterPreprocessor)."""
    return "".join(c for c in token.lower() if c.isalpha())


def keep_printable_lower(token: str) -> str:
    """Lowercase + strip non-printables (LetterNGramEncoder.keepOnlyPrintableChars)."""
    return "".join(c for c in token.lower() if c.isprintable() and not c.isspace())
