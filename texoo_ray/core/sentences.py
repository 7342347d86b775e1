"""Deterministic newline-aware sentence splitter.

Mirrors the observable control flow of the reference's SentenceDetectorMENL
(/root/reference/texoo-core/src/main/java/de/datexis/preprocess/
SentenceDetectorMENL.java:28,64-161):

- end-of-sentence candidates are ``. ! ? \\n`` (``:28``)
- leading dots of a multi-dot run inside one whitespace chunk are skipped
  (``:77-80``)
- a ``\\n`` candidate always SPLITs; a ``./!/?`` candidate whose next
  non-whitespace char is ``\\n`` never splits (the newline will, ``:86-88``)
- a break is rejected when the sentence-so-far ends with a known
  abbreviation (endswith semantics over both language lists, ``:211-215``)
- the next sentence starts at the first non-whitespace char after the end
  of the current whitespace chunk (``:92-96``)
- with no boundary at all, the whole trimmed string is one sentence
  (``:111-129``); a trailing non-terminated remainder becomes a final
  sentence (``:133-161``)
- sentence spans strip leading whitespace and trailing non-``\\n``
  whitespace (``trimSpan``, ``:174-196``)

The reference scores ``./!/?`` candidates with an OpenNLP MaxEnt model; we
substitute deterministic rules (pinned by our fixtures, SURVEY.md §7.4):
split only when the candidate is the last char or followed directly by
whitespace; never inside an ellipsis run; never before a lowercase letter
(for ``.``); never after a short standalone digit run (enumeration "1.",
"26. Oktober" — validated by the reference's enumeration fixture,
DocumentFactoryTest.java:122-127).
"""

from __future__ import annotations

import re
from typing import List, Tuple

from .abbrev import ends_with_abbreviation, ends_with_abbreviation_at

_EOS_RE = re.compile(r"[.!?\n]")

# C-speed scans; ``\s`` matches exactly the ``str.isspace`` set (verified
# over the full whitespace range), so these are drop-in equivalents of
# the former per-char loops.
_NONWS_RUN_RE = re.compile(r"\S*")
_WS_RUN_RE = re.compile(r"\s*")


def _first_ws(s: str, pos: int) -> int:
    return _NONWS_RUN_RE.match(s, pos).end()


def _first_non_ws(s: str, pos: int) -> int:
    return _WS_RUN_RE.match(s, pos).end()


def _eval_split(s: str, cint: int) -> bool:
    """Deterministic stand-in for the MaxEnt end-of-sentence decision."""
    c = s[cint]
    if c == ".":
        # ellipsis / dot runs never split
        if cint > 0 and s[cint - 1] == ".":
            return False
        # enumeration markers: standalone 1-2 digit run directly before the dot
        j = cint
        while j > 0 and s[j - 1].isdigit():
            j -= 1
        ndigits = cint - j
        if 1 <= ndigits <= 2 and (j == 0 or s[j - 1].isspace()):
            return False
    # must be last char or followed by whitespace
    if cint + 1 < len(s) and not s[cint + 1].isspace():
        return False
    if c == ".":
        # don't split before a lowercase continuation
        nint = _first_non_ws(s, cint + 1)
        if nint < len(s) and s[nint].islower():
            return False
    return True


def sentence_spans(text: str) -> List[Tuple[int, int]]:
    """Return (begin, end) spans of sentences in ``text``.

    Hot-path form of the original per-candidate loop (same decisions in
    the same order, pinned by the sentence fixtures):
    - ``fws`` (end of the non-ws chunk) is only needed for non-``\\n``
      candidates (the chunk rule is skipped for newlines),
    - ``_eval_split`` is inlined so the ``nint`` whitespace scan is shared
      with the newline-suppression check,
    - the abbreviation guard runs only for ``.`` candidates — every entry
      of both abbreviation lists ends with ``./a/g``, so a sentence whose
      last char is ``! ? \\n`` can never match — and probes suffix windows
      in place instead of slicing the sentence.
    """
    s = text
    n = len(s)
    enders = [m.start() for m in _EOS_RE.finditer(s)]
    n_enders = len(enders)
    positions: List[int] = []
    index = 0

    for i in range(n_enders):
        cint = enders[i]
        c = s[cint]
        is_nl = c == "\n"
        if not is_nl:
            fws = _NONWS_RUN_RE.match(s, cint + 1).end()
            if i + 1 < n_enders and enders[i + 1] < fws:
                continue
        if positions and cint < positions[-1]:
            continue

        if is_nl:
            split = True
        else:
            split = True
            if c == ".":
                # ellipsis / dot runs never split
                if cint > 0 and s[cint - 1] == ".":
                    split = False
                else:
                    # enumeration markers: standalone 1-2 digit run
                    j = cint
                    while j > 0 and s[j - 1].isdigit():
                        j -= 1
                    ndigits = cint - j
                    if 1 <= ndigits <= 2 and (j == 0 or s[j - 1].isspace()):
                        split = False
            # must be last char or followed by whitespace
            if split and cint + 1 < n and not s[cint + 1].isspace():
                split = False
            if split:
                nint = _WS_RUN_RE.match(s, cint + 1).end()
                if nint < n:
                    nc = s[nint]
                    # don't split before a lowercase continuation (.)
                    # nor before a newline (the newline will split)
                    if nc == "\n" or (c == "." and nc.islower()):
                        split = False

        if split and (
            c != "." or not ends_with_abbreviation_at(s, index, cint + 1)
        ):
            if index != cint:
                if is_nl:
                    positions.append(_WS_RUN_RE.match(s, cint + 1).end())
                else:
                    positions.append(_WS_RUN_RE.match(s, fws).end())
            index = cint + 1

    if not positions:
        begin, end = 0, n
        while begin < n and s[begin].isspace():
            begin += 1
        while end > 0 and s[end - 1].isspace():
            end -= 1
        return [(begin, end)] if end - begin > 0 else []

    spans: List[Tuple[int, int]] = []
    starts = positions
    bounds = [0] + starts
    segments = list(zip(bounds[:-1], bounds[1:]))
    if starts[-1] != n:  # leftover tail
        segments.append((starts[-1], n))
    for begin, end in segments:
        b, e = _trim_span(s, begin, end)
        if e - b > 0:
            spans.append((b, e))
    return spans


def _trim_span(s: str, begin: int, end: int) -> Tuple[int, int]:
    """Strip leading whitespace and trailing non-newline whitespace
    (SentenceDetectorMENL.java:174-196)."""
    b = begin
    while b < end and s[b].isspace():
        b += 1
    e = end
    while e > begin and s[e - 1].isspace() and s[e - 1] != "\n":
        e -= 1
    if b > e:
        return begin, begin
    return b, e
