"""BIO2 / BIOES sequence tags: conversion, validity, CRF-style repair.

Label orders follow the reference enums: BIOES = [S, B, I, E, O]
(BIOESTag.java:28-30), BIO2 = [B, I, O] (BIO2Tag.java:26-33). All
operations are per-sentence (lists of per-token labels), deterministic,
and independent of partitioning.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

BIOES_LABELS = ("S", "B", "I", "E", "O")
BIO2_LABELS = ("B", "I", "O")
BIOES_INDEX = {l: i for i, l in enumerate(BIOES_LABELS)}

# Disallowed BIOES transitions (BIOESTag.java:190-213). The sequence is
# treated as a partition: no begin/end boundary check.
_INVALID = frozenset(
    [
        ("S", "E"), ("S", "I"),
        ("B", "B"), ("B", "O"), ("B", "S"),
        ("I", "B"), ("I", "O"), ("I", "S"),
        ("E", "E"), ("E", "I"),
        ("O", "I"), ("O", "E"),
    ]
)


def bio2_to_bioes(labels: Sequence[str]) -> List[str]:
    """Convert a BIO2 label sequence to BIOES (BIO2Tag.java:224-253).

    B followed by I -> B; B otherwise -> S; I followed by I -> I;
    I otherwise -> E; O -> O.
    """
    n = len(labels)
    out: List[str] = []
    for i, cur in enumerate(labels):
        nxt = labels[i + 1] if i + 1 < n else None
        if cur == "B":
            out.append("B" if nxt == "I" else "S")
        elif cur == "I":
            out.append("I" if nxt == "I" else "E")
        else:
            out.append("O")
    return out


def bioes_to_bio2(labels: Sequence[str]) -> List[str]:
    """Convert BIOES to BIO2 (BIOESTag.java:299-326): B,S -> B; I,E -> I; O -> O."""
    mapping = {"B": "B", "S": "B", "I": "I", "E": "I", "O": "O"}
    return [mapping[l] for l in labels]


def is_correct_bioes(labels: Sequence[str]) -> bool:
    """True iff the BIOES sequence is valid (BIOESTag.java:184-213)."""
    for a, b in zip(labels, labels[1:]):
        if (a, b) in _INVALID:
            return False
    return True


def _is_correct5(t0: str, t1: str, t2: str, t3: str, t4: str) -> bool:
    return (
        (t0, t1) not in _INVALID
        and (t1, t2) not in _INVALID
        and (t2, t3) not in _INVALID
        and (t3, t4) not in _INVALID
    )


def correct_crf(scores: np.ndarray) -> List[str]:
    """CRF-like repair of a BIOES score sequence (BIOESTag.java:331-394).

    ``scores`` is a (T, 5) array of per-token label scores in BIOES order.
    Returns a valid label sequence. Mirrors the reference's sliding
    brute-force: at each cursor, enumerate label triples (cursor..cursor+2)
    with the previously-repaired label at cursor-1 fixed and the argmax at
    cursor+3 pinned, keep the valid triple with the highest summed score
    (ties resolve to the later loop iterate, like the reference's TreeMap
    overwrite), and commit the first label of that triple.
    """
    T = scores.shape[0]
    labels = [BIOES_LABELS[int(i)] for i in np.argmax(scores, axis=1)]
    if is_correct_bioes(labels):
        return labels

    O_VEC = np.zeros(5)
    O_VEC[BIOES_INDEX["O"]] = 1.0

    def vec(pos: int) -> np.ndarray:
        if pos < 0 or pos >= T:
            return O_VEC
        return scores[pos]

    out = list(labels)
    for cursor in range(T):
        v1, v2, v3, v4 = vec(cursor), vec(cursor + 1), vec(cursor + 2), vec(cursor + 3)
        t0 = out[cursor - 1] if cursor > 0 else "O"
        t4 = BIOES_LABELS[int(np.argmax(v4))]
        best: Optional[Tuple[float, str]] = None
        for x, lx in enumerate(BIOES_LABELS):
            for y, ly in enumerate(BIOES_LABELS):
                for z, lz in enumerate(BIOES_LABELS):
                    if not _is_correct5(t0, lx, ly, lz, t4):
                        continue
                    score = float(v1[x]) + float(v2[y]) + float(v3[z])
                    if best is None or score >= best[0]:
                        best = (score, lx)
        if best is not None:
            out[cursor] = best[1]
    return out


def confidence_from_scores(scores: np.ndarray, labels: Sequence[str]) -> List[float]:
    """Per-token confidence for repaired labels = score at the chosen label
    (BIOESTag.java:70-76, constructor with explicit label)."""
    return [float(scores[i, BIOES_INDEX[l]]) for i, l in enumerate(labels)]


# --- POS and T/F tag types (model/tag/POSTag.java, TFTag.java) -------------


class POSTag:
    """Part-of-speech tag for a single token (POSTag.java:12-67): a plain
    string value with equality on the value; confidence is fixed 0."""

    __slots__ = ("value",)

    def __init__(self, value: str = ""):
        self.value = value

    def tag(self) -> str:
        return self.value

    @property
    def confidence(self) -> float:
        return 0.0

    def __eq__(self, other) -> bool:
        return isinstance(other, POSTag) and other.value == self.value

    def __hash__(self) -> int:
        return hash(self.value)

    def __repr__(self) -> str:
        return "POSTag(%r)" % self.value


TF_LABELS = ("T", "F")
GENERIC = "GENERIC"


class TFTag:
    """Binary True/False sequence tag (TFTag.java:17-230): label in
    {T, F}; type defaults to GENERIC for T and None for F; equality on
    (label, type); ``max`` picks the argmax of a 2-score vector with
    index 0 = T (TFTag.java:110-132)."""

    __slots__ = ("label", "type", "confidence")

    def __init__(self, label: str = "F", type_: str = None, confidence: float = 0.0):
        assert label in TF_LABELS
        self.label = label
        if type_ is None:
            type_ = GENERIC if label == "T" else None
        self.type = type_
        self.confidence = confidence

    @classmethod
    def t(cls) -> "TFTag":
        return cls("T")

    @classmethod
    def f(cls) -> "TFTag":
        # TFTag.java:57: F explicitly carries no type
        tag = cls("F")
        tag.type = None
        return tag

    @classmethod
    def from_scores(cls, scores, type_: str = GENERIC) -> "TFTag":
        """argmax with index 0 = T, ties -> later index (TFTag.java:110-125
        uses >=, so F wins a tie)."""
        best, best_i = None, 0
        for i, s in enumerate(scores):
            if best is None or s >= best:
                best, best_i = s, i
        label = TF_LABELS[best_i]
        tag = cls(label, type_ if label == "T" else None, float(best))
        return tag

    def is_t(self) -> bool:
        return self.label == "T"

    def is_f(self) -> bool:
        return self.label == "F"

    def tag(self) -> str:
        return self.label

    def vector(self):
        """One-hot score vector, T = [1,0] (TFTag.java:76-84)."""
        return [1.0, 0.0] if self.label == "T" else [0.0, 1.0]

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, TFTag)
            and other.label == self.label
            and other.type == self.type
        )

    def __hash__(self) -> int:
        return hash((self.label, self.type))

    def __repr__(self) -> str:
        return self.label if self.type is None else "%s-%s" % (self.label, self.type)
