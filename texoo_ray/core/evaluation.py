"""Evaluation metrics: NER P/R/F1 (strong/weak) and segmentation Pk/WindowDiff.

Mirrors MentionAnnotatorEval (counting matches per Cornolti et al. 2013,
Annotation.java:143-158) and SegmentationEvaluation.java:104-196 (ports of
the public segeval definitions, as the reference's own comments note).

All counters are mergeable (partial per turn/batch -> global sum), so the
distributed form is map_batches partials + a tiny final reduce
(SURVEY.md §2.7).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from .spans import spans_match_strong, spans_match_weak


def mention_match_counts(
    gold: Sequence[Dict], pred: Sequence[Dict], weak: bool = False
) -> Tuple[int, int, int]:
    """(true_positives, n_gold, n_pred) for one document's mentions."""
    match = spans_match_weak if weak else spans_match_strong
    tp = 0
    used = [False] * len(pred)
    for g in gold:
        for i, p in enumerate(pred):
            if not used[i] and match(g["begin"], g["end"], p["begin"], p["end"]):
                used[i] = True
                tp += 1
                break
    return tp, len(gold), len(pred)


def prf1(tp: int, n_gold: int, n_pred: int) -> Dict[str, float]:
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1}


# --- segmentation ----------------------------------------------------------


def positions_array(section_lengths: Sequence[int]) -> List[int]:
    """Sentence-wise segment ids, e.g. [3,2] -> [1,1,1,2,2]
    (SegmentationEvaluation.getPositionsArray)."""
    out: List[int] = []
    for seg_id, length in enumerate(section_lengths, start=1):
        out.extend([seg_id] * length)
    return out


def masses_array(positions: Sequence[int]) -> List[int]:
    """[1,1,1,2,2] -> [3,2] (SegmentationEvaluation docstring example)."""
    out: List[int] = []
    for p in positions:
        if out and p == prev:  # noqa: F821 - prev set below on first iter
            out[-1] += 1
        else:
            out.append(1)
        prev = p
    return out


def pk(reference: Sequence[int], hypothesis: Sequence[int], k: int) -> float:
    """Pk metric (SegmentationEvaluation.calculatePk, :104-127)."""
    n = len(reference)
    if n == 2:
        agree_ref = reference[0] == reference[1]
        agree_hyp = hypothesis[0] == hypothesis[1]
        return 0.0 if agree_ref == agree_hyp else 1.0
    if n <= 1:
        return 0.0
    total = 0
    disagree = 0
    for t in range(n - k):
        agree_ref = reference[t] == reference[t + k]
        agree_hyp = hypothesis[t] == hypothesis[t + k]
        if agree_ref != agree_hyp:
            disagree += 1
        total += 1
    return disagree / total if total else 0.0


def window_diff(reference: Sequence[int], hypothesis: Sequence[int], k: int) -> float:
    """WindowDiff metric (SegmentationEvaluation.calculateWD, :133-169)."""
    n = len(reference)
    if n == 2:
        agree_ref = reference[0] == reference[1]
        agree_hyp = hypothesis[0] == hypothesis[1]
        return 0.0 if agree_ref == agree_hyp else 1.0
    if n <= 1:
        return 0.0
    total = 0
    disagree = 0
    for t in range(n - k):
        sum_ref = 0
        sum_hyp = 0
        for j in range(k):
            if reference[t + j] == 0:
                return 1.0
            if reference[t + j] == reference[t + j + 1]:
                sum_ref += 1
            if hypothesis[t + j] == hypothesis[t + j + 1]:
                sum_hyp += 1
        if sum_ref != sum_hyp:
            disagree += 1
        total += 1
    return disagree / total if total else 0.0


def calculate_k(masses: Sequence[int]) -> int:
    """Preferred window size = half the mean segment length, min 2
    (SegmentationEvaluation.calculateK, :175-188). Uses Java Math.round
    semantics (floor(x + 0.5)) — Python's round() is banker's rounding and
    yields k=2 where the reference yields k=3 for mean/2 == 2.5."""
    import math

    if not masses:
        return 2
    mean = sum(masses) / len(masses)
    return max(int(math.floor(mean / 2.0 + 0.5)), 2)
