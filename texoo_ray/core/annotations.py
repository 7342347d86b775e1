"""Span↔annotation alignment helpers.

Mirrors AnnotationHelpers.java:20-163 in
/root/reference/texoo-core/src/main/java/de/datexis/common/: aligning
annotations to spans by character overlap (max-overlap wins) and merging
overlapping annotations. All row-local (data is co-located per turn) —
used inside ``map_batches``, never a shuffle (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from .spans import span_overlap_length, spans_intersect


def annotations_for_span(
    span_begin: int, span_end: int, annotations: Sequence[Dict]
) -> List[Dict]:
    """All annotations intersecting [span_begin, span_end)
    (streamAnnotationsForSpan)."""
    return [
        a
        for a in annotations
        if spans_intersect(span_begin, span_end, a["begin"], a["end"])
    ]


def max_overlap_annotation(
    span_begin: int, span_end: int, annotations: Sequence[Dict]
) -> Optional[Dict]:
    """The annotation with the largest character overlap with the span;
    ties resolve to the earlier (begin, end) annotation
    (getAnnotationMaxOverlap)."""
    best: Optional[Dict] = None
    best_ov = 0
    for a in sorted(annotations, key=lambda x: (x["begin"], x["end"])):
        ov = span_overlap_length(span_begin, span_end, a["begin"], a["end"])
        if ov > best_ov:
            best, best_ov = a, ov
    return best


def merge_overlapping(annotations: Sequence[Dict]) -> List[Dict]:
    """Merge overlapping annotations into their span union, keeping the
    metadata (type/source/confidence) of the longest constituent
    (mergeAnnotations, :145-163). Output sorted by (begin, end)."""
    anns = sorted(annotations, key=lambda a: (a["begin"], a["end"]))
    out: List[Dict] = []
    for a in anns:
        if out and spans_intersect(out[-1]["begin"], out[-1]["end"], a["begin"], a["end"]):
            prev = out[-1]
            keeper = prev if (prev["end"] - prev["begin"]) >= (a["end"] - a["begin"]) else a
            merged = dict(keeper)
            merged["begin"] = min(prev["begin"], a["begin"])
            merged["end"] = max(prev["end"], a["end"])
            out[-1] = merged
        else:
            out.append(dict(a))
    return out


def resolve_sources(
    annotations: Sequence[Dict], priority: Sequence[str] = ("GOLD", "PRED", "SILVER")
) -> List[Dict]:
    """Deduplicate annotations from multiple sources: where spans overlap,
    keep the one whose source ranks highest (then the longer span). The
    multi-annotator resolution the reference applies implicitly by running
    one annotator at a time."""
    rank = {s: i for i, s in enumerate(priority)}
    anns = sorted(
        annotations,
        key=lambda a: (a["begin"], a["end"], rank.get(a.get("source", ""), len(rank))),
    )
    out: List[Dict] = []
    for a in anns:
        overlapping = [
            i
            for i, b in enumerate(out)
            if spans_intersect(b["begin"], b["end"], a["begin"], a["end"])
        ]
        if not overlapping:
            out.append(dict(a))
            continue
        keep = True
        for i in overlapping:
            b = out[i]
            rb = rank.get(b.get("source", ""), len(rank))
            ra = rank.get(a.get("source", ""), len(rank))
            if rb < ra or (rb == ra and (b["end"] - b["begin"]) >= (a["end"] - a["begin"])):
                keep = False
                break
        if keep:
            for i in sorted(overlapping, reverse=True):
                del out[i]
            out.append(dict(a))
    return sorted(out, key=lambda a: (a["begin"], a["end"]))
