"""Annotation alignment helpers (AnnotationHelpers analogues)."""

from texoo_ray.core.annotations import (
    annotations_for_span,
    max_overlap_annotation,
    merge_overlapping,
    resolve_sources,
)


def ann(b, e, source="PRED", mtype="GENERIC"):
    return {"begin": b, "end": e, "source": source, "type": mtype, "text": "", "confidence": 1.0}


class TestAlignment:
    def test_for_span(self):
        anns = [ann(0, 5), ann(4, 10), ann(20, 25)]
        hits = annotations_for_span(3, 8, anns)
        assert [(a["begin"], a["end"]) for a in hits] == [(0, 5), (4, 10)]

    def test_max_overlap(self):
        anns = [ann(0, 5), ann(4, 12)]
        best = max_overlap_annotation(3, 10, anns)
        assert (best["begin"], best["end"]) == (4, 12)  # overlap 6 > 2
        assert max_overlap_annotation(50, 60, anns) is None


class TestMerge:
    def test_merge_overlapping(self):
        anns = [ann(0, 5, mtype="A"), ann(3, 12, mtype="B"), ann(20, 22)]
        out = merge_overlapping(anns)
        assert [(a["begin"], a["end"]) for a in out] == [(0, 12), (20, 22)]
        assert out[0]["type"] == "B"  # longer constituent's metadata wins

    def test_no_overlap_passthrough(self):
        anns = [ann(0, 3), ann(5, 8)]
        assert merge_overlapping(anns) == anns

    def test_chain_merge(self):
        anns = [ann(0, 4), ann(3, 7), ann(6, 10)]
        out = merge_overlapping(anns)
        assert [(a["begin"], a["end"]) for a in out] == [(0, 10)]


class TestResolveSources:
    def test_gold_beats_pred(self):
        anns = [ann(0, 5, "PRED"), ann(2, 7, "GOLD")]
        out = resolve_sources(anns)
        assert [(a["begin"], a["end"], a["source"]) for a in out] == [(2, 7, "GOLD")]

    def test_disjoint_kept(self):
        anns = [ann(0, 5, "PRED"), ann(10, 15, "SILVER")]
        out = resolve_sources(anns)
        assert len(out) == 2

    def test_same_source_longer_wins(self):
        anns = [ann(0, 5, "PRED"), ann(2, 10, "PRED")]
        out = resolve_sources(anns)
        assert [(a["begin"], a["end"]) for a in out] == [(2, 10)]
