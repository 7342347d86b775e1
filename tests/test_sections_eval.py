"""SECTOR section heuristics + segmentation/NER eval tests."""

import numpy as np
import pytest

from texoo_ray.core.document import Newlines, segment_text
from texoo_ray.core.evaluation import (
    calculate_k,
    masses_array,
    mention_match_counts,
    pk,
    positions_array,
    prf1,
    window_diff,
)
from texoo_ray.core.features import sentence_embedding
from texoo_ray.core.sections import (
    bemd_deviation,
    detect_edges,
    deviation,
    directional_context,
    emd_deviation,
    gaussian_smooth,
    sections_from_edges,
    sections_from_newlines,
    sections_from_target_labels,
)

PARA_TEXT = (
    "The heart pumps blood. It beats every second. Cardiac muscle is strong.\n"
    "Stocks fell on Monday. Markets were volatile. Traders sold shares quickly.\n"
    "The recipe needs flour. Mix the dough well. Bake for thirty minutes.\n"
)


def make_doc():
    return segment_text(PARA_TEXT, Newlines.KEEP)


class TestNewlineSections:
    def test_paragraph_sections(self):
        """applySectionsFromNewlines: one section per newline-closed run."""
        doc = make_doc()
        secs = sections_from_newlines(doc.sentences, doc.end)
        assert len(secs) == 3
        # contiguous, covering the document
        assert secs[0]["begin"] == doc.begin
        assert secs[-1]["end"] == doc.end
        for a, b in zip(secs, secs[1:]):
            assert a["end"] <= b["begin"]

    def test_no_newline_tail(self):
        doc = segment_text("One sentence. Two sentence.", Newlines.KEEP)
        secs = sections_from_newlines(doc.sentences, doc.end)
        assert len(secs) == 1
        assert secs[0]["end"] == doc.end

    def test_empty(self):
        assert sections_from_newlines([], None) == []


class TestEdges:
    def test_detect_edges_local_maxima(self):
        dev = np.array([0.0, 0.1, 0.9, 0.1, 0.2, 0.8, 0.3])
        edges = detect_edges(dev)
        assert edges.tolist() == [1, 0, 1, 0, 0, 1, 0]

    def test_first_always_edge(self):
        dev = np.zeros(4)
        assert detect_edges(dev)[0] == 1

    def test_fixed_count(self):
        dev = np.array([0.0, 0.1, 0.9, 0.1, 0.2, 0.8, 0.3])
        edges = detect_edges(dev, count=2)  # N-1 = 1 peak picked
        assert edges[0] == 1
        assert edges.sum() == 2
        assert edges[2] == 1  # highest peak

    def test_fixed_count_fills_by_magnitude(self):
        dev = np.array([0.0, 0.5, 0.6, 0.7, 0.8])  # monotone: no interior peaks
        edges = detect_edges(dev, count=3)
        assert edges[0] == 1
        assert edges.sum() == 3  # filled from highest magnitudes (idx 4, 3)
        assert edges[4] == 1 and edges[3] == 1

    def test_none(self):
        assert detect_edges(None) is None


class TestSectionsFromEdges:
    def test_basic(self):
        doc = make_doc()
        n = len(doc.sentences)
        edges = np.zeros(n)
        edges[0] = 1
        edges[3] = 1
        edges[6] = 1
        secs = sections_from_edges(doc.sentences, edges, doc.end)
        assert len(secs) == 3
        assert secs[0]["begin"] == doc.sentences[0].begin
        assert secs[1]["begin"] == doc.sentences[3].begin
        assert secs[2]["end"] == doc.sentences[-1].end

    def test_single_sentence(self):
        doc = segment_text("Only one sentence here.", Newlines.KEEP)
        secs = sections_from_edges(doc.sentences, None, doc.end)
        assert len(secs) == 1

    def test_empty_doc(self):
        assert sections_from_edges([], None) == []


class TestEmbeddingDeviation:
    def test_emd_deterministic_and_shaped(self):
        doc = make_doc()
        emb = np.stack([sentence_embedding(s.tokens) for s in doc.sentences])
        dev1 = emd_deviation(emb)
        dev2 = emd_deviation(emb.copy())
        assert dev1 is not None
        assert dev1.shape == (len(doc.sentences),)
        assert np.allclose(dev1, dev2)
        assert dev1[0] == 0.0

    def test_emd_single_sentence_none(self):
        assert emd_deviation(np.ones((1, 8))) is None

    def test_bemd_pipeline(self):
        doc = make_doc()
        emb = np.stack([sentence_embedding(s.tokens) for s in doc.sentences])
        fw, bw = directional_context(emb)
        dev = bemd_deviation(fw, bw)
        assert dev is not None and dev.shape[0] == emb.shape[0]
        edges = detect_edges(dev)
        secs = sections_from_edges(doc.sentences, edges, doc.end)
        assert len(secs) >= 1
        assert secs[0]["begin"] == doc.begin
        assert secs[-1]["end"] == doc.end

    def test_gaussian_smooth_weights(self):
        m = np.eye(3)
        sm = gaussian_smooth(m, 1.0)
        # row t is the gaussian kernel centred at t
        assert sm[0, 0] > sm[0, 1] > sm[0, 2]
        assert sm[1, 0] == pytest.approx(sm[1, 2])

    def test_deviation_identical_rows_zero(self):
        m = np.ones((4, 8))
        assert np.allclose(deviation(m), 0.0)


class TestMaxStrategy:
    def test_label_switch(self):
        doc = make_doc()
        n = len(doc.sentences)
        labels = ["heart", "market", "recipe"]
        lm = np.eye(3)
        preds = np.zeros((n, 3))
        for i in range(n):
            preds[i, i // 3] = 1.0
        secs = sections_from_target_labels(doc.sentences, preds, lm, labels, k=1)
        assert [s["label"] for s in secs] == labels
        assert len(secs) == 3


class TestSegmentationEval:
    def test_positions_masses_round_trip(self):
        pos = positions_array([3, 6, 3, 2, 4])
        assert masses_array(pos) == [3, 6, 3, 2, 4]

    def test_pk_perfect(self):
        ref = positions_array([3, 3, 3])
        assert pk(ref, ref, 2) == 0.0
        assert window_diff(ref, ref, 2) == 0.0

    def test_pk_known_value(self):
        ref = positions_array([2, 3])
        hyp = positions_array([5])
        k = 2
        # windows (t, t+2) over 5 positions: 3 windows; ref disagrees where
        # boundary inside window
        val = pk(ref, hyp, k)
        assert 0.0 < val <= 1.0

    def test_two_sentence_special_case(self):
        assert pk([1, 2], [1, 1], 2) == 1.0
        assert pk([1, 2], [1, 2], 2) == 0.0
        assert window_diff([1, 1], [1, 2], 2) == 1.0

    def test_single_sentence(self):
        assert pk([1], [1], 2) == 0.0

    def test_calculate_k(self):
        assert calculate_k([4, 4, 4]) == 2
        assert calculate_k([10, 10]) == 5
        assert calculate_k([1]) == 2
        assert calculate_k([]) == 2

    def test_calculate_k_java_round(self):
        # mean 5 -> mean/2 = 2.5: Java Math.round gives 3 where Python's
        # banker's round() would give 2 (SegmentationEvaluation.calculateK)
        assert calculate_k([5, 5]) == 3
        assert calculate_k([7]) == 4  # 3.5 -> 4


class TestNerEval:
    def test_strong_weak(self):
        gold = [{"begin": 0, "end": 5}, {"begin": 10, "end": 15}]
        pred = [{"begin": 0, "end": 5}, {"begin": 11, "end": 15}]
        tp, ng, npred = mention_match_counts(gold, pred, weak=False)
        assert (tp, ng, npred) == (1, 2, 2)
        tp_w, _, _ = mention_match_counts(gold, pred, weak=True)
        assert tp_w == 2
        m = prf1(tp, ng, npred)
        assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["f1"] == 0.5

    def test_empty(self):
        assert mention_match_counts([], [], weak=False) == (0, 0, 0)
        assert prf1(0, 0, 0) == {"precision": 0.0, "recall": 0.0, "f1": 0.0}


# --- BLEU-2 sufficient statistics ------------------------------------------


def _bleu_ref(text: str):
    """Per-doc clipped counts, the slow obvious way."""
    import re
    from collections import Counter

    ref = re.findall(r"\w+", text.lower())
    cand = [
        "xnoisex" if (i + 1) % 3 == 0 else w for i, w in enumerate(ref)
    ]
    m1 = sum(
        min(c, Counter(ref)[g]) for g, c in Counter(cand).items()
    )
    rb = Counter(zip(ref, ref[1:]))
    cb = Counter(zip(cand, cand[1:]))
    m2 = sum(min(c, rb[g]) for g, c in cb.items())
    return len(ref), m1, m2


def test_bleu2_stats_matches_bruteforce(ray_session):
    import ray.data

    from texoo_ray.pipelines.evaluate import bleu2_stats

    texts = [
        "the cat sat on the mat and the cat sat again",
        "a b c a b c a b c",
        "one two",
        "",
        "xnoisex appears xnoisex here literally in the source text",
        "word",
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    for blocks in (1, 4):
        out = (
            bleu2_stats(ray.data.from_items(rows, override_num_blocks=blocks))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for i, t in enumerate(texts):
            n, m1, m2 = _bleu_ref(t)
            assert out.loc[i, "n_words"] == n
            assert out.loc[i, "match1"] == m1
            assert out.loc[i, "match2"] == m2


# --- chrF sufficient statistics ----------------------------------------------


def _chrf_ref(text: str, max_n=3, sub_every=7, sub_char="q"):
    """Per-doc clipped char n-gram counts, the slow obvious way."""
    import re
    from collections import Counter

    # RE2's \s is [ \t\n\r\f] (NO \v/\x0b, unlike Python re) — both the
    # Arrow engine kernel and the DuckDB oracle are RE2, so the slow
    # reference must use the RE2 class explicitly.
    s = re.sub(r"[ \t\n\r\f]+", "", text)
    cand = "".join(
        sub_char if (i + 1) % sub_every == 0 else ch
        for i, ch in enumerate(s)
    )
    out = [len(s)]
    for n in range(1, max_n + 1):
        rg = Counter(s[i : i + n] for i in range(len(s) - n + 1))
        cg = Counter(cand[i : i + n] for i in range(len(cand) - n + 1))
        out.append(sum(min(c, rg[g]) for g, c in cg.items()))
    return out


def test_chrf_stats_matches_bruteforce(ray_session):
    import ray.data

    from texoo_ray.pipelines.evaluate import chrf_stats

    texts = [
        "the cat sat on the mat",
        "aaaaaaaaaaaaaaaaaaaaaa",
        "q qq qqq already has the sub char q",
        "tabs\tand\nnewlines \x0b mixed   spaces",
        "unicode: naïve café 北京市 🦊🦊 emoji",
        "ab",
        "",
        "   \t\n  ",
        "x",
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    for blocks in (1, 4):
        out = (
            chrf_stats(ray.data.from_items(rows, override_num_blocks=blocks))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for i, t in enumerate(texts):
            want = _chrf_ref(t)
            got = [
                int(out.loc[i, c])
                for c in ("n_chars", "cmatch1", "cmatch2", "cmatch3")
            ]
            assert got == want, (t, got, want)


def test_chrf_stats_doc_chunking_path(ray_session):
    """Force docs_per=1 equivalence by monkey-free construction: a
    dictionary-heavy batch (many distinct codepoints) must agree with
    the brute force regardless of the int64 chunk guard."""
    import ray.data

    from texoo_ray.pipelines.evaluate import chrf_stats

    # ~1300 distinct codepoints => m**3 ~ 2.2e9, docs_per still large;
    # the correctness claim is the packed-key math, checked per doc.
    texts = [
        "".join(chr(0x4E00 + (i * 7 + j) % 1300) for j in range(50))
        for i in range(6)
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    out = (
        chrf_stats(ray.data.from_items(rows, override_num_blocks=2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        want = _chrf_ref(t)
        got = [
            int(out.loc[i, c])
            for c in ("n_chars", "cmatch1", "cmatch2", "cmatch3")
        ]
        assert got == want


def test_bemd_planted_residue_table_pinned():
    """BEMD_RESIDUE_SECTIONS (embedded as literals in the bemd_planted
    SQL oracle) must equal what the single-process core chain computes
    for every residue — so the oracle can never drift from the code —
    and must exercise real variety (all of 1..5 section counts)."""
    from texoo_ray.core.planted import (
        BEMD_CYCLE,
        BEMD_RESIDUE_SECTIONS,
        bemd_planted_text,
        bemd_sections_for_residue,
    )

    got = [bemd_sections_for_residue(r) for r in range(BEMD_CYCLE)]
    assert got == BEMD_RESIDUE_SECTIONS
    assert sorted(set(got)) == [1, 2, 3, 4, 5]
    # text depends only on the residue class (the oracle's CASE key)
    assert bemd_planted_text(7) == bemd_planted_text(7 + BEMD_CYCLE * 3)


def test_segmentation_planted_closed_form_matches_core():
    """The generate_series SQL oracle for segmentation_planted rests on
    the identity: boundaries of the every-g segmentation inside probe
    window (t, t+k] number floor((t+k)/g) - floor(t/g). Sweep every
    (n, g, p) residue combination and assert the closed form reproduces
    core pk/window_diff exactly."""
    import math

    from texoo_ray.core.evaluation import (
        calculate_k,
        masses_array,
        pk,
        positions_array,
        window_diff,
    )

    for n in range(18, 25):
        for g in (3, 4, 5):
            for p in (3, 4, 5, 6):
                ref = positions_array(
                    [g] * (n // g) + ([n % g] if n % g else [])
                )
                hyp = positions_array(
                    [p] * (n // p) + ([n % p] if n % p else [])
                )
                k = calculate_k(masses_array(ref))
                # closed form k: n / ceil(n/g) is the mean mass
                k2 = max(
                    int(math.floor((n / math.ceil(n / g)) / 2.0 + 0.5)), 2
                )
                assert k == k2, (n, g)
                pk_dis = wd_dis = total = 0
                for t in range(n - k):
                    if ((t // g) == ((t + k) // g)) != (
                        (t // p) == ((t + k) // p)
                    ):
                        pk_dis += 1
                    if ((t + k) // g - t // g) != ((t + k) // p - t // p):
                        wd_dis += 1
                    total += 1
                assert pk(ref, hyp, k) == pk_dis / total, (n, g, p)
                assert window_diff(ref, hyp, k) == wd_dis / total, (n, g, p)


def test_ner_planted_counts_hand_derived():
    """The ner_planted CASE oracle's counts, hand-derived per residue,
    must equal the real greedy strong/weak counting."""
    from texoo_ray.core.evaluation import mention_match_counts

    def m(b, e):
        return {"begin": b, "end": e}

    gold = [m(10 * j, 10 * j + 4) for j in range(3)]
    preds = {
        0: [m(10 * j, 10 * j + 4) for j in range(3)],
        1: [m(10 * j + 1, 10 * j + 5) for j in range(3)],
        2: [m(0, 4), m(10, 14), m(100, 104)],
        3: [],
        4: [m(0, 4), m(100, 104), m(200, 204)],
    }
    want_strong = {0: 3, 1: 0, 2: 2, 3: 0, 4: 1}
    want_weak = {0: 3, 1: 3, 2: 2, 3: 0, 4: 1}
    for r, pred in preds.items():
        assert mention_match_counts(gold, pred, weak=False)[0] == want_strong[r]
        assert mention_match_counts(gold, pred, weak=True)[0] == want_weak[r]


def test_w2v_planted_residue_table_pinned():
    """W2V_RESIDUE_SECTIONS (the w2v_sections_planted oracle literals)
    must equal the single-process SegmentStage+SectionStage(w2v) chain
    for every residue, through the REAL Word2VecEncoder parquet load."""
    from texoo_ray.core.planted import (
        W2V_CYCLE,
        W2V_RESIDUE_SECTIONS,
        ensure_planted_w2v,
        w2v_planted_text,
        w2v_sections_for_residue,
    )

    p = ensure_planted_w2v("/tmp/texoo_planted_w2v/v1/vectors.parquet")
    got = [w2v_sections_for_residue(r, p) for r in range(W2V_CYCLE)]
    assert got == W2V_RESIDUE_SECTIONS
    assert len(set(got)) >= 4
    assert w2v_planted_text(2) == w2v_planted_text(2 + W2V_CYCLE * 5)
