"""Tag-layer conformance tests (ports of MentionAnnotationTest.java fixtures)."""

import numpy as np
import pytest

from texoo_ray.core.mentions import (
    bioes_tags_from_mentions,
    mention_from_positions,
    mentions_from_bio2,
    mentions_from_bioes,
)
from texoo_ray.core.spans import Sentence, Token, tokens_from_tokenized_text
from texoo_ray.core.tags import (
    BIOES_LABELS,
    bio2_to_bioes,
    bioes_to_bio2,
    confidence_from_scores,
    correct_crf,
    is_correct_bioes,
)


def kengo_sentence():
    """MentionAnnotationTest.java:33-57 fixture."""
    toks = tokens_from_tokenized_text(
        "Zairean Prime Minister Kengo wa Dondo said at the end of a visit ."
    )
    labels = ["B", "B", "I", "B", "I", "I"] + ["O"] * 8
    return Sentence(toks), labels


class TestConversions:
    def test_bio2_to_bioes(self):
        """MentionAnnotationTest.java:60-115 (testSpanTagConversion)."""
        _, labels = kengo_sentence()
        bioes = bio2_to_bioes(labels)
        assert bioes == ["S", "B", "E", "B", "I", "E"] + ["O"] * 8
        assert is_correct_bioes(bioes)

    def test_bioes_to_bio2_round_trip(self):
        _, labels = kengo_sentence()
        assert bioes_to_bio2(bio2_to_bioes(labels)) == labels

    def test_single_b(self):
        assert bio2_to_bioes(["B"]) == ["S"]
        assert bio2_to_bioes(["B", "I"]) == ["B", "E"]
        assert bio2_to_bioes(["I"]) == ["E"]
        assert bio2_to_bioes([]) == []

    def test_validity(self):
        assert is_correct_bioes(["S", "B", "E", "O"])
        assert not is_correct_bioes(["I", "B"])
        assert not is_correct_bioes(["B", "O"])
        assert not is_correct_bioes(["O", "I"])
        assert not is_correct_bioes(["S", "E"])
        assert is_correct_bioes([])
        assert is_correct_bioes(["B"])  # boundary is not checked (partition)


class TestDecode:
    def test_mentions_from_bio2(self):
        """createFromBIO2Tags semantics: runs close at B and O."""
        sent, labels = kengo_sentence()
        mentions = mentions_from_bio2([sent.tokens], labels, source="GOLD")
        texts = [m["text"] for m in mentions]
        assert texts == ["Zairean", "Prime Minister", "Kengo wa Dondo"]
        assert all(m["type"] == "GENERIC" for m in mentions)
        assert all(m["source"] == "GOLD" for m in mentions)
        m = mentions[1]
        assert (m["begin"], m["end"]) == (8, 22)

    def test_i_after_o_starts_mention(self):
        """I after O is treated as B (createFromBIO2Tags :240-246)."""
        toks = tokens_from_tokenized_text("a b c")
        mentions = mentions_from_bio2([toks], ["O", "I", "O"])
        assert [m["text"] for m in mentions] == ["b"]

    def test_run_closes_at_sentence_end(self):
        toks1 = tokens_from_tokenized_text("New York")
        toks2 = tokens_from_tokenized_text("city")
        mentions = mentions_from_bio2([toks1, toks2], ["B", "I", "O"])
        assert [m["text"] for m in mentions] == ["New York"]

    def test_confidence_mean(self):
        toks = tokens_from_tokenized_text("a b c")
        mentions = mentions_from_bio2(
            [toks], ["B", "I", "O"], confidences=[0.8, 0.6, 1.0]
        )
        assert mentions[0]["confidence"] == pytest.approx(0.7)

    def test_bioes_decode(self):
        sent, labels = kengo_sentence()
        mentions = mentions_from_bioes([sent.tokens], bio2_to_bioes(labels))
        assert [m["text"] for m in mentions] == [
            "Zairean",
            "Prime Minister",
            "Kengo wa Dondo",
        ]

    def test_round_trip_tags_mentions_tags(self):
        """annotateFromTags / createTagsFromAnnotations round-trip
        (MentionAnnotationTest.java:150-240)."""
        sent, labels = kengo_sentence()
        mentions = mentions_from_bio2([sent.tokens], labels)
        bioes = bioes_tags_from_mentions(sent.tokens, mentions)
        assert bioes == bio2_to_bioes(labels)

    def test_mention_from_positions(self):
        sent, _ = kengo_sentence()
        m = mention_from_positions(sent.tokens, 8, 22, source="GOLD")
        assert m["text"] == "Prime Minister"
        assert m["begin"] == 8 and m["end"] == 22
        assert mention_from_positions(sent.tokens, 999, 1005) is None


class TestCrfRepair:
    def test_valid_sequence_unchanged(self):
        scores = np.zeros((3, 5))
        for i, l in enumerate(["B", "I", "E"]):
            scores[i, BIOES_LABELS.index(l)] = 1.0
        assert correct_crf(scores) == ["B", "I", "E"]

    def test_invalid_repaired_to_valid(self):
        # argmax sequence is [B, O, E] -- invalid (B->O and O->E)
        scores = np.array(
            [
                [0.1, 0.6, 0.1, 0.1, 0.1],  # B
                [0.05, 0.05, 0.3, 0.1, 0.5],  # O
                [0.05, 0.05, 0.1, 0.6, 0.2],  # E
            ]
        )
        fixed = correct_crf(scores)
        assert is_correct_bioes(fixed)

    def test_deterministic(self):
        rng = np.random.RandomState(7)
        scores = rng.rand(12, 5)
        a = correct_crf(scores)
        b = correct_crf(scores.copy())
        assert a == b
        assert is_correct_bioes(a)

    def test_confidence_from_scores(self):
        scores = np.array([[0.7, 0.1, 0.1, 0.05, 0.05]])
        assert confidence_from_scores(scores, ["S"]) == [pytest.approx(0.7)]
