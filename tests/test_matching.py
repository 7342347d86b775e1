"""Gazetteer matching conformance tests (ports of MatchingAnnotatorTest.java)."""

from texoo_ray.core.document import Newlines, segment_text
from texoo_ray.core.matching import (
    Gazetteer,
    MatchingStrategy,
    convert_terms,
    convert_to_lowercase,
)

CANCER_TEXT = (
    "Cancer immunotherapy (sometimes called immuno-oncology) is the use of the "
    "immune system to treat cancer. Immunotherapies can be categorized as active, "
    "passive or hybrid (active and passive). These approaches exploit the fact that "
    "cancer cells often have molecules on their surface that can be detected by the "
    "immune system, known as tumour-associated antigens (TAAs); they are often "
    "proteins or other macromolecules (e.g. carbohydrates). Active immunotherapy "
    "directs the immune system to attack tumor cells by targeting TAAs. Passive "
    "immunotherapies enhance existing anti-tumor responses and include the use of "
    "monoclonal antibodies, lymphocytes and cytokines."
)

TERMS = ["tum", "cancer", "immune system", "molecules", "TAA", "immunotherapy", "tumor", "tumor cells", "e"]


def annotate(text, gaz):
    doc = segment_text(text, Newlines.DISCARD)
    return gaz.annotate(doc.text(), doc.tokens())


class TestCaseSensitive:
    def test_counts(self):
        """MatchingAnnotatorTest.testCaseSensitive: 9 distinct terms; matches
        only at token boundaries; longest-match non-overlap.

        Note: the reference asserts 8 annotations with its
        SetBackwardOracleMatching backend, whose LONGEST_MATCH the
        reference's own comment calls invalid (MatchingAnnotator.java:119-121).
        Our leftmost-longest matcher finds the documented semantics' 9:
        cancer x2, immunotherapy x2, immune system x3, molecules x1,
        tumor cells x1."""
        gaz = Gazetteer(TERMS, MatchingStrategy.CASE_SENSITIVE)
        assert len(gaz.terms) == 9
        mentions = annotate(CANCER_TEXT, gaz)
        texts = sorted(m["text"] for m in mentions)
        assert texts.count("cancer") == 2
        assert texts.count("immune system") == 3
        assert texts.count("molecules") == 1
        assert texts.count("immunotherapy") == 2
        assert texts.count("tumor cells") == 1
        # no substring hits: "TAA" inside "TAAs", "tum" inside words, "e" inside "e.g."
        assert "TAA" not in texts and "tum" not in texts and "e" not in texts
        assert len(mentions) == 9
        assert all(m["source"] == "SILVER" for m in mentions)

    def test_empty_gazetteer(self):
        gaz = Gazetteer([], MatchingStrategy.CASE_SENSITIVE)
        assert annotate(CANCER_TEXT, gaz) == []


class TestLowercase:
    def test_min_length_filter(self):
        """'e' is too short under LOWERCASE (min length 3)."""
        gaz = Gazetteer(TERMS, MatchingStrategy.LOWERCASE)
        assert len(gaz.terms) == 8

    def test_lowercase_matching(self):
        gaz = Gazetteer(TERMS, MatchingStrategy.LOWERCASE)
        mentions = annotate(CANCER_TEXT, gaz)
        texts = [m["text"] for m in mentions]
        # "Cancer" (capitalized, sentence-initial) now matches too
        assert texts.count("Cancer") + texts.count("cancer") == 3
        assert len(mentions) == 10

    def test_uppercase_acronyms_preserved(self):
        """MatchingAnnotatorTest.testLowercase second part: short all-caps
        words are not lowercased."""
        gaz = Gazetteer(["NOT", "TEST"], MatchingStrategy.LOWERCASE)
        assert annotate("This is not a test. Really?", gaz) == []
        assert len(annotate("This is NOT a TEST", gaz)) == 2
        gaz2 = Gazetteer(["NOT", "TEST", "not", "test"], MatchingStrategy.LOWERCASE)
        assert len(annotate("This is not a test. Really?", gaz2)) == 2

    def test_convert_to_lowercase(self):
        """MatchingAnnotatorTest.testLowercaseMethod."""
        text = (
            "The Immune System, I have known as Tumour-Associated Antigens (TAA). "
            "Antigens are often Proteins or other Macromolecules (e.g. carbohydrates C544)."
        )
        expected = (
            "The immune system, I have known as tumour-associated antigens (TAA). "
            "antigens are often proteins or other macromolecules (e.g. carbohydrates C544)."
        )
        assert convert_to_lowercase(text) == expected

    def test_cars(self):
        """MatchingAnnotatorTest.testCars: longest-match priority and
        uppercase-term behavior with min_word_length=2."""
        text = (
            "Der Volkswagen Caddy (2K), auch VW Caddy Life genannt, ist ein "
            "PKW-Modell der Marke Volkswagen Nutzfahrzeuge."
        )
        gaz = Gazetteer(
            ["Volkswagen Caddy", "VW", "Caddy Life", "IST"],
            MatchingStrategy.LOWERCASE,
            mention_type="CAR",
            min_word_length=2,
        )
        assert len(gaz.terms) == 4
        mentions = sorted(annotate(text, gaz), key=lambda m: (m["begin"], m["end"]))
        assert [m["text"] for m in mentions] == ["Volkswagen Caddy", "VW", "Caddy Life"]
        assert all(m["type"] == "CAR" for m in mentions)


class TestConvertTerms:
    def test_dedup(self):
        assert convert_terms(["abc", "abc", "xy"]) == ["abc", "xy"]

    def test_skip_stopwords(self):
        out = convert_terms(
            ["the", "cancer", "ab"], MatchingStrategy.SKIP_STOPWORDS
        )
        assert out == ["cancer"]

    def test_sorted_by_length_desc(self):
        out = convert_terms(["abc", "abcdef"], MatchingStrategy.LOWERCASE)
        assert out == ["abcdef", "abc"]
