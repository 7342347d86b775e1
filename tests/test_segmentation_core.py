"""Conformance tests for the tokenizer / sentence splitter / assembly core.

Fixtures are ports of the reference's unit tests
(DocumentFactoryTest.java, DocumentModelTest.java) — the semantics they pin
(sentence counts, token offsets, whitespace-exact round-trip) are the
per-turn invariants of the engine (FIXTURES.md §2).
"""

from texoo_ray.core.document import Document, Newlines, segment_text
from texoo_ray.core.spans import (
    Token,
    tokens_from_tokenized_text,
    tokens_to_text,
    tokens_in_range,
)
from texoo_ray.core.tokenizer import tokenize

DEMENTIA_TEXT = (
    "Dementia\nSeveral specific diagnostic criteria can be used to diagnose vascular "
    "dementia, including the Diagnostic and Statistical Manual of Mental Disorders, "
    "Fourth Edition (DSM-IV) criteria, the International Classification of Diseases, "
    "Tenth Edition (ICD-10) criteria, the National Institute of Neurological Disorders "
    "and Stroke criteria, Association Internationale pour la Recherche et l'Enseignement "
    "en Neurosciences (NINDS-AIREN) criteria, the Alzheimer's Disease Diagnostic and "
    "Treatment Center criteria, and the Hachinski Ischemic Score (after Vladimir "
    "Hachinski).\nThe recommended investigations for cognitive impairment include: "
    "blood tests (for anemia, vitamin deficiency, thyrotoxicosis, infection, etc.), "
    "chest X-Ray, ECG, and neuroimaging, preferably a scan with a functional or "
    "metabolic sensitivity beyond a simple CT or CTT. When available as a diagnostic "
    "tool, single photon emission computed tomography (SPECT) and positron emission "
    "tomography (PET) neuroimaging may be used to confirm a diagnosis of multi-infarct "
    "dementia in conjunction with evaluations involving mental status examination "
    "tests. In a person already having dementia, SPECT appears to be superior in "
    "differentiating multi-infarct dementia from Alzheimer's disease, compared to the "
    "usual mental testing and medical history analysis."
)

MED_TEXT = (
    "Aspirin has an antiplatelet effect (e.g. preventing heart attacts, strokes and "
    "blood clot formation) by stopping the binding together of platelets [1]. "
    "Aspirin is also known as acetylsalicylic acid."
)

DE_TEXT = "Prof. Dr. Alexander Löser ist Professor an der Beuth Hochschule für Technik Berlin."


class TestSentenceSplitting:
    def test_discard(self):
        """DocumentFactoryTest.java:38-49"""
        doc = segment_text(DEMENTIA_TEXT, Newlines.DISCARD)
        assert doc.count_sentences() == 5
        assert doc.sentences[0].text() == "Dementia"
        assert doc.sentences[1].tokens[0].text == "Several"
        assert doc.sentences[2].tokens[0].text == "The"
        assert doc.sentences[3].tokens[0].text == "When"
        assert doc.sentences[4].tokens[0].text == "In"
        assert doc.text() == DEMENTIA_TEXT.replace("\n", " ")

    def test_keep(self):
        """DocumentFactoryTest.java:52-58"""
        doc = segment_text(DEMENTIA_TEXT, Newlines.KEEP)
        assert doc.count_sentences() == 5
        assert doc.text() == DEMENTIA_TEXT
        assert doc.sentences[0].text() == "Dementia\n"

    def test_sentence_boundaries_ellipses(self):
        """DocumentFactoryTest.java:61-67: '....' runs are not boundaries."""
        text = (
            "Human rights in Tanzania.\nThe issue of human rights in Tanzania, a nation "
            "with a 2012 population of 44,928,923, is hard. In its 2013 Freedom in the "
            'World report, Freedom House declared the country "Partly Free".\nHuman '
            "rights concerns.\nThe United Nations Human Rights Council in October 2011 "
            "at its meeting in Geneva completed a Universal Periodic Review (UPR) of the "
            "human rights situation in Tanzania. At this UPR, the United Nations Country "
            "Team (UNCT) and several countries addressed various problems in Tanzania.\n"
            "Gender equality.\nNational reviews and assessments of equality between men "
            "and women... have identified a range of challenges..., which continue to "
            "prevail. These include the persistent and increasing burden of poverty on "
            "women; inequalities in arrangements for productive activities and in access "
            "to resources; inequalities in the sharing of power and decision-making; "
            "lack of respect for and inadequate promotion and protection of the human "
            "rights of women; and inequalities in managing natural resources and "
            "safeguarding the environment.... Particular attention should be drawn to "
            "the widespread marginalization of the girl child in different spheres of "
            "life, including education, and the total exclusion caused for many by "
            "early and forced marriage.... Gender-based violence is prevalent."
        )
        doc = segment_text(text, Newlines.DISCARD)
        assert doc.count_sentences() == 9
        assert doc.text() == text.replace("\n", " ")

    def test_double_newlines_keep(self):
        """DocumentFactoryTest.java:107-113"""
        text = "sentence.\n\nEEG:\nEEG Lorem ipsum dolor"
        doc = segment_text(text, Newlines.KEEP)
        assert doc.text() == text
        assert doc.sentences[0].text() == "sentence.\n\n"

    def test_double_newlines_discard_compacts_runs(self):
        text = "sentence.\n\nEEG:\nEEG Lorem ipsum dolor"
        doc = segment_text(text, Newlines.DISCARD)
        assert doc.text() == "sentence. EEG: EEG Lorem ipsum dolor"

    def test_enumeration(self):
        """DocumentFactoryTest.java:122-127: '1.' is not a boundary."""
        text = "They describe the process in three stages:\n1. Adaptive stage."
        doc = segment_text(text, Newlines.KEEP)
        assert doc.count_sentences() == 2

    def test_nbsp_is_whitespace(self):
        """DocumentFactoryTest.java:97-104 (testEscapedChars)"""
        text = "An-at by the scribes in 879 . The name has been connected."
        doc = segment_text(text, Newlines.DISCARD)
        assert doc.text() == text.replace(" ", " ")

    def test_empty_and_whitespace_only(self):
        assert segment_text("", Newlines.KEEP).count_sentences() == 0
        assert segment_text("   \t ", Newlines.KEEP).count_sentences() == 0
        assert segment_text("", Newlines.KEEP).text() == ""

    def test_no_boundary_whole_string(self):
        doc = segment_text("just a fragment without end", Newlines.KEEP)
        assert doc.count_sentences() == 1
        assert doc.text() == "just a fragment without end"


class TestTokenization:
    def test_tab_text_keep(self):
        """DocumentModelTest.java:67-93 (testTokenization)"""
        tab_text = "123\tabc\n\n\nxyz  789\t\n 456 "
        spc_text = "123 abc\n\n\nxyz  789 \n 456"
        doc = segment_text(tab_text, Newlines.KEEP)
        assert doc.count_sentences() == 3
        assert doc.count_tokens() == 9
        assert doc.begin == 0
        assert doc.end == len(spc_text)
        s0 = doc.sentences[0]
        assert (s0.tokens[0].text, s0.tokens[0].begin, s0.tokens[0].end) == ("123", 0, 3)
        assert (s0.tokens[1].text, s0.tokens[1].begin, s0.tokens[1].end) == ("abc", 4, 7)
        assert (s0.tokens[2].text, s0.tokens[2].begin, s0.tokens[2].end) == ("\n", 7, 8)
        s1 = doc.sentences[1]
        assert (s1.tokens[0].text, s1.tokens[0].begin, s1.tokens[0].end) == ("xyz", 10, 13)
        assert (s1.tokens[1].text, s1.tokens[1].begin, s1.tokens[1].end) == ("789", 15, 18)
        s2 = doc.sentences[2]
        assert (s2.tokens[0].text, s2.tokens[0].begin, s2.tokens[0].end) == ("456", 21, 24)
        assert doc.text() == spc_text

    def test_med_text(self):
        """DocumentModelTest.java:118-135 (testPreprocessor)"""
        doc = segment_text(MED_TEXT, Newlines.DISCARD)
        assert doc.count_sentences() == 2
        assert doc.count_tokens() == 36
        assert doc.begin == 0
        assert doc.end == 198
        assert doc.text() == MED_TEXT
        s0 = doc.sentences[0]
        assert s0.tokens[5].text == "("
        assert s0.tokens[6].text == "e.g."
        assert s0.tokens[25].text == "1"
        s1 = doc.sentences[1]
        assert s1.tokens[0].begin == 152
        assert s1.tokens[0].length == 7
        assert s1.tokens[0].end == 159

    def test_de_text(self):
        """DocumentModelTest.java:136-146"""
        doc = segment_text(DE_TEXT, Newlines.DISCARD)
        assert doc.count_sentences() == 1
        assert doc.count_tokens() == 14
        assert doc.end == 83
        assert doc.text() == DE_TEXT
        s = doc.sentences[0]
        assert s.tokens[1].text == "Dr."
        assert s.tokens[3].text == "Löser"

    def test_hurricane_tokens(self):
        """DocumentFactoryTest.java:77-93 (testSentenceCreation)"""
        text1 = (
            "Nearing the coast of Mexico, the depression attained its peak intensity "
            "with winds of 35 mph (55 km/h) and a minimum pressure of 1,007 mbar "
            "(29.7 inHg)."
        )
        doc1 = segment_text(text1, Newlines.DISCARD)
        assert doc1.text() == text1
        assert doc1.count_tokens() == 33
        text2 = (
            "The National Hurricane Center issued the final advisory on July 7,[16] "
            "although the circulation persisted until July 9 southwest of Texas.[32]"
        )
        doc2 = segment_text(text2, Newlines.DISCARD)
        assert doc2.text() == text2
        assert doc2.count_tokens() == 29

    def test_clitics(self):
        assert tokenize("Python's") == ["Python", "'s"]
        assert tokenize("don't") == ["do", "n't"]
        assert tokenize("Jones-Davies") == ["Jones-Davies"]
        assert tokenize("km/h") == ["km/h"]
        assert tokenize("1,007") == ["1,007"]
        assert tokenize("(etc.),") == ["(", "etc.", ")", ","]
        assert tokenize("***LIST***") == ["***", "LIST", "***"]
        assert tokenize("challenges...,") == ["challenges", "...", ","]


class TestTokenizedText:
    def test_round_trip(self):
        """DocumentFactoryTest.java:96-104 + DocumentModelTest.java:50-64"""
        tokens1 = (
            "Nearing the coast of Mexico , the depression attained its peak intensity "
            "with winds of 35 mph ( 55 km/h ) and a minimum pressure of 1,007 mbar "
            "( 29.7 inHg ) ."
        )
        text1 = (
            "Nearing the coast of Mexico, the depression attained its peak intensity "
            "with winds of 35 mph (55 km/h) and a minimum pressure of 1,007 mbar "
            "(29.7 inHg)."
        )
        toks = tokens_from_tokenized_text(tokens1)
        assert len(toks) == 33
        assert tokens_to_text(toks, 0) == text1
        assert " ".join(t.text for t in toks) == tokens1

        tokens2 = "The National Hurricane Center issued the final advisory on July 7 , [16] although the circulation persisted until July 9 southwest of Texas . [32]"
        text2 = "The National Hurricane Center issued the final advisory on July 7, [16] although the circulation persisted until July 9 southwest of Texas. [32]"
        toks2 = tokens_from_tokenized_text(tokens2)
        assert len(toks2) == 25
        assert tokens_to_text(toks2, 0) == text2

    def test_offsets(self):
        """DocumentModelTest.java:50-64 (testCreateDocument)"""
        toks = tokens_from_tokenized_text(
            "Zairean Prime Minister Kengo wa Dondo said at the end of a visit ."
        )
        assert len(toks) == 14
        assert (toks[0].begin, toks[0].end) == (0, 7)
        assert (toks[1].begin, toks[1].end) == (8, 13)
        assert toks[-1].end == 65


class TestRangeQueries:
    def test_enclosed_and_overlapping(self):
        """DocumentModelTest.java (testRangeQueries): antiplatelet=15-27, effect=28-34"""
        doc = segment_text(MED_TEXT, Newlines.DISCARD)
        toks = doc.tokens()

        def texts(begin, end, enclosed):
            return [t.text for t in tokens_in_range(toks, begin, end, enclosed)]

        assert texts(0, 7, True) == ["Aspirin"]
        assert texts(15, 27, True) == ["antiplatelet"]
        assert texts(16, 27, True) == []
        assert texts(14, 27, True) == ["antiplatelet"]
        assert texts(15, 34, True) == ["antiplatelet", "effect"]
        assert texts(16, 27, False) == ["antiplatelet"]
        assert texts(15, 28, False) == ["antiplatelet"]
        assert texts(15, 29, False) == ["antiplatelet", "effect"]
        assert len(texts(12, 34, False)) == 3
