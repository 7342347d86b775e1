"""Tests for the entity-linking lookup-join and the BoW/Bloom encoders."""

import pyarrow as pa
import pytest

from texoo_ray.stages.encoders import (
    BagOfWordsEncoder,
    BloomFilter,
    build_bloom,
    build_vocab,
)
from texoo_ray.stages.linker import (
    KnowledgeBase,
    LinkerStage,
    jaro_winkler,
    normalize_name,
)
from texoo_ray.stages import schema

KB = [
    ("Q60", "New York City"),
    ("Q937", "Albert Einstein"),
    ("Q7186", "Marie Curie"),
    ("Q90", "Paris"),
]


class TestJaroWinkler:
    def test_identity(self):
        assert jaro_winkler("abc", "abc") == 1.0

    def test_empty(self):
        assert jaro_winkler("", "abc") == 0.0

    def test_known_value(self):
        # classic example: MARTHA vs MARHTA = 0.9611
        assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-4)

    def test_ordering(self):
        assert jaro_winkler("new york", "new york city") > jaro_winkler(
            "new york", "paris"
        )


class TestKB:
    def test_exact(self):
        kb = KnowledgeBase(KB)
        assert kb.link("New York City") == ("Q60", "New York City", 1.0)

    def test_normalized(self):
        kb = KnowledgeBase(KB)
        assert kb.link("  new  YORK city ")[0] == "Q60"

    def test_fuzzy(self):
        kb = KnowledgeBase(KB)
        hit = kb.link("Albert Einstien")  # typo
        assert hit is not None and hit[0] == "Q937"

    def test_miss(self):
        kb = KnowledgeBase(KB)
        assert kb.link("Unrelated Thing") is None

    def test_accent_folding(self):
        kb = KnowledgeBase([("Q1", "Löser")])
        assert normalize_name("Löser") == normalize_name("Loser")
        assert kb.link("Loser")[0] == "Q1"


def _medical_kb():
    """Mirror of the reference KnowledgeBaseTest entities
    (texoo-entity-linking KnowledgeBaseTest.java:25-83)."""
    return KnowledgeBase(
        [
            (
                "Q57055",
                "acetaminophen",
                ["Paracetamol", "Acetamol", "Paracetanol"],
                "common drug for pain and fever",
            ),
            (
                "Q18216",
                "aspirin",
                ["Aspirin", "ASA", "2-Acetoxybenzoic acid"],
                "medication used to treat pain and decrease the risk of heart disease",
            ),
        ]
    )


class TestKnowledgeBaseRetrieval:
    """Semantics mirrored from KnowledgeBaseTest.testMentionRetrieval."""

    def test_exact_alias_top_with_high_similarity(self):
        kb = _medical_kb()
        cands = kb.find_nearest("Aspirin", 10)
        assert cands, "no candidates for Aspirin"
        assert cands[0][0] == "Q18216" and cands[0][2] > 0.99
        assert all(c[0] != "Q57055" for c in cands)

    def test_alias_retrieves_canonical_entity(self):
        kb = _medical_kb()
        cands = kb.find_nearest("Paracetamol", 10)
        assert cands and cands[0][0] == "Q57055" and cands[0][2] > 0.99

    def test_partial_string_retrieves_both_in_order(self):
        kb = _medical_kb()
        cands = kb.find_nearest("ace", 10)
        ids = [c[0] for c in cands]
        assert "Q57055" in ids and "Q18216" in ids
        assert ids.index("Q57055") < ids.index("Q18216")

    def test_garbage_returns_empty(self):
        kb = _medical_kb()
        assert kb.find_nearest("123456", 10) == []

    def test_bm25_candidates_capped_and_ranked(self):
        from texoo_ray.stages.linker import Bm25Index

        idx = Bm25Index(["pain fever drug", "heart disease pain", "unrelated terms"])
        top = idx.query("pain drug")
        assert top[0][0] == 0  # both terms match doc 0
        assert all(i != 2 for i, _ in top)

    def test_context_breaks_ties(self):
        kb = KnowledgeBase(
            [
                ("Q1", "Mercury", [], "roman god of commerce and messenger"),
                ("Q2", "Mercury", [], "planet closest to the sun in the solar system"),
            ]
        )
        # exact match short-circuits to the first entry; go through
        # find_nearest for the context-sensitive ordering
        cands = kb.find_nearest("Mercry", 2, context="the planet orbits the sun")
        assert cands[0][0] == "Q2"
        cands = kb.find_nearest("Mercry", 2, context="the god of commerce")
        assert cands[0][0] == "Q1"


class TestLinkerStage:
    def test_attach_refs(self):
        mentions = [
            [
                {"begin": 0, "end": 13, "text": "New York City", "type": "LOC",
                 "confidence": 1.0, "source": "PRED"},
                {"begin": 20, "end": 27, "text": "nothing", "type": "GENERIC",
                 "confidence": 1.0, "source": "PRED"},
            ]
        ]
        batch = pa.table(
            {"doc_id": pa.array([1], pa.int64()),
             "mentions": pa.array(mentions, schema.MENTION_TYPE)}
        )
        out = LinkerStage(kb_entries=KB)(batch)
        linked = out["linked_mentions"][0].as_py()
        assert linked[0]["ref_id"] == "Q60" and linked[0]["ref_score"] == 1.0
        assert linked[1]["ref_id"] == ""


class TestBloom:
    def test_membership(self):
        bf = BloomFilter()
        for w in ("alpha", "beta", "gamma"):
            bf.add(w)
        assert "alpha" in bf and "beta" in bf
        assert "delta" not in bf  # with 4096 bits / 3 words, no false positive

    def test_merge(self):
        a, b = BloomFilter(), BloomFilter()
        a.add("one")
        b.add("two")
        m = a.merge(b)
        assert "one" in m and "two" in m

    def test_serialization(self):
        bf = BloomFilter()
        bf.add("persist")
        bf2 = BloomFilter.from_bytes(bf.to_bytes())
        assert "persist" in bf2

    def test_encode(self):
        bf = BloomFilter()
        v = bf.encode("hello world")
        assert v.sum() <= 10 and v.sum() > 0


class TestVocabBuild:
    def test_build_and_encode(self, ray_session):
        import ray.data

        tbl = pa.table(
            {"text": ["apple banana apple", "banana cherry", "apple the the"]}
        )
        vocab = build_vocab(ray.data.from_arrow(tbl), min_freq=1, max_size=10)
        assert vocab[0] == "apple"  # count 4... apple=4? apple:3 banana:2
        assert "the" not in vocab  # stopword
        enc = BagOfWordsEncoder(vocab)
        v = enc.encode("apple cherry unknown")
        assert v[enc.index["apple"]] == 1.0
        assert v[enc.index["cherry"]] == 1.0
        assert enc.is_unknown("zzz")

    def test_build_bloom_distributed(self, ray_session):
        import ray.data

        tbl = pa.table({"text": ["aa bb", "cc dd"]})
        bf = build_bloom(ray.data.from_arrow(tbl).repartition(2))
        for w in ("aa", "bb", "cc", "dd"):
            assert w in bf


class TestNgramVocab:
    def test_bigram_counts_across_blocks(self, ray_session):
        import pyarrow as pa
        import ray.data

        from texoo_ray.stages.encoders import build_ngram_vocab

        tbl = pa.table(
            {"text": ["the cat sat", "the cat ran", "dogs bark", None, "The Cat"]}
        )
        out = build_ngram_vocab(
            ray.data.from_arrow(tbl).repartition(3), n=2, top_k=10
        ).to_pandas()
        got = dict(zip(out["ngram"], out["cnt"]))
        assert got["the cat"] == 3  # case-folded, counted across blocks
        assert got["cat sat"] == 1 and got["dogs bark"] == 1
        # ordering: cnt desc then ngram asc
        assert out.iloc[0]["ngram"] == "the cat"


class TestOneHotEncoder:
    def test_train_encode_unknown(self):
        import numpy as np

        from texoo_ray.stages.encoders import OneHotEncoder

        enc = OneHotEncoder.train(["The cat sat.", "The dog."])
        # first-seen order after MinimalLowercase: the, cat, sat, ., dog
        assert enc.vocab[:3] == ["the", "cat", "sat"]
        v = enc.encode("Cat")  # preprocessor lowercases
        assert v.shape == (enc.size,) and v.sum() == 1.0
        assert v[enc.index["cat"]] == 1.0
        assert enc.encode("zebra").sum() == 0.0  # unknown -> zeros
        assert enc.is_unknown("zebra") and not enc.is_unknown("THE")

    def test_min_word_frequency(self):
        from texoo_ray.stages.encoders import OneHotEncoder

        enc = OneHotEncoder.train(["a a b", "a c"], min_word_frequency=2)
        assert enc.vocab == ["a"]


class TestPositionEncoder:
    def test_flags_match_reference_iteration(self):
        import numpy as np

        from texoo_ray.stages.encoders import PositionEncoder

        enc = PositionEncoder()
        # two sentences: 3 tokens + 1 token
        m = enc.encode_each([["a", "b", "c"], ["d"]])
        # columns: beginDoc, beginSent, endSent, endDoc
        assert m.shape == (4, 4)
        assert m[0].tolist() == [1.0, 1.0, 0.0, 0.0]  # doc+sent begin
        assert m[1].tolist() == [0.0, 0.0, 0.0, 0.0]
        assert m[2].tolist() == [0.0, 0.0, 1.0, 0.0]  # sent end
        assert m[3].tolist() == [0.0, 1.0, 1.0, 1.0]  # single-token last sent
        # single-token single-sentence doc: all four flags
        one = enc.encode_each([["x"]])
        assert one[0].tolist() == [1.0, 1.0, 1.0, 1.0]
        assert enc.encode_each([]).shape == (0, 4)


def test_linker_planted_invariants_exhaustive():
    """Every reachable planted-linker input (217 distinct (mention,
    expectation) pairs over the lcm(180, 291) doc_id cycle) must link to
    exactly the closed-form target the linker_planted SQL oracle
    predicts, with hard JW separation margins around the 0.8 min_score:
    target >= 0.88, runner-up < 0.79, no-link best < 0.70."""
    import math

    from texoo_ray.core.planted import (
        LINKER_N_ENTITIES,
        linker_entity_name,
        linker_planted_mention,
    )
    from texoo_ray.stages.linker import (
        KnowledgeBase,
        jaro_winkler,
        normalize_name,
    )

    kb = KnowledgeBase(
        [("E%03d" % i, linker_entity_name(i)) for i in range(LINKER_N_ENTITIES)]
    )
    norms = [normalize_name(linker_entity_name(i)) for i in range(LINKER_N_ENTITIES)]
    seen = set()
    targets = set()
    for doc_id in range(math.lcm(180, 291)):
        m, exp = linker_planted_mention(doc_id)
        if (m, exp) in seen:
            continue
        seen.add((m, exp))
        hit = kb.link(m)
        got = hit[0] if hit else ""
        want = "E%03d" % exp if exp >= 0 else ""
        assert got == want, (doc_id, m, got, want)
        nm = normalize_name(m)
        jws = [jaro_winkler(nm, n) for n in norms]
        if exp >= 0:
            targets.add(exp)
            assert jws[exp] >= 0.88
            assert max(j for i, j in enumerate(jws) if i != exp) < 0.79
        else:
            assert max(jws) < 0.70
    assert len(seen) == 217
    assert len(targets) == LINKER_N_ENTITIES
