"""Word2Vec-style matrix encoder tests: build -> persist -> reload in an
actor -> encode contract (Word2VecEncoder.java:97-145,251-301)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from texoo_ray.stages.word2vec import (
    Word2VecEmbedStage,
    Word2VecEncoder,
    build_word_vectors,
    preprocess,
)


@pytest.fixture(scope="module")
def w2v_path(tmp_path_factory, ray_session):
    import ray.data

    tbl = pa.table(
        {
            "text": [
                "alpha beta gamma delta",
                "alpha beta epsilon",
                "gamma delta zeta eta theta",
            ]
        }
    )
    path = str(tmp_path_factory.mktemp("w2v") / "vectors.parquet")
    build_word_vectors(ray.data.from_arrow(tbl), path, dim=32)
    return path


class TestEncoder:
    def test_build_and_load(self, w2v_path):
        enc = Word2VecEncoder(w2v_path)
        assert enc.dim == 32
        assert not enc.is_unknown("alpha")
        assert not enc.is_unknown("ALPHA")  # preprocessor lowercases
        assert enc.is_unknown("missingword")

    def test_known_word_vector_normalized(self, w2v_path):
        enc = Word2VecEncoder(w2v_path)
        v = enc.encode_word("alpha")
        assert v.shape == (32,)
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5

    def test_oov_returns_zero_vector(self, w2v_path):
        enc = Word2VecEncoder(w2v_path)
        assert np.all(enc.encode_word("qqqq") == 0)

    def test_phrase_mean_counts_unknown_words(self, w2v_path):
        # Word2VecEncoder.java:276-288: sum of KNOWN vectors / TOTAL words
        enc = Word2VecEncoder(w2v_path)
        known = enc.encode("alpha")
        mixed = enc.encode("alpha qqqq")
        assert np.allclose(mixed, known / 2)
        assert np.all(enc.encode("") == 0)
        assert np.all(enc.encode("qqqq zzzz") == 0)

    def test_nearest_excludes_self(self, w2v_path):
        enc = Word2VecEncoder(w2v_path)
        nn = enc.nearest("alpha", k=3)
        assert "alpha" not in nn and len(nn) == 3

    def test_preprocess(self):
        assert preprocess("  AlPhA ") == "alpha"


class TestEmbedStage:
    def test_stage_attaches_embedding(self, w2v_path, ray_session):
        import ray.data

        from texoo_ray.stages.extract import SegmentStage

        tbl = pa.table(
            {
                "conv_id": ["c1", "c1"],
                "turn_idx": pa.array([0, 1], pa.int32()),
                "text": ["alpha beta gamma.", "zeta eta unknownword."],
            }
        )
        seg = SegmentStage(newlines="keep", strip=False)

        ds = ray.data.from_arrow(tbl).map_batches(
            lambda b: seg(b), batch_format="pyarrow"
        )
        out = ds.map_batches(
            Word2VecEmbedStage,
            fn_constructor_kwargs=dict(path=w2v_path),
            batch_format="pyarrow",
            concurrency=1,
        ).to_pandas()
        assert len(out) == 2
        v0 = np.asarray(out["turn_embedding"].iloc[0])
        assert v0.shape == (32,) and float(np.linalg.norm(v0)) > 0

    def test_section_stage_with_w2v(self, w2v_path, ray_session):
        from texoo_ray.stages.extract import SectionStage, SegmentStage

        tbl = pa.table(
            {
                "conv_id": ["c1"],
                "turn_idx": pa.array([0], pa.int32()),
                "text": ["alpha beta gamma.\nzeta eta theta.\ndelta beta alpha."],
            }
        )
        seg = SegmentStage(newlines="keep", strip=False)
        sec = SectionStage(method="bemd", w2v_path=w2v_path)
        out = sec(seg(tbl))
        secs = out["sections"][0].as_py()
        assert isinstance(secs, list) and len(secs) >= 1


class TestFastTextEncoder:
    def test_oov_subword_composition(self, ray_session, tmp_path):
        """FastTextEncoder.java:160-174: known words hit the matrix; OOV
        words compose from <word> boundary-marked 3..6-gram vectors and
        are NOT the null vector; similar surface forms land nearby."""
        import ray.data

        from texoo_ray.stages.word2vec import (
            FastTextEncoder,
            Word2VecEncoder,
            build_word_vectors,
        )

        ds = ray.data.from_items(
            [{"text": "walking walked walks running runs jumped"}] * 3
        )
        path = str(tmp_path / "vecs.parquet")
        build_word_vectors(ds, path, dim=32)
        ft = FastTextEncoder(path)
        w2v = Word2VecEncoder(path)
        # known word: identical to the w2v matrix row
        assert np.allclose(ft.encode_word("walking"), w2v.encode_word("walking"))
        # OOV: w2v nulls out, fasttext composes subwords
        assert np.linalg.norm(w2v.encode_word("walkings")) == 0.0
        oov = ft.encode_word("walkings")
        assert np.linalg.norm(oov) > 0
        assert not ft.is_unknown("walkings") and w2v.is_unknown("walkings")
        # subword sharing: 'walkings' closer to 'walkingz' than to 'jumped'
        sim = lambda a, b: float(  # noqa: E731
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )
        assert sim(oov, ft.encode_word("walkingz")) > sim(oov, ft.encode_word("jumpedz"))
        # deterministic across instances
        assert np.allclose(oov, FastTextEncoder(path).encode_word("walkings"))
