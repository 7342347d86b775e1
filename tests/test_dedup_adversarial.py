"""Adversarial dedup tests (VERDICT round 1 items 1-2): band collisions
between dissimilar docs must NOT merge clusters, and multi-hop duplicate
chains must converge to a single transitive cluster id."""

from __future__ import annotations



import numpy as np
import pyarrow as pa
import pytest

from texoo_ray.stages.dedup import (
    cluster_from_edges,
    hamming64,
    jaccard_ngrams,
    minhash_signature,
    simhash64,
)

K, BANDS = 64, 16
ROWS = K // BANDS


def band_hashes(text: str):
    from texoo_ray.stages.dedup import _band_keys

    sig = minhash_signature(text, K).reshape(1, K)
    keys = _band_keys(sig, BANDS)[0]
    return {(b, int(keys[b])) for b in range(BANDS)}


def est_jaccard(a: str, b: str) -> float:
    return float(np.mean(minhash_signature(a, K) == minhash_signature(b, K)))


def _mk_ds(texts, ray_session):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": texts,
        }
    )
    return ray.data.from_arrow(tbl)


class TestClusterFromEdges:
    def test_three_hop_chain_converges(self, ray_session):
        import ray.data

        all_ids = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([1, 2, 3, 4, 9], pa.int64())})
        )
        # chain 4-3, 3-2, 2-1: label 1 must reach doc 4 (3 hops); 9 isolated
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([2, 3, 4], pa.int64()),
                    "dst": pa.array([1, 2, 3], pa.int64()),
                }
            )
        )
        out = cluster_from_edges(all_ids, edges).to_pandas()
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        assert cl == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}

    def test_distributed_fallback_path(self, ray_session, monkeypatch):
        """Force the iterative join-based propagation (edge sets above
        _SMALL_EDGE_LIMIT take this path at corpus scale)."""
        import ray.data

        from texoo_ray.stages import dedup as dd

        monkeypatch.setattr(dd, "_SMALL_EDGE_LIMIT", 0)
        all_ids = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([1, 2, 3, 4, 9], pa.int64())})
        )
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([2, 3, 4], pa.int64()),
                    "dst": pa.array([1, 2, 3], pa.int64()),
                }
            )
        )
        out = cluster_from_edges(all_ids, edges).to_pandas()
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        assert cl == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}

    def test_no_edges_all_singletons(self, ray_session):
        import ray.data

        all_ids = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([5, 6], pa.int64())})
        )
        edges = ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
        out = cluster_from_edges(all_ids, edges).to_pandas()
        assert dict(zip(out["doc_id"], out["cluster_id"])) == {5: 5, 6: 6}


def _find_band_colliding_dissimilar_pair():
    """Deterministically search for two texts that SHARE a band bucket but
    have low true/estimated similarity — the case that merged clusters in
    round 1's unverified implementation."""
    base_words = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    ).split()
    shared = "the server returned an error code"  # shared shingle source
    cands = []
    for i in range(40):
        tail = " ".join(base_words[(i * 3) % 20 : (i * 3) % 20 + 8] or base_words[:8])
        cands.append("%s %s variant%d" % (shared, tail, i))
    for i in range(len(cands)):
        for j in range(i + 1, len(cands)):
            a, b = cands[i], cands[j]
            if est_jaccard(a, b) < 0.35 and jaccard_ngrams(a, b) < 0.35:
                if band_hashes(a) & band_hashes(b):
                    return a, b
    return None


class TestMinhashVerification:
    def test_band_collision_without_similarity_stays_separate(self, ray_session):
        pair = _find_band_colliding_dissimilar_pair()
        assert pair is not None, "fixture search found no band-colliding pair"
        a, b = pair
        from texoo_ray.stages.dedup import minhash_dedup

        out = minhash_dedup(_mk_ds([a, b], ray_session), threshold=0.5).to_pandas()
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        assert cl == {1: 1, 2: 2}, "unverified band collision merged clusters"

    def test_multi_hop_duplicate_chain(self, ray_session):
        base = (
            "users reported that the nightly ingestion job failed after the "
            "schema migration and the on call engineer rolled back the change "
            "to restore service for all downstream consumers of the table"
        )
        words = base.split()

        # B mutates the tail of A, C mutates the head of B: A~B and B~C are
        # near-dups but A~C is below threshold -> cluster only via the chain.
        # Deterministic search over mutation sizes for a triple satisfying
        # the preconditions (band collisions are probabilistic per text).
        def triple(n_tail, n_head):
            tail = ("x%d " * n_tail).strip()
            head = ("y%d " * n_head).strip()
            b_text = " ".join(
                words[:-n_tail] + (tail % tuple(range(n_tail))).split()
            )
            c_text = " ".join(
                (head % tuple(range(n_head))).split()
                + words[n_head:-n_tail]
                + (tail % tuple(range(n_tail))).split()
            )
            return b_text, c_text

        found = None
        for n_tail in (5, 6, 7, 8):
            for n_head in (4, 5, 6, 7, 8):
                b_text, c_text = triple(n_tail, n_head)
                if (
                    est_jaccard(base, b_text) >= 0.5
                    and est_jaccard(b_text, c_text) >= 0.5
                    and est_jaccard(base, c_text) < 0.5
                    and band_hashes(base) & band_hashes(b_text)
                    and band_hashes(b_text) & band_hashes(c_text)
                ):
                    found = (b_text, c_text)
                    break
            if found:
                break
        assert found is not None, "no chain triple satisfied preconditions"
        b_text, c_text = found

        from texoo_ray.stages.dedup import minhash_dedup

        out = minhash_dedup(
            _mk_ds([base, b_text, c_text], ray_session), threshold=0.5
        ).to_pandas()
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        assert cl == {1: 1, 2: 1, 3: 1}, "chain did not converge transitively"

    def test_exact_verify_mode(self, ray_session):
        base = "the quick brown fox jumps over the lazy dog near the river bank today"
        from texoo_ray.stages.dedup import minhash_dedup

        out = minhash_dedup(
            _mk_ds(
                [base, base + " indeed", "unrelated finance news about stock markets"],
                ray_session,
            ),
            threshold=0.5,
            verify="exact",
        ).to_pandas()
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        assert cl[1] == 1 and cl[2] == 1 and cl[3] == 3


def _find_quarter_colliding_distant_pair():
    """Find two texts whose simhashes share a 16-bit quarter but are >3
    bits apart overall (round 1 clustered these; they must stay apart)."""
    bank = [
        "systems design interview preparation guide chapter %d" % i for i in range(60)
    ] + [
        "weather forecast for region %d sunny with clouds" % i for i in range(60)
    ]
    sigs = [(t, simhash64(t)) for t in bank]
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            (ta, sa), (tb, sb) = sigs[i], sigs[j]
            if hamming64(sa, sb) > 3:
                for q in range(4):
                    if (sa >> (16 * q)) & 0xFFFF == (sb >> (16 * q)) & 0xFFFF:
                        return ta, tb
    return None


class TestSimhashVerification:
    def test_quarter_collision_without_closeness_stays_separate(self, ray_session):
        pair = _find_quarter_colliding_distant_pair()
        if pair is None:
            pytest.skip("no quarter-colliding distant pair in fixture bank")
        a, b = pair
        from texoo_ray.stages.dedup import simhash_dedup

        out = simhash_dedup(_mk_ds([a, b], ray_session)).to_pandas()
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        assert cl == {1: 1, 2: 2}, "hamming>3 pair merged via quarter collision"

    def test_near_identical_cluster(self, ray_session):
        a = "the quick brown fox jumps over the lazy dog and runs far away home"
        # deterministic search for a single-word append within hamming<=3
        b = None
        for w in ("again", "now", "today", "once", "twice", "soon", "here", "there"):
            cand = a + " " + w
            if hamming64(simhash64(a), simhash64(cand)) <= 3:
                b = cand
                break
        assert b is not None, "no near-identical variant within hamming 3"
        from texoo_ray.stages.dedup import simhash_dedup

        out = simhash_dedup(
            _mk_ds([a, b, "completely different text about quarterly earnings report"], ray_session)
        ).to_pandas()
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        assert cl[1] == 1 and cl[2] == 1 and cl[3] == 3


class TestEmbeddingDedupScaling:
    def test_overfull_bucket_subsplit(self, ray_session):
        import ray.data

        from texoo_ray.stages.dedup import embedding_dedup

        rng = np.random.RandomState(7)
        # all vectors in (nearly) the same direction -> one hot bucket
        base = rng.randn(16)
        vecs = np.stack([base + rng.randn(16) * 0.001 for _ in range(50)])
        vecs[10] = vecs[3]  # exact duplicate
        tbl = pa.table(
            {
                "vec_id": pa.array(range(50), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
            }
        )
        out = embedding_dedup(
            ray.data.from_arrow(tbl), threshold=0.999999, max_bucket=8, n_planes=4
        ).to_pandas()
        assert len(out) == 50
        cl = dict(zip(out["vec_id"], out["cluster_id"]))
        # exact duplicates always share every (sub-)bucket -> must cluster
        assert cl[10] == cl[3]

    def test_n_planes_derived_from_rows(self, ray_session):
        import ray.data

        from texoo_ray.stages.dedup import embedding_dedup

        rng = np.random.RandomState(3)
        vecs = rng.randn(30, 8)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(30), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
            }
        )
        # no n_planes passed: derives from ds.count() without error
        out = embedding_dedup(ray.data.from_arrow(tbl), threshold=0.99).to_pandas()
        assert len(out) == 30


class TestNgramJaccardDedup:
    def test_exact_threshold_clustering(self, ray_session):
        base = (
            "the nightly ingestion job failed after the schema migration and "
            "the engineer rolled back the change to restore service"
        )
        near = base + " for all consumers"  # high jaccard
        far = "completely different text about quarterly earnings and revenue"
        from texoo_ray.stages.dedup import jaccard_ngrams, ngram_jaccard_dedup

        assert jaccard_ngrams(base, near) >= 0.5
        assert jaccard_ngrams(base, far) < 0.5
        out = ngram_jaccard_dedup(
            _mk_ds([base, near, far], ray_session), threshold=0.5
        ).to_pandas()
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        assert cl == {1: 1, 2: 1, 3: 3}

    def test_chain_transitive_closure(self, ray_session):
        words = (
            "users reported that the nightly ingestion job failed after the "
            "schema migration and the on call engineer rolled back the change "
            "to restore service for all downstream consumers of the table"
        ).split()
        a = " ".join(words)
        b = " ".join(words[:-6] + ["x%d" % i for i in range(6)])
        c = " ".join(["y%d" % i for i in range(6)] + words[6:-6] + ["x%d" % i for i in range(6)])
        from texoo_ray.stages.dedup import jaccard_ngrams, ngram_jaccard_dedup

        assert jaccard_ngrams(a, b) >= 0.5 and jaccard_ngrams(b, c) >= 0.5
        assert jaccard_ngrams(a, c) < 0.5  # cluster only via the chain
        out = ngram_jaccard_dedup(
            _mk_ds([a, b, c], ray_session), threshold=0.5
        ).to_pandas()
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        assert cl == {1: 1, 2: 1, 3: 1}

    def test_df_cap_drops_stop_shingles(self, ray_session):
        # every doc shares the same stop-shingle prefix; distinct tails.
        # With df_cap below the corpus size the shared shingles are dropped
        # so no pairs form; nothing merges through stopword boilerplate.
        texts = [
            "subscribe to our newsletter today " + "unique tail %d alpha beta gamma" % i
            for i in range(8)
        ]
        from texoo_ray.stages.dedup import ngram_jaccard_dedup

        out = ngram_jaccard_dedup(
            _mk_ds(texts, ray_session), threshold=0.3, df_cap=4
        ).to_pandas()
        assert (out["doc_id"] == out["cluster_id"]).all()

    def test_short_docs_single_gram(self, ray_session):
        # < n words: the single joined gram IS the shingle set
        from texoo_ray.stages.dedup import ngram_jaccard_dedup

        out = ngram_jaccard_dedup(
            _mk_ds(["hello world", "hello world", "bye now", ""], ray_session),
            threshold=0.5,
        ).to_pandas()
        cl = dict(zip(out["doc_id"], out["cluster_id"]))
        assert cl[1] == 1 and cl[2] == 1 and cl[3] == 3 and cl[4] == 4
