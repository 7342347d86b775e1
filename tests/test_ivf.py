"""IVF ANN: k-means quantizer, one-pass search recall, partitioned index.

Contract mirrored: InMemoryIndex cosine top-k
(texoo-core/.../index/InMemoryIndex.java:497-558) with coarse-quantizer
preselection in place of its Lucene candidate retrieval."""

import numpy as np
import pyarrow as pa
import pytest


def _clustered_vectors(n_clusters=8, per_cluster=40, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 4.0
    vecs = np.concatenate(
        [centers[i] + 0.15 * rng.randn(per_cluster, dim) for i in range(n_clusters)]
    ).astype(np.float32)
    return vecs


def _to_ds(vecs):
    import ray.data

    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(tbl).repartition(4)


class TestKmeans:
    def test_deterministic_and_covers_clusters(self):
        from texoo_ray.stages.ivf import kmeans

        x = _clustered_vectors()
        c1 = kmeans(x, 8, seed=3)
        c2 = kmeans(x, 8, seed=3)
        assert np.allclose(c1, c2)
        # every point should be close (cosine) to some centroid
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        sims = (xn @ c1.T).max(axis=1)
        assert sims.min() > 0.9

    def test_k_capped_at_n(self):
        from texoo_ray.stages.ivf import kmeans

        x = np.random.RandomState(0).randn(5, 4)
        c = kmeans(x, 64)
        assert c.shape == (5, 4)


class TestIvfSearch:
    def test_recall_vs_brute_force(self, ray_session):
        from texoo_ray.stages.ivf import ivf_topk
        from texoo_ray.stages.knn import brute_force_topk

        vecs = _clustered_vectors()
        ds = _to_ds(vecs)
        q = vecs[12]  # a point inside cluster 0
        exact = brute_force_topk(ds, q, k=10).to_pandas()
        approx = ivf_topk(ds, q, k=10, nlist=8, nprobe=2, seed=11).to_pandas()
        got = set(approx["vec_id"])
        recall = len(got & set(exact["vec_id"])) / 10.0
        assert recall >= 0.9  # tight clusters: probing 2/8 cells suffices
        # scores are true cosines, not approximations
        top = approx.iloc[0]
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        assert abs(top["score"] - float(vn[int(top["vec_id"])] @ qn)) < 1e-6

    def test_full_probe_equals_brute_force(self, ray_session):
        from texoo_ray.stages.ivf import ivf_topk
        from texoo_ray.stages.knn import brute_force_topk

        vecs = _clustered_vectors(n_clusters=4, per_cluster=25)
        ds = _to_ds(vecs)
        q = np.random.RandomState(5).randn(16)
        exact = brute_force_topk(ds, q, k=5).to_pandas()
        full = ivf_topk(ds, q, k=5, nlist=4, nprobe=4).to_pandas()
        assert full["vec_id"].tolist() == exact["vec_id"].tolist()

    def test_partitioned_index_reads_only_probed_cells(self, ray_session, tmp_path):
        from texoo_ray.stages.ivf import build_ivf_index, ivf_topk, search_ivf_index

        vecs = _clustered_vectors()
        ds = _to_ds(vecs)
        out = str(tmp_path / "ivf")
        centroids = build_ivf_index(ds, out, nlist=8, seed=11)
        assert centroids.shape == (8, 16)
        import os

        cell_dirs = [d for d in os.listdir(out) if d.startswith("cell=")]
        assert len(cell_dirs) > 1  # genuinely partitioned by cell
        q = vecs[12]
        from_index = search_ivf_index(out, q, k=10, nprobe=2).to_pandas()
        one_pass = ivf_topk(ds, q, k=10, nlist=8, nprobe=2, centroids=centroids).to_pandas()
        assert from_index["vec_id"].tolist() == one_pass["vec_id"].tolist()
        assert np.allclose(from_index["score"], one_pass["score"])

    def test_empty_probe_result(self, ray_session, tmp_path):
        """Searching an index whose probed cells are empty dirs yields 0 rows."""
        from texoo_ray.stages.ivf import build_ivf_index, search_ivf_index

        vecs = _clustered_vectors(n_clusters=2, per_cluster=10)
        out = str(tmp_path / "ivf2")
        build_ivf_index(_to_ds(vecs), out, nlist=2)
        res = search_ivf_index(out, vecs[0], k=3, nprobe=1).to_pandas()
        assert 0 < len(res) <= 3


class TestMultiQueryTopk:
    def test_matches_per_query_brute_force(self, ray_session):
        from texoo_ray.stages.knn import brute_force_topk, multi_query_topk

        vecs = _clustered_vectors(n_clusters=4, per_cluster=20)
        ds = _to_ds(vecs)
        queries = vecs[:3].astype(np.float64)
        multi = multi_query_topk(ds, queries, k=4).to_pandas()
        for qi in range(3):
            solo = brute_force_topk(ds, queries[qi], k=4).to_pandas()
            got = multi[multi["query_idx"] == qi].sort_values("rank")["vec_id"].tolist()
            assert got == solo["vec_id"].tolist(), "query %d" % qi
