"""Tests for corpus mixing / splitting / per-source sampling / vector
centroids (pipelines/curation.py::hash_split/source_mixture,
stages/retrieval.py::grouped_topk sampling shape, stages/knn.py::
label_centroids)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _docs_table(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )


class TestHashSplit:
    def test_duplicates_colocate_and_boundaries_match(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.curation import hash_split

        rows = [(i, "doc text %d" % (i % 40), "s") for i in range(120)]
        ds = ray.data.from_arrow(_docs_table(rows)).repartition(4)
        out = hash_split(ds, fractions=(0.6, 0.2)).to_pandas()
        assert set(out["split"]) <= {"train", "val", "test"}
        # duplicate texts (i % 40 collides) always share a split
        per_text = out.groupby("text")["split"].nunique()
        assert (per_text == 1).all()
        # membership equals the Python-side md5 boundary compare
        b1 = format(int(0.6 * 16**8), "08x")
        b2 = format(int(0.8 * 16**8), "08x")
        for t, s in zip(out["text"], out["split"]):
            h = hashlib.md5(t.encode()).hexdigest()[:8]
            expect = "train" if h < b1 else ("val" if h < b2 else "test")
            assert s == expect


class TestSourceMixture:
    def test_uniform_weights_downsample_to_min(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.curation import source_mixture

        rows = [(i, "a text %d" % i, "A") for i in range(40)] + [
            (100 + i, "b text %d" % i, "B") for i in range(10)
        ]
        ds = ray.data.from_arrow(_docs_table(rows)).repartition(3)
        out = source_mixture(ds).to_pandas()
        # plan: W=2, T=min(40*2//1, 10*2//1)=20, need=1*20//2=10 each
        for _, r in out.iterrows():
            n_s = 40 if r["source"] == "A" else 10
            h32 = int(
                hashlib.md5(
                    ("a text %d" % r["doc_id"]).encode()
                    if r["source"] == "A"
                    else ("b text %d" % (r["doc_id"] - 100)).encode()
                ).hexdigest()[:8],
                16,
            )
            assert h32 * n_s < 10 * 4294967296
        # B's acceptance rate is need/n_s = 1.0 -> all 10 B docs kept
        assert (out["source"] == "B").sum() == 10
        # A is hash-thinned toward 10 (binomial; bounded well below 40)
        assert 1 <= (out["source"] == "A").sum() <= 25

    def test_zero_weight_drops_source(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.curation import source_mixture

        rows = [(i, "t%d" % i, "A") for i in range(10)] + [
            (50 + i, "u%d" % i, "B") for i in range(10)
        ]
        ds = ray.data.from_arrow(_docs_table(rows))
        out = source_mixture(ds, weights={"A": 1}).to_pandas()
        assert set(out["source"]) <= {"A"}
        assert len(out) == 10  # rate A = need/n = 10/10 = 1.0

    def test_no_positive_weight_source_present(self, ray_session):
        """Weights only name absent sources -> empty mixture, not a
        ZeroDivisionError (W == 0 guard)."""
        import ray.data

        from texoo_ray.pipelines.curation import source_mixture

        rows = [(i, "t%d" % i, "A") for i in range(5)]
        ds = ray.data.from_arrow(_docs_table(rows))
        out = source_mixture(ds, weights={"Z": 3}).to_pandas()
        assert len(out) == 0


class TestSourceSample:
    def test_exactly_k_per_source_matches_bruteforce(self, ray_session):
        import ray.data

        from texoo_ray.stages.retrieval import grouped_topk

        rows = [
            (s * 100 + i, "text %d %d" % (s, i), "src%d" % s)
            for s in range(3)
            for i in range(10)
        ]
        tbl = _docs_table(rows)

        def with_hash(batch: pa.Table) -> pa.Table:
            h = [
                hashlib.md5((t or "").encode()).hexdigest()[:8]
                for t in batch["text"].to_pylist()
            ]
            return batch.append_column("h", pa.array(h, pa.string()))

        ds = ray.data.from_arrow(tbl).repartition(4)
        out = (
            grouped_topk(
                ds.map_batches(with_hash, batch_format="pyarrow"),
                group_col="source",
                k=2,
                id_col="doc_id",
                order_by=[("h", "ascending"), ("doc_id", "ascending")],
            )
            .to_pandas()
            .sort_values(["source", "doc_id"])
        )
        expect = {}
        for did, t, s in rows:
            expect.setdefault(s, []).append(
                (hashlib.md5(t.encode()).hexdigest()[:8], did)
            )
        want = sorted(
            (s, did)
            for s, lst in expect.items()
            for _, did in sorted(lst)[:2]
        )
        assert list(map(tuple, out[["source", "doc_id"]].values)) == want


class TestLabelCentroids:
    def test_exact_integer_sums_block_invariant(self, ray_session):
        import ray.data

        from texoo_ray.stages.knn import label_centroids

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(50, 4)).astype(np.float32)
        labels = (np.arange(50) % 3).astype(np.int64)
        tbl = pa.table(
            {
                "label": pa.array(labels, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
            }
        )
        q = np.floor(vecs.astype(np.float64) * (1 << 20) + 0.5).astype(np.int64)
        for parts in (1, 7):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            out = (
                label_centroids(ds)
                .to_pandas()
                .sort_values(["label", "dim"])
                .reset_index(drop=True)
            )
            for lab in range(3):
                mask = labels == lab
                sub = out[out["label"] == lab]
                assert sub["n_vecs"].tolist() == [int(mask.sum())] * 4
                assert sub["sum_q"].tolist() == q[mask].sum(axis=0).tolist()


class TestKmeansAssign:
    def test_exact_assignment_matches_bruteforce(self, ray_session):
        import ray.data

        from texoo_ray.stages.knn import kmeans_assign, label_centroids

        rng = np.random.default_rng(11)
        # two well-separated clusters + one ambiguous point
        a = rng.normal(0.0, 0.05, size=(20, 3))
        b = rng.normal(1.0, 0.05, size=(20, 3))
        vecs = np.vstack([a, b]).astype(np.float32)
        labels = np.array([0] * 20 + [1] * 20, dtype=np.int64)
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(40), pa.int64()),
                "label": pa.array(labels, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(5)
        cent = pa.Table.from_pylist(label_centroids(ds).take_all())
        out = (
            kmeans_assign(ds, cent)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        # brute force in the same integer arithmetic
        q = np.floor(vecs.astype(np.float64) * (1 << 20) + 0.5).astype(np.int64)
        cq = np.stack(
            [
                (2 * q[labels == l].sum(axis=0) + (labels == l).sum())
                // (2 * (labels == l).sum())
                for l in (0, 1)
            ]
        )
        d2 = ((q[:, None, :] - cq[None, :, :]) ** 2).sum(axis=2)
        assert out["assigned_label"].tolist() == d2.argmin(axis=1).tolist()
        assert out["d2"].tolist() == d2.min(axis=1).tolist()
        # clusters are separated: assignment reproduces the labels
        assert (out["assigned_label"].values == labels).all()


class TestKmeansIterate:
    def test_two_rounds_reassign_and_converge(self, ray_session):
        import ray.data

        from texoo_ray.stages.knn import kmeans_assign, kmeans_iterate, label_centroids

        rng = np.random.default_rng(3)
        # two tight clusters, but the INIT labels are wrong for 5 points:
        # round 1 fixes the assignment, round 2 is then a fixpoint
        a = rng.normal(0.0, 0.02, size=(15, 3))
        b = rng.normal(1.0, 0.02, size=(15, 3))
        vecs = np.vstack([a, b]).astype(np.float32)
        init = np.array([0] * 10 + [1] * 5 + [1] * 15, dtype=np.int64)
        true = np.array([0] * 15 + [1] * 15, dtype=np.int64)
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(30), pa.int64()),
                "label": pa.array(init, pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        out2 = (
            kmeans_iterate(ds, n_iter=2)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert out2["assigned_label"].tolist() == true.tolist()
        # one round equals label_centroids + kmeans_assign composed by hand
        cent = pa.Table.from_pylist(label_centroids(ds).take_all())
        by_hand = (
            kmeans_assign(ds, cent)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        out1 = (
            kmeans_iterate(ds, n_iter=1)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert out1["assigned_label"].tolist() == by_hand["assigned_label"].tolist()
        assert out1["d2"].tolist() == by_hand["d2"].tolist()


def _events_table(rows):
    # rows: (user_id, event_type, ts_us)
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        }
    )


DAY = 86_400_000_000


class TestEventFunnel:
    def test_strict_after_chain(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.analytics import event_funnel

        rows = [
            # user 1: full funnel in order
            (1, "view", 100), (1, "click", 200), (1, "purchase", 300),
            # user 2: click BEFORE first view -> stops at step 1
            (2, "click", 50), (2, "view", 100), (2, "purchase", 200),
            # user 3: view+click, purchase before click -> stops at step 2
            (3, "view", 10), (3, "purchase", 15), (3, "click", 20),
            # user 4: never views
            (4, "click", 10), (4, "purchase", 20),
            # user 5: second click after view counts even if first was before
            (5, "click", 5), (5, "view", 10), (5, "click", 15), (5, "purchase", 20),
        ]
        ds = ray.data.from_arrow(_events_table(rows)).repartition(3)
        out = event_funnel(ds).to_pandas().sort_values("step")
        assert out["event_type"].tolist() == ["view", "click", "purchase"]
        # step1: users 1,2,3,5 viewed. step2 (click strictly after first
        # view): 1 (200>100), 3 (20>10), 5 (15>10) — NOT 2 (only click is
        # at 50 < view@100). step3 (purchase strictly after that click):
        # 1 (300>200), 5 (20>15) — NOT 3 (purchase@15 < click@20).
        assert out["n_users"].tolist() == [4, 3, 2]


class TestCohortRetention:
    def test_matrix_counts(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.analytics import cohort_retention

        rows = [
            (1, "view", 0 * DAY + 5), (1, "click", 2 * DAY + 5),
            (2, "view", 0 * DAY + 9), (2, "view", 0 * DAY + 10),
            (3, "view", 2 * DAY + 1), (3, "error", 3 * DAY),
        ]
        ds = ray.data.from_arrow(_events_table(rows)).repartition(2)
        out = cohort_retention(ds).to_pandas()
        got = {
            (r.cohort_day, r.day_offset): r.n_users for r in out.itertuples()
        }
        # cohort day0: users 1,2 on offset 0; user 1 again on offset 2
        # cohort day2: user 3 on offsets 0 and 1
        assert got == {(0, 0): 2, (0, 2): 1, (2, 0): 1, (2, 1): 1}


class TestTermCooccurrence:
    def test_pairs_and_order(self, ray_session):
        import ray.data

        from texoo_ray.stages.text_stats import term_cooccurrence

        docs = [
            "alpha beta gamma",
            "alpha beta",
            "alpha beta delta",
            "gamma delta",
            "alpha alpha alpha",  # repeats count once per doc
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = term_cooccurrence(ds, vocab_size=10, top_k=3).to_pandas()
        rows = list(map(tuple, out[["word_a", "word_b", "n_docs"]].values))
        # (alpha, beta) in docs 0,1,2 -> 3; ties at 1 broken alphabetically
        assert rows[0] == ("alpha", "beta", 3)
        assert rows[1] == ("alpha", "delta", 1)
        assert len(rows) == 3 and all(r[2] >= rows[-1][2] for r in rows)
