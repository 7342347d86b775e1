"""Unit tests for the curation operators added in round 2: greedy
sequence packing, benchmark decontamination (broadcast n-gram filter),
and deterministic stratified hash sampling."""

from __future__ import annotations

import hashlib

import pyarrow as pa

from texoo_ray.stages.text_stats import ContaminationStage, stratified_hash_sample


def _turns_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


class TestPackSequences:
    def test_greedy_boundaries(self, ray_session):
        from texoo_ray.pipelines.conversations import pack_sequences

        rows = [
            ("c1", 0, "a b c"),        # 3 tok  -> chunk 0 (acc 3)
            ("c1", 1, "d e f g"),      # 4 tok  -> chunk 0 (acc 7)
            ("c1", 2, "h i j k"),      # 4 tok  -> 7+4>10 -> chunk 1 (acc 4)
            ("c1", 3, " ".join("x%d" % i for i in range(12))),  # 12>10 alone -> chunk 2
            ("c1", 4, "m"),            # 12+1>10 -> chunk 3
            ("c2", 0, "only one here"),  # fresh conversation -> chunk 0
        ]
        out = (
            pack_sequences(_turns_ds(rows), max_tokens=10)
            .sort(["conv_id", "turn_idx"])
            .to_pandas()
        )
        got = list(zip(out["conv_id"], out["turn_idx"], out["chunk_id"]))
        assert got == [
            ("c1", 0, 0),
            ("c1", 1, 0),
            ("c1", 2, 1),
            ("c1", 3, 2),
            ("c1", 4, 3),
            ("c2", 0, 0),
        ]
        assert out["n_tok"].tolist() == [3, 4, 4, 12, 1, 3]

    def test_unsorted_input_and_empty_text(self, ray_session):
        from texoo_ray.pipelines.conversations import pack_sequences

        rows = [("c", 2, "a b"), ("c", 0, "c d"), ("c", 1, None)]
        out = (
            pack_sequences(_turns_ds(rows), max_tokens=3)
            .sort(["conv_id", "turn_idx"])
            .to_pandas()
        )
        # order restored by turn_idx inside the group: 2 + 0 <= 3, then +2 > 3
        assert out["chunk_id"].tolist() == [0, 0, 1]
        assert out["n_tok"].tolist() == [2, 0, 2]


class TestContaminationStage:
    def test_flags_overlap_only(self):
        bench = ["the quick brown fox jumps over the lazy dog"]
        stage = ContaminationStage(bench, n=4)
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "preamble the quick brown fox appears here",  # shares a 4-gram
                    "completely unrelated text with no overlap at all",
                    None,
                ],
            }
        )
        out = stage(batch)
        assert out["contaminated"].to_pylist() == [True, False, False]
        assert out["n_hits"].to_pylist()[0] >= 1
        assert out["n_hits"].to_pylist()[1:] == [0, 0]

    def test_case_insensitive_and_prebuilt_set(self):
        stage = ContaminationStage({"a b c d"}, n=4)
        batch = pa.table({"text": ["A  B   c D tail words here"]})
        assert stage(batch)["contaminated"].to_pylist() == [True]


class TestCurateTrainingSet:
    def test_gate_decontaminate_sample_chain(self, ray_session):
        import ray

        from texoo_ray.pipelines.curation import curate_training_set

        bench = ["alpha beta gamma delta epsilon zeta"]
        rows = [
            # benchmark ids (< 20) are always excluded
            (1, "alpha beta gamma delta epsilon zeta", "en"),
            # too short (< 5 words)
            (20, "tiny doc", "en"),
            # mostly punctuation (alpha ratio fails)
            (21, "!!! ??? ... --- === ###", "en"),
            # contaminated: shares the 4-gram "alpha beta gamma delta"
            (22, "prefix alpha beta gamma delta and a tail of words", "de"),
            # clean long docs — survive gate+decontam, then hash-sampled
            *[
                (23 + i, "clean document number %d with plenty of words" % i, "de")
                for i in range(40)
            ],
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        out = curate_training_set(
            ray.data.from_arrow(tbl).repartition(3), ray.put(bench)
        ).to_pandas()
        kept = set(out["doc_id"])
        assert kept.isdisjoint({1, 20, 21, 22})
        # default rate for non-en strata is 0.5: md5(text)[:8] < '80000000'
        for i in range(40):
            t = "clean document number %d with plenty of words" % i
            expect = hashlib.md5(t.encode()).hexdigest()[:8] < "80000000"
            assert ((23 + i) in kept) == expect
        assert set(out.columns) == {"doc_id", "lang", "n_words"}
        assert (out["n_words"] >= 5).all()


class TestStratifiedHashSample:
    def test_membership_matches_md5_rule(self):
        texts = ["doc %d payload" % i for i in range(200)]
        langs = ["en" if i % 2 == 0 else "de" for i in range(200)]
        batch = pa.table(
            {
                "doc_id": pa.array(range(200), pa.int64()),
                "text": texts,
                "lang": langs,
            }
        )
        out = stratified_hash_sample(batch, rates={"en": 0.2}, default_rate=0.5)
        kept = set(out["doc_id"].to_pylist())
        for i, (t, l) in enumerate(zip(texts, langs)):
            th = "33333333" if l == "en" else "80000000"
            expect = hashlib.md5(t.encode()).hexdigest()[:8] < th
            assert (i in kept) == expect
        # sampling is deterministic: second call identical
        out2 = stratified_hash_sample(batch, rates={"en": 0.2}, default_rate=0.5)
        assert out2["doc_id"].to_pylist() == out["doc_id"].to_pylist()

    def test_rates_shift_strata(self):
        texts = ["item %d" % i for i in range(400)]
        batch = pa.table(
            {
                "doc_id": pa.array(range(400), pa.int64()),
                "text": texts,
                "lang": ["xx"] * 400,
            }
        )
        n_low = len(stratified_hash_sample(batch, rates={}, default_rate=0.1))
        n_high = len(stratified_hash_sample(batch, rates={}, default_rate=0.9))
        assert n_low < n_high


class TestPiiRedact:
    def test_patterns_and_order(self):
        from texoo_ray.stages.text_stats import pii_redact

        batch = pa.table(
            {
                "text": pa.array(
                    [
                        "mail bob.smith+x@corp.example.org now",
                        "host 192.168.1.254 and 10.0.0.1 up",
                        "call +49-123-4567 or +1 555 0100",
                        # user@IP is NOT an email (no alphabetic TLD);
                        # the IP pass redacts just the host
                        "root@10.0.0.1 logged in",
                        None,
                        "no pii here",
                    ]
                )
            }
        )
        out = pii_redact(batch)
        red = out["redacted"].to_pylist()
        assert red[0] == "mail <EMAIL> now"
        assert red[1] == "host <IP> and <IP> up"
        assert red[2] == "call <PHONE> or <PHONE>"
        assert red[3] == "root@<IP> logged in"
        assert red[4] == "" and red[5] == "no pii here"
        assert out["n_emails"].to_pylist() == [1, 0, 0, 0, 0, 0]
        assert out["n_ips"].to_pylist() == [0, 2, 0, 1, 0, 0]
        assert out["n_phones"].to_pylist() == [0, 0, 2, 0, 0, 0]


class TestRepetitionStats:
    def test_counts_and_verdict(self):
        from texoo_ray.stages.text_stats import repetition_stats

        batch = pa.table(
            {
                "text": pa.array(
                    [
                        # 'spam' is 5 of 10 words -> top fraction 0.5, reject
                        "spam spam spam spam spam one two three four five",
                        # all-distinct clean sentence -> keep
                        "the quick brown fox jumps over a lazy dog today",
                        # one repeated 3-gram: 'a b c a b c a b c' has
                        # 7 gram instances, 3 distinct -> dup frac 4/7 > 0.4
                        "a b c a b c a b c",
                        "",
                        None,
                    ]
                )
            }
        )
        out = repetition_stats(batch)
        assert out["n_words_q"].to_pylist() == [10, 10, 9, 0, 0]
        assert out["top_word_count"].to_pylist() == [5, 1, 3, 0, 0]
        assert out["n_ngrams"].to_pylist() == [8, 8, 7, 0, 0]
        # 'spam spam spam' occurs at i=0,1,2 -> 8 instances, 6 distinct
        assert out["n_distinct_ngrams"].to_pylist() == [6, 8, 3, 0, 0]
        assert out["rep_keep"].to_pylist() == [False, True, False, False, False]


class TestTokenBudgetSelect:
    def _ds(self, docs):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                    "text": pa.array([d[1] for d in docs], pa.string()),
                }
            )
        ).repartition(3)

    def test_boundary_group_partial_fit(self, ray_session):
        from texoo_ray.pipelines.curation import token_budget_select

        # scores (n_words) and tokens (bpe) are equal here: plain words
        docs = [
            (1, "a b c d e"),   # score 5, tokens 5
            (2, "a b c d"),     # score 4 -- boundary group, id order: 2,3,4
            (3, "a b c d"),
            (4, "a b c d"),
            (5, "a b"),         # score 2, never reached
        ]
        # budget 5 (all of doc1) + 8 (docs 2,3) = 13; doc4 would hit 17
        out = token_budget_select(self._ds(docs), budget=13).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2, 3]

    def test_all_fit_and_none_fit(self, ray_session):
        from texoo_ray.pipelines.curation import token_budget_select

        docs = [(1, "x y"), (2, "x y z")]
        assert len(token_budget_select(self._ds(docs), budget=100).to_pandas()) == 2
        assert len(token_budget_select(self._ds(docs), budget=2).to_pandas()) == 0

    def test_skewed_boundary_group_recursive_cutoff(self, ray_session):
        """EVERY doc shares the boundary score — the cutoff search must
        rank the whole corpus by id without a corpus-sized driver
        collection. limit=4 forces multiple histogram levels, including
        a level whose first bucket overflows (accepted_max path)."""
        from texoo_ray.pipelines.curation import _boundary_cutoff, token_budget_select

        docs = [(i, "w x y") for i in range(1, 41)]  # all score 3, tokens 3
        # budget 3*7 = 21 -> docs 1..7 fit exactly
        out = token_budget_select(self._ds(docs), budget=21).to_pandas()
        assert sorted(out["doc_id"]) == list(range(1, 8))
        # direct cutoff checks with a tiny limit to exercise recursion
        import ray.data

        bnd = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(1, 41)), pa.int64()),
                    "tokens": pa.array([3] * 40, pa.int64()),
                }
            )
        ).repartition(5)
        assert _boundary_cutoff(bnd, 21, "doc_id", limit=4) == 7
        assert _boundary_cutoff(bnd, 120, "doc_id", limit=4) == 40  # all fit
        assert _boundary_cutoff(bnd, 2, "doc_id", limit=4) is None  # none fits
        assert _boundary_cutoff(bnd, 0, "doc_id", limit=4) is None

    def test_boundary_cutoff_matches_bruteforce_randomized(self, ray_session):
        import random

        import ray.data

        from texoo_ray.pipelines.curation import _boundary_cutoff

        rng = random.Random(11)
        for trial in range(6):
            n = rng.randrange(1, 40)
            ids = rng.sample(range(1, 10_000), n)
            toks = [rng.randrange(1, 9) for _ in range(n)]
            residual = rng.randrange(0, sum(toks) + 5)
            order = sorted(range(n), key=lambda i: ids[i])
            run, want = 0, None
            for i in order:
                run += toks[i]
                if run > residual:
                    break
                want = ids[i]
            bnd = ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(ids, pa.int64()),
                        "tokens": pa.array(toks, pa.int64()),
                    }
                )
            ).repartition(3)
            got = _boundary_cutoff(bnd, residual, "doc_id", limit=4)
            assert got == want, (trial, ids, toks, residual, got, want)

    def test_sparse_ids_recursive_cutoff(self, ray_session):
        """Ids far apart (wide id window, few docs) — histogram levels
        must still converge and pick the exact prefix."""
        import ray.data

        from texoo_ray.pipelines.curation import _boundary_cutoff

        ids = [10, 10_000, 3_000_000, 4_000_000_000, 4_000_000_001]
        bnd = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "tokens": pa.array([5, 5, 5, 5, 5], pa.int64()),
                }
            )
        ).repartition(2)
        assert _boundary_cutoff(bnd, 15, "doc_id", limit=2) == 3_000_000
        assert _boundary_cutoff(bnd, 25, "doc_id", limit=2) == 4_000_000_001
        assert _boundary_cutoff(bnd, 4, "doc_id", limit=2) is None


class TestGroupedTopk:
    def test_ties_and_small_groups(self, ray_session):
        import ray.data

        from texoo_ray.stages.retrieval import grouped_topk

        tbl = pa.table(
            {
                "doc_id": pa.array(range(8), pa.int64()),
                "g": pa.array(["a", "a", "a", "a", "b", "b", "c", "a"]),
                "v": pa.array([5, 9, 9, 1, 3, 3, 7, 9], pa.int64()),
            }
        )
        out = (
            grouped_topk(
                ray.data.from_arrow(tbl).repartition(4),
                group_col="g", order_col="v", k=2,
            )
            .sort(["g", "doc_id"])
            .to_pandas()
        )
        got = list(zip(out["g"], out["doc_id"]))
        # a: v=9 ties at ids 1,2,7 -> lowest ids 1,2; b: both rows; c: 1 row
        assert got == [("a", 1), ("a", 2), ("b", 4), ("b", 5), ("c", 6)]

    def test_multi_column_order_by(self, ray_session):
        import ray.data

        from texoo_ray.stages.retrieval import grouped_topk

        tbl = pa.table(
            {
                "g": pa.array(["a"] * 4 + ["b"] * 2),
                "v": pa.array([9, 9, 9, 1, 5, 5], pa.int64()),
                "w": pa.array(["z", "m", "q", "a", "b", "a"]),
            }
        )
        out = (
            grouped_topk(
                ray.data.from_arrow(tbl).repartition(3),
                group_col="g", k=2,
                order_by=[("v", "descending"), ("w", "ascending")],
            )
            .sort(["g", "w"])
            .to_pandas()
        )
        assert list(zip(out["g"], out["w"])) == [
            ("a", "m"), ("a", "q"), ("b", "a"), ("b", "b")
        ]


class TestTfIdf:
    def test_scores_and_topk(self, ray_session):
        import math

        import ray.data

        from texoo_ray.stages.encoders import tfidf_top_terms

        docs = [
            (1, "cat cat dog"),
            (2, "dog fish"),
            (3, "fish fish fish bird"),
            (4, "dog dog"),
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs]),
                }
            )
        ).repartition(2)
        out = tfidf_top_terms(ds, n_docs=4, k=2).to_pandas()
        by_doc = {
            d: list(zip(g["word"], g["tfidf_micro"]))
            for d, g in out.sort_values(["doc_id", "tfidf_micro", "word"],
                                        ascending=[True, False, True]).groupby("doc_id")
        }
        micro = lambda tf, df: math.floor(tf * math.log(4.0 / df) * 1e6 + 0.5)
        # doc1: cat(tf2,df1) >> dog(tf1,df3)
        assert by_doc[1] == [("cat", micro(2, 1)), ("dog", micro(1, 3))]
        # doc3: fish(tf3,df2) then bird(tf1,df1)
        assert by_doc[3] == [("fish", micro(3, 2)), ("bird", micro(1, 1))]
        # doc4 has only one distinct word
        assert by_doc[4] == [("dog", micro(2, 3))]


class TestConvIntegrity:
    def test_flags(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.conversations import conv_integrity

        rows = [
            # clean alternating conv
            ("ok", 0, "user"), ("ok", 1, "assistant"), ("ok", 2, "user"),
            # gap: missing turn 1
            ("gap", 0, "user"), ("gap", 2, "assistant"),
            # role repeat + system start
            ("rep", 0, "system"), ("rep", 1, "user"), ("rep", 2, "user"),
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array([r[0] for r in rows], pa.string()),
                    "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                    "role": pa.array([r[2] for r in rows], pa.string()),
                }
            )
        ).repartition(3)
        out = conv_integrity(ds).to_pandas().set_index("conv_id")
        assert bool(out.loc["ok", "ok"]) and not out.loc["ok", "has_gap"]
        assert bool(out.loc["gap", "has_gap"]) and not out.loc["gap", "ok"]
        assert out.loc["rep", "n_role_repeats"] == 1
        assert not out.loc["rep", "starts_with_user"]
        assert out["n_turns"].tolist() == [2, 3, 3]


class TestCrossSourceOverlap:
    def test_known_overlaps(self, ray_session):
        import ray.data

        from texoo_ray.stages.text_stats import cross_source_overlap

        shared = "a b c d e f g h"          # one 8-gram, shared by A and B
        rows = [
            ("A", shared + " tail one"),
            ("A", "unique alpha " + shared),  # same gram again in A: distinct-counted once
            ("B", "prefix text " + shared),
            ("B", "totally different words with no overlap at all here"),
            ("C", "c1 c2 c3 c4 c5 c6 c7 c8 c9"),  # no overlap with anyone
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array([r[0] for r in rows], pa.string()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        ).repartition(3)
        out = cross_source_overlap(ds, n=8).to_pandas()
        # Only the (A, B) pair shares grams; C appears in no pair.
        assert out[["source_a", "source_b"]].values.tolist() == [["A", "B"]]
        # Grams of "a b c d e f g h" windows shared by both sides:
        # A row1: [a..h, b..one(2 windows after)] => windows of row1: 3 grams
        # Simpler: compute expected via brute force.
        import itertools

        def grams(t):
            w = t.split()
            return {" ".join(w[i : i + 8]) for i in range(len(w) - 7)}

        per_src = {}
        for s, t in rows:
            per_src.setdefault(s, set()).update(grams(t))
        expected = len(per_src["A"] & per_src["B"])
        assert out["n_shared_ngrams"].tolist() == [expected]

    def test_short_and_empty_docs(self, ray_session):
        import ray.data

        from texoo_ray.stages.text_stats import cross_source_overlap

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "source": pa.array(["A", "B"], pa.string()),
                    "text": pa.array(["too short", None], pa.string()),
                }
            )
        )
        assert cross_source_overlap(ds, n=8).count() == 0


class TestChunkDocuments:
    def _chunks_brute(self, text, size, stride):
        w = (text or "").split()
        if not w:
            return []
        out = []
        i = 0
        idx = 0
        while True:
            out.append((idx, " ".join(w[i : i + size]), min(size, len(w) - i)))
            if i + size >= len(w):
                break
            i += stride
            idx += 1
        return out

    def test_matches_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.curation import chunk_documents

        texts = [
            " ".join(f"w{i}" for i in range(n)) for n in (0, 1, 5, 64, 65, 112, 113, 200)
        ]
        texts[0] = "   "  # whitespace-only doc: 0 chunks
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        ).repartition(3)
        out = (
            chunk_documents(ds, size=64, stride=48)
            .sort(["doc_id", "chunk_idx"])
            .to_pandas()
        )
        expected = []
        for d, t in enumerate(texts):
            for idx, chunk, nw in self._chunks_brute(t, 64, 48):
                expected.append((d, idx, chunk, nw))
        got = list(
            out[["doc_id", "chunk_idx", "chunk_text", "n_words_chunk"]].itertuples(
                index=False, name=None
            )
        )
        assert got == expected

    def test_bad_params(self, ray_session):
        import pytest

        from texoo_ray.pipelines.curation import chunk_documents

        with pytest.raises(ValueError):
            chunk_documents(None, size=4, stride=8)


class TestPropsStats:
    def test_extract_and_agg(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.analytics import props_stats

        rows = [
            ("click", '{"k": 5}'),
            ("click", '{"k": -2}'),
            ("click", '{"other": 1}'),
            ("view", '{"k": 0}'),
            ("view", None),
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([r[0] for r in rows], pa.string()),
                    "props": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        ).repartition(2)
        out = props_stats(ds).to_pandas().set_index("event_type")
        assert out.loc["click", "n_events"] == 3
        assert out.loc["click", "n_with_key"] == 2
        assert out.loc["click", "sum_v"] == 3
        assert out.loc["click", "min_v"] == -2
        assert out.loc["click", "max_v"] == 5
        assert out.loc["view", "n_events"] == 2
        assert out.loc["view", "n_with_key"] == 1
        assert out.loc["view", "sum_v"] == 0
