"""Bigram-LM scoring unit tests (stages/lm.py)."""

import math

import pyarrow as pa
import pytest


def _ds(docs):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs]),
            }
        )
    ).repartition(2)


def _micro(cuv, cu, V):
    return math.floor(math.log(float(cuv + 1) / (float(cu) + float(V))) * 1e6 + 0.5)


class TestLineDedup:
    def _ds(self, rows):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                }
            )
        ).repartition(2)

    def test_removes_only_above_threshold(self, ray_session):
        from texoo_ray.stages.dedup import line_dedup

        boiler = "ACCEPT COOKIES"
        rows = [(i, boiler + "\ncontent %d" % i) for i in range(4)]
        rows.append((99, "at threshold\nunique tail"))
        rows.append((98, "at threshold\nother tail"))
        # boiler occurs 4x (> max=3, removed); "at threshold" 2x (kept)
        out = (
            line_dedup(self._ds(rows), max_occurrences=3)
            .to_pandas()
            .set_index("doc_id")
        )
        assert out.loc[0, "clean_text"] == "content 0"
        assert out.loc[0, "n_removed"] == 1 and out.loc[0, "n_kept"] == 1
        assert out.loc[99, "clean_text"] == "at threshold\nunique tail"
        assert out.loc[99, "n_removed"] == 0

    def test_exact_match_no_normalization(self, ray_session):
        from texoo_ray.stages.dedup import line_dedup

        rows = [(i, "dup line \nbody %d" % i) for i in range(3)] + [
            (9, "dup line\nbody2")
        ]
        out = (
            line_dedup(self._ds(rows), max_occurrences=2)
            .to_pandas()
            .set_index("doc_id")
        )
        # "dup line " (trailing space, 3x) removed; "dup line" (1x) kept
        assert out.loc[0, "clean_text"] == "body 0"
        assert out.loc[9, "clean_text"] == "dup line\nbody2"

    def test_fully_removed_doc_is_empty_string(self, ray_session):
        from texoo_ray.stages.dedup import line_dedup

        rows = [(i, "same") for i in range(5)]
        out = line_dedup(self._ds(rows), max_occurrences=1).to_pandas()
        assert (out["clean_text"] == "").all()
        assert (out["n_kept"] == 0).all() and (out["n_removed"] == 1).all()


class TestIntraDocLineDedup:
    def test_keep_first_order_preserved(self, ray_session):
        import ray.data

        from texoo_ray.stages.dedup import intra_doc_line_dedup

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a\nb\na\nc\nb", "x"]),
                }
            )
        )
        out = intra_doc_line_dedup(ds).to_pandas().set_index("doc_id")
        assert out.loc[1, "clean_text"] == "a\nb\nc"
        assert out.loc[1, "n_kept"] == 3 and out.loc[1, "n_removed"] == 2
        assert out.loc[2, "clean_text"] == "x" and out.loc[2, "n_removed"] == 0


class TestNgramLogprob:
    def test_hand_computed_scores(self, ray_session):
        from texoo_ray.stages.lm import ngram_logprob

        # corpus: "a b a b" / "a b c"
        # unigrams: a=3 b=3 c=1 -> V=3
        # bigrams: "a b"=3, "b a"=1, "b c"=1
        docs = [(1, "a b a b"), (2, "a b c")]
        out = ngram_logprob(_ds(docs)).to_pandas().set_index("doc_id")
        V = 3
        d1 = _micro(3, 3, V) * 2 + _micro(1, 3, V)  # a-b, b-a, a-b
        d2 = _micro(3, 3, V) + _micro(1, 3, V)      # a-b, b-c
        assert out.loc[1, "n_bigrams"] == 3
        assert out.loc[1, "sum_logprob_micro"] == d1
        assert out.loc[2, "n_bigrams"] == 2
        assert out.loc[2, "sum_logprob_micro"] == d2

    def test_short_and_empty_docs_score_zero(self, ray_session):
        from texoo_ray.stages.lm import ngram_logprob

        docs = [(1, "hello world hello"), (2, "single"), (3, ""), (4, "   ")]
        out = ngram_logprob(_ds(docs)).to_pandas().set_index("doc_id")
        assert len(out) == 4
        for d in (2, 3, 4):
            assert out.loc[d, "n_bigrams"] == 0
            assert out.loc[d, "sum_logprob_micro"] == 0
        assert out.loc[1, "n_bigrams"] == 2

    def test_all_docs_tokenless(self, ray_session):
        from texoo_ray.stages.lm import ngram_logprob

        docs = [(1, ""), (2, "!!"), (3, None)]
        out = ngram_logprob(_ds(docs)).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2, 3]
        assert (out["n_bigrams"] == 0).all()
        assert (out["sum_logprob_micro"] == 0).all()

    def test_repeated_doc_scores_identical(self, ray_session):
        from texoo_ray.stages.lm import ngram_logprob

        docs = [(i, "the cat sat on the mat") for i in range(6)]
        out = ngram_logprob(_ds(docs)).to_pandas()
        assert out["sum_logprob_micro"].nunique() == 1
        assert (out["n_bigrams"] == 5).all()


class TestDsirLogratio:
    def _ds(self, rows):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "is_target": pa.array([r[1] for r in rows], pa.bool_()),
                    "text": pa.array([r[2] for r in rows]),
                }
            )
        ).repartition(3)

    @staticmethod
    def _brute(rows):
        from collections import Counter

        cr, ct = Counter(), Counter()
        import re

        tok = lambda t: re.findall(r"[a-z0-9]+", t.lower())
        for _, tgt, t in rows:
            for w in tok(t):
                cr[w] += 1
                if tgt:
                    ct[w] += 1
        V = float(len(cr))
        NR = float(sum(cr.values()))
        NT = float(sum(ct.values()))
        out = {}
        for d, _, t in rows:
            ws = tok(t)
            s = 0
            for w in ws:
                lg = math.log(float(ct[w] + 1) / (NT + V)) - math.log(
                    float(cr[w] + 1) / (NR + V)
                )
                s += math.floor(lg * 1e6 + 0.5)
            out[d] = (len(ws), s)
        return out

    def test_matches_brute_force(self, ray_session):
        from texoo_ray.stages.lm import dsir_logratio

        rows = [
            (1, True, "math proof lemma theorem proof"),
            (2, True, "lemma math math"),
            (3, False, "cat dog cat"),
            (4, False, "dog proof cat lemma"),
            (5, False, ""),
        ]
        out = (
            dsir_logratio(self._ds(rows))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._brute(rows)
        assert out["doc_id"].tolist() == [1, 2, 3, 4, 5]
        for _, r in out.iterrows():
            nw, s = want[r["doc_id"]]
            assert r["n_words"] == nw
            assert r["dsir_micro"] == s
        # target-like docs must outrank raw-like docs
        scores = dict(zip(out["doc_id"], out["dsir_micro"]))
        assert scores[1] > scores[3] and scores[2] > scores[4]

    def test_join_path_matches_broadcast_path(self, ray_session):
        from texoo_ray.stages.lm import dsir_logratio

        rows = [
            (1, True, "math proof lemma theorem proof"),
            (2, False, "cat dog cat"),
            (3, False, ""),
            (4, False, "dog proof"),
        ]
        want = self._brute(rows)
        out = (
            dsir_logratio(self._ds(rows), broadcast_vocab_max=0)  # force join
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == [1, 2, 3, 4]
        for _, r in out.iterrows():
            nw, s = want[r["doc_id"]]
            assert r["n_words"] == nw and r["dsir_micro"] == s

    def test_no_target_rows_still_scores(self, ray_session):
        from texoo_ray.stages.lm import dsir_logratio

        rows = [(1, False, "a b"), (2, False, "b c")]
        out = (
            dsir_logratio(self._ds(rows))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._brute(rows)
        for _, r in out.iterrows():
            assert r["dsir_micro"] == want[r["doc_id"]][1]


class TestPerplexityBuckets:
    """lm_perplexity_buckets vs a pure-Python recompute of the whole
    pipeline (bigram Laplace LM -> floor-div mean micro-nats ->
    per-lang percentile_disc cutoffs -> bucket)."""

    @staticmethod
    def _brute(rows, q_low=0.25, q_high=0.75):
        import math
        import re

        tok = {
            i: re.findall(r"[a-z0-9]+", t.lower()) for i, _, t in rows
        }
        uni, bi = {}, {}
        for ws in tok.values():
            for w in ws:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(ws, ws[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        V = len(uni)
        avg = {}
        for i, _, _ in rows:
            ws = tok[i]
            if len(ws) < 2:
                continue
            s = 0
            for a, b in zip(ws, ws[1:]):
                p = (bi[(a, b)] + 1) / (uni[a] + V)
                s += math.floor(math.log(p) * 1e6 + 0.5)
            avg[i] = s // (len(ws) - 1)  # python floor div == np
        langs = {i: l for i, l, _ in rows}
        cuts = {}
        for lang in set(langs.values()):
            vals = sorted(v for i, v in avg.items() if langs[i] == lang)
            n = len(vals)
            lo = vals[math.ceil(q_low * n) - 1]
            hi = vals[math.ceil(q_high * n) - 1]
            cuts[lang] = (lo, hi)
        out = {}
        for i, v in avg.items():
            lo, hi = cuts[langs[i]]
            out[i] = (v, "tail" if v <= lo else ("middle" if v <= hi else "head"))
        return out

    def test_matches_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.stages.lm import lm_perplexity_buckets

        rows = [
            (1, "en", "the cat sat on the mat"),
            (2, "en", "the cat sat on the mat again and again"),
            (3, "en", "zx qv plonk erratic entropy stew"),
            (4, "en", "the dog sat on the log"),
            (5, "en", "cat mat cat mat cat mat"),
            (6, "de", "der hund und der hund"),
            (7, "de", "katze maus katze maus"),
            (8, "de", "der maus und die katze hund"),
            (9, "de", "ein wort"),
            (10, "en", "solo"),  # 1 token -> no bigrams -> dropped
            (11, "en", ""),      # empty -> dropped
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "lang": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        )
        out = (
            lm_perplexity_buckets(ray.data.from_arrow(tbl).repartition(3))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._brute(rows)
        assert out["doc_id"].tolist() == sorted(want)
        for _, r in out.iterrows():
            v, b = want[r["doc_id"]]
            assert r["avg_logprob_micro"] == v, r["doc_id"]
            assert r["bucket"] == b, r["doc_id"]


class TestNgramLogprobPaths:
    """The broadcast-model fast path and the big-big join path must be
    row-identical (the dsir broadcast_vocab_max precedent)."""

    def test_broadcast_equals_join_path(self, ray_session):
        import ray.data

        from texoo_ray.stages.lm import ngram_logprob

        rows = [
            (1, "the cat sat on the mat"),
            (2, "the cat sat"),
            (3, ""),
            (4, "solo"),
            (5, "cat mat cat mat cat"),
            (6, "zx qv plonk zx qv"),
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        fast = (
            ngram_logprob(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        join = (
            ngram_logprob(ds, broadcast_model_max=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert fast["doc_id"].tolist() == join["doc_id"].tolist()
        assert fast["n_bigrams"].tolist() == join["n_bigrams"].tolist()
        assert (
            fast["sum_logprob_micro"].tolist()
            == join["sum_logprob_micro"].tolist()
        )

    def test_over_threshold_falls_back(self, ray_session):
        import ray.data

        from texoo_ray.stages.lm import ngram_logprob

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a b c", "b c d"], pa.string()),
            }
        )
        ds = ray.data.from_arrow(tbl)
        # model = 4 words + 4 bigrams = 8 rows > 2 -> falls back to join
        out = (
            ngram_logprob(ds, broadcast_model_max=2)
            .to_pandas()
            .sort_values("doc_id")
        )
        want = ngram_logprob(ds).to_pandas().sort_values("doc_id")
        assert out["sum_logprob_micro"].tolist() == want[
            "sum_logprob_micro"
        ].tolist()


class TestKneserNey:
    @staticmethod
    def _brute(rows, d=0.75):
        import math
        import re

        tok = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in rows}
        uni, bi = {}, {}
        for ws in tok.values():
            for w in ws:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(ws, ws[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        n1u, n1v = {}, {}
        for (a, b) in bi:
            n1u[a] = n1u.get(a, 0) + 1
            n1v[b] = n1v.get(b, 0) + 1
        n1all = len(bi)
        out = {}
        for i, _ in rows:
            ws = tok[i]
            s = 0
            for a, b in zip(ws, ws[1:]):
                p = (
                    max(float(bi[(a, b)]) - d, 0.0)
                    + (d * float(n1u[a])) * (float(n1v[b]) / float(n1all))
                ) / float(uni[a])
                s += math.floor(math.log(p) * 1e6 + 0.5)
            out[i] = (max(len(ws) - 1, 0), s)
        return out

    def test_matches_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.stages.lm import kn_logprob

        rows = [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the cat"),
            (3, "dog dog dog dog"),
            (4, "one two"),
            (5, ""),
            (6, "solo"),
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
        out = (
            kn_logprob(ray.data.from_arrow(tbl).repartition(3))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._brute(rows)
        assert out["doc_id"].tolist() == [1, 2, 3, 4, 5, 6]
        for _, r in out.iterrows():
            nb, s = want[r["doc_id"]]
            assert r["n_bigrams"] == nb, r["doc_id"]
            assert r["sum_kn_micro"] == s, r["doc_id"]

    def test_model_too_big_raises(self, ray_session):
        import pytest
        import ray.data

        from texoo_ray.stages.lm import kn_logprob

        tbl = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["a b c d e"], pa.string()),
            }
        )
        with pytest.raises(Exception):
            kn_logprob(ray.data.from_arrow(tbl), model_max=2).to_pandas()
