"""Exact-statistic operators: AUC, kappa, grouped OLS, readability,
PMI collocations, link prediction — brute-force references throughout."""

import math

import numpy as np
import pyarrow as pa


def _brute_auc(scores, labels):
    pos = [s for s, l in zip(scores, labels) if l == 1]
    neg = [s for s, l in zip(scores, labels) if l == 0]
    u2 = 0
    for p in pos:
        for q in neg:
            if p > q:
                u2 += 2
            elif p == q:
                u2 += 1
    return len(pos), len(neg), u2


class TestAucExact:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.evaluate import auc_exact

        rng = np.random.RandomState(7)
        scores = rng.randint(0, 12, size=400).tolist()
        labels = [1 if rng.rand() < 0.3 + 0.04 * s else 0 for s in scores]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "score": pa.array(scores, pa.int64()),
                    "label": pa.array(labels, pa.int64()),
                }
            )
        ).repartition(5)
        out = auc_exact(ds).to_pandas()
        npos, nneg, u2 = _brute_auc(scores, labels)
        assert len(out) == 1
        r = out.iloc[0]
        assert (r["n_pos"], r["n_neg"], r["u2"]) == (npos, nneg, u2)
        assert r["auc_den"] == 2 * npos * nneg
        # the score was built to correlate with the label
        assert r["u2"] / r["auc_den"] > 0.6

    def test_perfect_and_degenerate(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.evaluate import auc_exact

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "score": pa.array([1, 2, 3, 4], pa.int64()),
                    "label": pa.array([0, 0, 1, 1], pa.int64()),
                }
            )
        )
        r = auc_exact(ds).to_pandas().iloc[0]
        assert r["u2"] == r["auc_den"] == 8  # AUC exactly 1
        ds1 = ray.data.from_arrow(
            pa.table(
                {
                    "score": pa.array([5, 6], pa.int64()),
                    "label": pa.array([1, 1], pa.int64()),
                }
            )
        )
        r1 = auc_exact(ds1).to_pandas().iloc[0]
        assert r1["auc_den"] == 0 and r1["n_neg"] == 0


class TestKappa:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.evaluate import kappa_agreement

        rng = np.random.RandomState(11)
        a = rng.randint(0, 3, size=300)
        # b agrees with a ~70% of the time
        b = np.where(rng.rand(300) < 0.7, a, rng.randint(0, 3, size=300))
        ds = ray.data.from_arrow(
            pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
        ).repartition(4)
        r = kappa_agreement(ds).to_pandas().iloc[0]
        n = 300
        agree = int((a == b).sum())
        chance = sum(
            int((a == k).sum()) * int((b == k).sum()) for k in range(3)
        )
        assert r["n"] == n and r["n_agree"] == agree and r["chance"] == chance
        assert r["kappa_num"] == n * agree - chance
        assert r["kappa_den"] == n * n - chance
        # sanity: the planted 70% agreement is well above chance
        assert 0.3 < r["kappa_num"] / r["kappa_den"] < 0.9

    def test_perfect_agreement(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.evaluate import kappa_agreement

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([0, 1, 0, 1], pa.int64()),
                    "b": pa.array([0, 1, 0, 1], pa.int64()),
                }
            )
        )
        r = kappa_agreement(ds).to_pandas().iloc[0]
        assert r["kappa_num"] == r["kappa_den"] > 0  # kappa == 1


class TestGroupRegression:
    def test_vs_polyfit(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.relational import group_regression

        rng = np.random.RandomState(3)
        gs, xs, ys = [], [], []
        truth = {}
        for g, slope in (("a", 3), ("b", -2)):
            x = np.arange(50)
            y = slope * x + 7 + rng.randint(-4, 5, size=50)
            gs += [g] * 50
            xs += x.tolist()
            ys += y.tolist()
            truth[g] = (x, y)
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "g": gs,
                    "x": pa.array(xs, pa.int64()),
                    "y": pa.array(ys, pa.int64()),
                }
            )
        ).repartition(3)
        out = group_regression(ds, "g", "x", "y").to_pandas().set_index("g")
        for g, (x, y) in truth.items():
            r = out.loc[g]
            n = len(x)
            assert r["n"] == n
            assert r["sum_x"] == x.sum() and r["sum_y"] == y.sum()
            num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
            den = n * int((x * x).sum()) - int(x.sum()) ** 2
            assert r["slope_num"] == num and r["slope_den"] == den
            fit = np.polyfit(x, y, 1)[0]
            assert abs(num / den - fit) < 1e-9

    def test_overflow_raises(self, ray_session):
        import pytest
        import ray.data

        from texoo_ray.pipelines.relational import group_regression

        big = 2**31
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "g": ["a"] * 4,
                    "x": pa.array([big, big + 1, big + 2, big + 3], pa.int64()),
                    "y": pa.array([big] * 4, pa.int64()),
                }
            )
        )
        with pytest.raises(Exception):
            group_regression(ds, "g", "x", "y").to_pandas()


class TestReadability:
    def test_hand_computed(self, ray_session):
        from texoo_ray.stages.text_stats import readability

        batch = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "The cat sat. It sat!",  # W=5 S=2 Y=5 (one group each)
                    "",  # W=0 row
                    "xyz zz",  # no vowels: W=2 S=1(min) Y=2 (min-1 rule)
                ],
            }
        )
        out = readability(batch).to_pandas().set_index("doc_id")
        r1 = out.loc[1]
        assert (r1["n_words"], r1["n_sents"], r1["n_syllables"]) == (5, 2, 5)
        assert r1["flesch_num"] == 206835 * 2 * 5 - 1015 * 25 - 84600 * 5 * 2
        assert r1["flesch_den"] == 1000 * 2 * 5
        # score = 206.835 - 1.015*2.5 - 84.6*1.0 = 119.6975
        assert abs(r1["flesch_num"] / r1["flesch_den"] - 119.6975) < 1e-9
        r2 = out.loc[2]
        assert r2["n_words"] == 0 and r2["flesch_den"] == 0
        r3 = out.loc[3]
        assert (r3["n_words"], r3["n_sents"], r3["n_syllables"]) == (2, 1, 2)

    def test_vowel_groups(self, ray_session):
        from texoo_ray.stages.text_stats import readability

        batch = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": ["beautiful day everybody"],
            }
        )
        r = readability(batch).to_pandas().iloc[0]
        # beautiful: eau-i-u = 3 groups; day: ay = 1; everybody: e-e-y-o-y = 5
        assert r["n_syllables"] == 9


def _brute_pmi(texts, min_count):
    import re
    from collections import Counter

    uni, bi = Counter(), Counter()
    total = 0
    for t in texts:
        ws = re.findall(r"[a-z0-9]+", t.lower())
        uni.update(ws)
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
            total += 1
    out = []
    for (a, b), n in bi.items():
        if n >= min_count:
            pmi = math.floor(
                math.log((n * total) / (uni[a] * uni[b])) * 1e6 + 0.5
            )
            out.append((a, b, n, int(pmi)))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out


class TestPmiCollocations:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.stages.lm import pmi_collocations

        texts = (
            ["the quick brown fox jumps over the lazy dog"] * 4
            + ["new york city is big", "new york state is big"] * 3
            + ["machine learning models learn machine learning fast"] * 2
            + ["odd one out"]
        )
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
        ).repartition(4)
        out = pmi_collocations(ds, min_count=3, top_k=10).to_pandas()
        ref = _brute_pmi(texts, 3)[:10]
        got = [
            (r["w1"], r["w2"], r["n"], r["pmi_micro"])
            for _, r in out.iterrows()
        ]
        assert got == ref

    def test_empty_corpus(self, ray_session):
        import ray.data

        from texoo_ray.stages.lm import pmi_collocations

        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([1], pa.int64()), "text": [""]})
        )
        assert pmi_collocations(ds).count() == 0


def _brute_link_pred(edges, max_degree, w_scale):
    from collections import defaultdict

    es = set()
    for s, d in edges:
        if s != d:
            es.add((min(s, d), max(s, d)))
    nbrs = defaultdict(set)
    for lo, hi in es:
        nbrs[lo].add(hi)
        nbrs[hi].add(lo)
    cand = defaultdict(lambda: [0, 0])
    for z, ns in nbrs.items():
        if len(ns) > max_degree:
            continue
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                cand[p][0] += 1
                cand[p][1] += w_scale // len(nbrs[z])
    out = [
        (lo, hi, c, ra)
        for (lo, hi), (c, ra) in cand.items()
        if (lo, hi) not in es
    ]
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out


class TestLinkPrediction:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.graph import link_prediction

        rng = np.random.RandomState(5)
        edges = [
            (int(rng.randint(0, 40)), int(rng.randint(0, 40)))
            for _ in range(150)
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([e[0] for e in edges], pa.int64()),
                    "dst": pa.array([e[1] for e in edges], pa.int64()),
                }
            )
        ).repartition(4)
        out = link_prediction(ds, top_k=25).to_pandas()
        ref = _brute_link_pred(edges, 64, 10**9)[:25]
        got = [
            (r["lo"], r["hi"], r["n_common"], r["ra_micro"])
            for _, r in out.iterrows()
        ]
        assert got == ref

    def test_degree_cap_and_antijoin(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.graph import link_prediction

        # star: hub 0 joined to 1..9 (deg 9), plus edge (1,2).
        # With max_degree=3 the hub generates NO wedges; middles 1 and 2
        # (deg 2) each connect {0, other} -> candidate (0, x) pairs are
        # real edges (dropped); only wedge left: none beyond those.
        edges = [(0, i) for i in range(1, 10)] + [(1, 2)]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([e[0] for e in edges], pa.int64()),
                    "dst": pa.array([e[1] for e in edges], pa.int64()),
                }
            )
        )
        out = link_prediction(ds, top_k=100, max_degree=3).to_pandas()
        ref = _brute_link_pred(edges, 3, 10**9)
        got = [
            (r["lo"], r["hi"], r["n_common"], r["ra_micro"])
            for _, r in out.iterrows()
        ]
        assert got == ref
        # and with the cap lifted, the hub's wedges appear
        out2 = link_prediction(ds, top_k=100, max_degree=64).to_pandas()
        ref2 = _brute_link_pred(edges, 64, 10**9)
        assert len(out2) == len(ref2) > len(ref)
        # an existing edge never appears as a prediction
        pairs = set(zip(out2["lo"], out2["hi"]))
        assert (1, 2) not in pairs and (0, 1) not in pairs


def _brute_ari(pred, gold):
    from collections import Counter

    conf = Counter(zip(pred, gold))
    n = len(pred)
    row, col = Counter(pred), Counter(gold)
    c2 = lambda v: v * (v - 1) // 2
    sij = sum(c2(v) for v in conf.values())
    sa = sum(c2(v) for v in row.values())
    sb = sum(c2(v) for v in col.values())
    cn2 = c2(n)
    purity = sum(
        max(v for (p2, _), v in conf.items() if p2 == p) for p in row
    )
    return (
        n, sij, sa, sb, purity,
        2 * (cn2 * sij - sa * sb),
        cn2 * (sa + sb) - 2 * sa * sb,
    )


class TestClusteringEval:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.evaluate import clustering_eval

        rng = np.random.RandomState(9)
        gold = rng.randint(0, 4, size=500)
        # pred mostly mirrors gold with relabeled ids + 20% noise
        pred = np.where(
            rng.rand(500) < 0.8, (gold + 7) * 3, rng.randint(0, 12, size=500)
        )
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "pred": pa.array(pred, pa.int64()),
                    "gold": pa.array(gold, pa.int64()),
                }
            )
        ).repartition(4)
        r = clustering_eval(ds).to_pandas().iloc[0]
        n, sij, sa, sb, pur, num, den = _brute_ari(pred.tolist(), gold.tolist())
        assert (
            r["n"], r["sum_comb"], r["comb_a"], r["comb_b"], r["purity_num"],
            r["ari_num"], r["ari_den"],
        ) == (n, sij, sa, sb, pur, num, den)
        assert 0.3 < r["ari_num"] / r["ari_den"] < 0.95

    def test_perfect_clustering(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.evaluate import clustering_eval

        gold = [0, 0, 1, 1, 2, 2]
        pred = [5, 5, 9, 9, 7, 7]  # same partition, different ids
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "pred": pa.array(pred, pa.int64()),
                    "gold": pa.array(gold, pa.int64()),
                }
            )
        )
        r = clustering_eval(ds).to_pandas().iloc[0]
        assert r["ari_num"] == r["ari_den"] > 0  # ARI exactly 1
        assert r["purity_num"] == 6


class TestHostGini:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.curation import host_gini

        # 3 hosts with 1 / 3 / 6 docs (canonicalization collapses case)
        urls = (
            ["http://A.com/x"]
            + ["http://b.com/%d" % i for i in range(3)]
            + ["HTTP://B.ORG:80/%d" % i for i in range(6)]
        )
        ds = ray.data.from_arrow(pa.table({"url": urls})).repartition(3)
        r = host_gini(ds).to_pandas().iloc[0]
        x = sorted([1, 3, 6])
        n, tot = 3, 10
        num = 2 * sum((i + 1) * v for i, v in enumerate(x)) - (n + 1) * tot
        assert (r["n_hosts"], r["total_docs"]) == (n, tot)
        assert r["gini_num"] == num and r["gini_den"] == n * tot
        # uniform distribution -> Gini 0
        ds2 = ray.data.from_arrow(
            pa.table({"url": ["http://h%d.com/" % i for i in range(5)]})
        )
        r2 = host_gini(ds2).to_pandas().iloc[0]
        assert r2["gini_num"] == 0


class TestTermBurstiness:
    def test_vs_brute_force(self, ray_session):
        import re
        from collections import Counter

        import ray.data

        from texoo_ray.stages.text_stats import term_burstiness

        texts = [
            "alpha alpha alpha beta",
            "beta gamma",
            "alpha alpha beta gamma gamma",
            "",
            "delta beta",
        ]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
        ).repartition(3)
        out = term_burstiness(ds, vocab_size=3).to_pandas()
        N = 5
        stats = {}
        for t in texts:
            for w, c in Counter(re.findall(r"[a-z0-9]+", t.lower())).items():
                df, sc, sc2 = stats.get(w, (0, 0, 0))
                stats[w] = (df + 1, sc + c, sc2 + c * c)
        ref = sorted(stats.items(), key=lambda kv: (-kv[1][0], kv[0]))[:3]
        assert len(out) == 3
        for (w, (df, sc, sc2)), (_, r) in zip(ref, out.iterrows()):
            assert r["word"] == w and r["df"] == df
            assert r["sum_c"] == sc and r["sum_c2"] == sc2
            assert r["vmr_num"] == N * sc2 - sc * sc
            assert r["vmr_den"] == N * sc
        # beta appears once in 4 docs (near-Poisson), alpha is bursty:
        beta = out[out["word"] == "beta"].iloc[0]
        alpha = out[out["word"] == "alpha"].iloc[0]
        assert (
            alpha["vmr_num"] / alpha["vmr_den"]
            > beta["vmr_num"] / beta["vmr_den"]
        )


class TestMixtureWeights:
    def test_vs_math(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.curation import mixture_weights

        srcs = ["a"] * 16 + ["b"] * 4 + ["c"] * 1
        ds = ray.data.from_arrow(pa.table({"source": srcs})).repartition(3)
        out = mixture_weights(ds, alpha=0.5).to_pandas().set_index("source")
        for s, n in (("a", 16), ("b", 4), ("c", 1)):
            assert out.loc[s, "n_docs"] == n
            assert out.loc[s, "pow_micro"] == math.floor(
                math.exp(0.5 * math.log(n)) * 1e6 + 0.5
            )
        # alpha=0.5 compresses the 16:4:1 ratio to 4:2:1
        assert out.loc["a", "pow_micro"] == 4_000_000
        assert out.loc["b", "pow_micro"] == 2_000_000
        assert out.loc["c", "pow_micro"] == 1_000_000
        # alpha=1 reproduces raw counts; alpha=0 flattens
        o1 = mixture_weights(ds, alpha=1.0).to_pandas().set_index("source")
        assert o1.loc["a", "pow_micro"] == 16_000_000
        o0 = mixture_weights(ds, alpha=0.0).to_pandas().set_index("source")
        assert set(o0["pow_micro"]) == {1_000_000}


class TestDistinctNgramRatio:
    def test_vs_brute_force(self, ray_session):
        import re

        from texoo_ray.stages.text_stats import distinct_ngram_ratio

        texts = [
            "the cat the cat the cat",   # heavy repetition
            "one two three four five",   # fully diverse
            "",                          # empty
            "solo",                      # single word: no bigrams
        ]
        batch = pa.table(
            {"doc_id": pa.array(range(4), pa.int64()), "text": texts}
        )
        out = distinct_ngram_ratio(batch).to_pandas().set_index("doc_id")
        for i, t in enumerate(texts):
            ws = re.findall(r"[a-z0-9]+", t.lower())
            bgs = list(zip(ws, ws[1:]))
            r = out.loc[i]
            assert r["t1"] == len(ws) and r["d1"] == len(set(ws))
            assert r["t2"] == len(bgs) and r["d2"] == len(set(bgs))
        # the repetitive doc scores far below the diverse one
        rep, div = out.loc[0], out.loc[1]
        assert rep["d2"] / rep["t2"] < 0.5 and div["d2"] / div["t2"] == 1.0


class TestMadOutliers:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.analytics import mad_outliers

        # bulk around 100 +- 3, with two gross outliers
        vals = [100, 101, 99, 102, 98, 100, 103, 97, 100, 500, -300]
        ids = list(range(len(vals)))
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "v": pa.array(vals, pa.int64()),
                }
            )
        ).repartition(3)
        out = mad_outliers(ds, "v", k=5).to_pandas()
        sv = sorted(vals)
        med = sv[(len(vals) + 1) // 2 - 1]  # percentile_disc(0.5)
        devs = sorted(abs(x - med) for x in vals)
        mad = devs[(len(vals) + 1) // 2 - 1]
        ref = [
            (i, x, abs(x - med))
            for i, x in zip(ids, vals)
            if abs(x - med) > 5 * mad
        ]
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == ref
        assert {x for _, x, _ in got} == {500, -300}

    def test_no_outliers_and_ties(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.analytics import mad_outliers

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(range(6), pa.int64()),
                    "v": pa.array([5, 5, 5, 5, 5, 5], pa.int64()),
                }
            )
        )
        assert mad_outliers(ds, "v", k=3).count() == 0
        # MAD = 0 (over half the mass at the median): ANY deviation is
        # an outlier — the classic Hampel degenerate case
        ds2 = ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(range(6), pa.int64()),
                    "v": pa.array([5, 5, 5, 6, 6, 6], pa.int64()),
                }
            )
        )
        out = mad_outliers(ds2, "v", k=3).to_pandas()
        assert list(out["v"]) == [6, 6, 6]


class TestLogOddsTerms:
    def test_vs_brute_force(self, ray_session):
        import math
        import re
        from collections import Counter

        import ray.data

        from texoo_ray.stages.text_stats import log_odds_terms

        docs_a = ["taxes economy taxes budget growth"] * 5 + [
            "common words appear here often"
        ] * 5
        docs_b = ["climate planet climate energy future"] * 5 + [
            "common words appear here often"
        ] * 5
        texts = docs_a + docs_b
        sides = ["L"] * 10 + ["R"] * 10
        ds = ray.data.from_arrow(
            pa.table({"text": texts, "side": sides})
        ).repartition(4)
        out = log_odds_terms(
            ds, "side", "L", "R", min_count=3, top_k=10
        ).to_pandas()

        ca, cb = Counter(), Counter()
        for t, s in zip(texts, sides):
            (ca if s == "L" else cb).update(re.findall(r"[a-z0-9]+", t))
        na, nb = sum(ca.values()), sum(cb.values())
        a0 = na + nb
        ref = []
        for w in set(ca) | set(cb):
            aw = ca[w] + cb[w]
            if aw < 3:
                continue
            ra = (ca[w] + aw) / (na + a0 - ca[w] - aw)
            rb = (cb[w] + aw) / (nb + a0 - cb[w] - aw)
            ref.append(
                (
                    w, ca[w], cb[w],
                    math.floor((math.log(ra) - math.log(rb)) * 1e6 + 0.5),
                )
            )
        ref.sort(key=lambda r: (-r[3], r[0]))
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == ref[:10]
        # side-A markers rank top, shared words sit in the middle
        assert got[0][0] in {"taxes", "economy", "budget", "growth"}
        assert all(g[3] > 0 for g in got[:2])


class TestSourceKL:
    def test_vs_brute_force(self, ray_session):
        import math
        import re
        from collections import Counter, defaultdict

        import ray.data

        from texoo_ray.stages.text_stats import source_kl

        texts = (
            ["alpha beta gamma delta"] * 4
            + ["alpha alpha alpha beta"] * 3
            + ["epsilon zeta epsilon zeta zeta"] * 3
        )
        srcs = ["web"] * 4 + ["chat"] * 3 + ["code"] * 3
        ds = ray.data.from_arrow(
            pa.table({"text": texts, "source": srcs})
        ).repartition(4)
        out = source_kl(ds).to_pandas()

        per_src = defaultdict(Counter)
        for t, s in zip(texts, srcs):
            per_src[s].update(re.findall(r"[a-z0-9]+", t.lower()))
        corpus = Counter()
        for c in per_src.values():
            corpus.update(c)
        n = sum(corpus.values())
        ref = []
        for s in sorted(per_src):
            c = per_src[s]
            ns = sum(c.values())
            kl = sum(
                cnt
                * math.floor(
                    math.log((cnt / ns) / (corpus[w] / n)) * 1e6 + 0.5
                )
                for w, cnt in c.items()
            )
            ref.append((s, len(c), ns, kl))
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == ref
        # the identical-distribution check: a source matching the
        # corpus mix has small positive KL, a skewed one large
        by_src = {r[0]: r[3] / (r[2] * 1e6) for r in got}
        assert by_src["code"] > by_src["web"]
        assert all(v >= -1e-6 for v in by_src.values())

    def test_empty(self, ray_session):
        import ray.data

        from texoo_ray.stages.text_stats import source_kl

        ds = ray.data.from_arrow(
            pa.table({"text": ["", "   "], "source": ["a", "b"]})
        )
        assert source_kl(ds).count() == 0


class TestEventPaths3:
    def test_vs_brute_force(self, ray_session):
        from collections import Counter

        import pandas as pd
        import ray.data

        from texoo_ray.pipelines.analytics import event_paths3

        rows = [
            # user 1: a -> b -> c -> b (two triples; b/c share ts,
            # event_id breaks the tie)
            {"user_id": 1, "event_type": "a", "ts": 100, "event_id": 1},
            {"user_id": 1, "event_type": "c", "ts": 200, "event_id": 3},
            {"user_id": 1, "event_type": "b", "ts": 200, "event_id": 2},
            {"user_id": 1, "event_type": "b", "ts": 300, "event_id": 4},
            # user 2: only two events -> no triple crosses users
            {"user_id": 2, "event_type": "a", "ts": 50, "event_id": 5},
            {"user_id": 2, "event_type": "b", "ts": 60, "event_id": 6},
            # user 3: a,a,a twice over -> (a,a,a) x2
            {"user_id": 3, "event_type": "a", "ts": 10, "event_id": 7},
            {"user_id": 3, "event_type": "a", "ts": 20, "event_id": 8},
            {"user_id": 3, "event_type": "a", "ts": 30, "event_id": 9},
            {"user_id": 3, "event_type": "a", "ts": 40, "event_id": 10},
        ]
        for r in rows:
            r["ts"] = pd.Timestamp(r["ts"], unit="s")
        ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
        out = event_paths3(ds, top_k=10, n_buckets=4).to_pandas()

        ref = Counter()
        by_user = {}
        for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
            by_user.setdefault(r["user_id"], []).append(r["event_type"])
        for seq in by_user.values():
            for i in range(len(seq) - 2):
                ref[tuple(seq[i : i + 3])] += 1
        exp = sorted(
            ((n, t) for t, n in ref.items()),
            key=lambda x: (-x[0], x[1]),
        )
        got = [
            ((r.t1, r.t2, r.t3), r.n) for r in out.itertuples(index=False)
        ]
        assert got == [(t, n) for n, t in exp]
        assert ref[("a", "a", "a")] == 2


class TestZipfFit:
    def test_vs_brute_force(self, ray_session):
        import math
        import re
        from collections import Counter

        import ray.data

        from texoo_ray.stages.text_stats import zipf_fit

        # an approximately Zipfian corpus: word_i appears ~ 60 // i times
        words = []
        for i in range(1, 13):
            words += [f"w{i:02d}"] * (60 // i)
        text = " ".join(words)
        ds = ray.data.from_arrow(
            pa.table({"text": [text[: len(text) // 2], text[len(text) // 2 :]]})
        ).repartition(2)
        out = zipf_fit(ds, top_v=10).to_pandas()

        c = Counter(re.findall(r"[a-z0-9]+", text.lower()))
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        n = len(top)
        xs = [math.floor(math.log(r) * 1e6 + 0.5) for r in range(1, n + 1)]
        ys = [math.floor(math.log(cnt) * 1e6 + 0.5) for _, cnt in top]
        sx, sy = sum(xs), sum(ys)
        sxx = sum(v * v for v in xs)
        sxy = sum(a * b for a, b in zip(xs, ys))
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        r = out.iloc[0]
        assert (r["n_terms"], r["sum_x"], r["sum_y"]) == (n, sx, sy)
        assert (r["sum_xx"], r["sum_xy"]) == (sxx, sxy)
        assert r["slope_micro"] == math.floor(float(num) / float(den) * 1e6 + 0.5)
        # a 1/i corpus fits slope ~ -1
        assert -1_300_000 < r["slope_micro"] < -700_000

    def test_degenerate(self, ray_session):
        import ray.data

        from texoo_ray.stages.text_stats import zipf_fit

        ds = ray.data.from_arrow(pa.table({"text": ["solo"]}))
        r = zipf_fit(ds).to_pandas().iloc[0]
        assert r["n_terms"] == 0 and r["slope_micro"] == 0


class TestRollingMedian:
    def test_vs_brute_force(self, ray_session):
        import pandas as pd
        import ray.data

        from texoo_ray.pipelines.analytics import rolling_median

        rows = []
        eid = 0
        vals = {1: [10, 20, 30, 400, 50, 60], 2: [7], 3: [1, 1000]}
        for uid, xs in vals.items():
            for t, x in enumerate(xs):
                rows.append(
                    {
                        "user_id": uid,
                        "event_id": eid,
                        "ts": pd.Timestamp(t * 10, unit="s"),
                        "v": x,
                    }
                )
                eid += 1
        ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
        out = rolling_median(ds, "v", w=2, n_buckets=4).to_pandas()

        def disc(window):
            s = sorted(window)
            return s[(len(s) + 1) // 2 - 1]

        ref = []
        base = 0
        for uid, xs in vals.items():
            for i in range(len(xs)):
                lo, hi = max(0, i - 2), min(len(xs), i + 3)
                ref.append((base + i, xs[i], disc(xs[lo:hi])))
            base += len(xs)
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == ref
        # the spike at 400 is flattened to the window median 50
        assert got[3] == (3, 400, 50)
        # singleton user: median is itself; pair: lower-middle element
        assert got[6] == (6, 7, 7) and got[7] == (7, 1, 1)


class TestTextrankKeywords:
    def test_vs_brute_force(self, ray_session):
        import re

        import ray.data

        from texoo_ray.stages.text_stats import textrank_keywords

        texts = [
            "ray data pipelines stream arrow batches",
            "arrow batches flow through ray data",
            "data pipelines need arrow and ray",
            "tiny of it is dropped here",  # short words filtered out
        ]
        ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(2)
        out = textrank_keywords(ds, top_k=5, min_len=3, iterations=2).to_pandas()

        # brute-force reference: same filtered adjacency, distinct
        # symmetric edges, exact integer 2-round trajectory
        edges = set()
        for t in texts:
            ws = [w for w in re.findall(r"[a-z0-9]+", t.lower()) if len(w) >= 3]
            for a, b in zip(ws, ws[1:]):
                if a != b:
                    edges.add((a, b))
                    edges.add((b, a))
        nodes = {a for a, _ in edges}
        deg = {v: sum(1 for a, _ in edges if a == v) for v in nodes}
        pr = {v: 1_000_000 for v in nodes}
        for _ in range(2):
            nxt = {v: 150_000 for v in nodes}
            for a, b in edges:
                nxt[b] += pr[a] * 85 // (100 * deg[a])
            pr = nxt
        exp = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        got = [(r.word, r.pr) for r in out.itertuples(index=False)]
        assert got == exp
        # hub words of the planted corpus rank at the top
        assert got[0][0] in {"ray", "data", "arrow", "batches", "pipelines"}
        # filtered short words never appear
        assert all(len(w) >= 3 for w, _ in got)

    def test_empty(self, ray_session):
        import ray.data

        from texoo_ray.stages.text_stats import textrank_keywords

        ds = ray.data.from_arrow(pa.table({"text": ["a of it", ""]}))
        assert textrank_keywords(ds).count() == 0

    def test_path_equivalence(self, ray_session):
        """Driver-local and distributed trajectories produce identical
        ranks (the bpe/kcore local-loop precedent)."""
        import ray.data

        from texoo_ray.stages.text_stats import textrank_keywords

        texts = [
            "graph ranks words from edges",
            "edges link words and words link graph nodes",
            "nodes carry ranks through graph edges",
        ]
        ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(2)
        local = textrank_keywords(ds, top_k=50).to_pandas()
        dist = textrank_keywords(ds, top_k=50, local_threshold=0).to_pandas()
        assert local.values.tolist() == dist.values.tolist()
        assert len(local) > 3


class TestJsDivergence:
    def test_vs_brute_force(self, ray_session):
        import math
        import re
        from collections import Counter

        import ray.data

        from texoo_ray.stages.text_stats import js_divergence

        old = ["alpha beta gamma", "alpha beta", "gamma delta"]
        new = ["alpha epsilon", "epsilon zeta zeta", "alpha beta"]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "text": old + new,
                    "side": pa.array([0] * 3 + [1] * 3, pa.int64()),
                }
            )
        ).repartition(3)
        r = js_divergence(ds).to_pandas().iloc[0]

        ca, cb = Counter(), Counter()
        for t in old:
            ca.update(re.findall(r"[a-z0-9]+", t))
        for t in new:
            cb.update(re.findall(r"[a-z0-9]+", t))
        na, nb = sum(ca.values()), sum(cb.values())
        jsp = jsq = 0
        for w in set(ca) | set(cb):
            p, q = ca[w] / na, cb[w] / nb
            m = (p + q) / 2.0
            if ca[w] > 0:
                jsp += ca[w] * math.floor(math.log(p / m) * 1e6 + 0.5)
            if cb[w] > 0:
                jsq += cb[w] * math.floor(math.log(q / m) * 1e6 + 0.5)
        assert (r["n_old"], r["n_new"]) == (na, nb)
        assert (r["terms_old"], r["terms_new"]) == (len(ca), len(cb))
        assert (r["js_old_micro"], r["js_new_micro"]) == (jsp, jsq)
        js = (jsp / na + jsq / nb) / 2e6
        assert 0.0 <= js <= math.log(2) + 1e-9

    def test_identical_sides(self, ray_session):
        import ray.data

        from texoo_ray.stages.text_stats import js_divergence

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "text": ["same words here", "same words here"],
                    "side": pa.array([0, 1], pa.int64()),
                }
            )
        )
        r = js_divergence(ds).to_pandas().iloc[0]
        # identical distributions: every ln(p/m) = ln(1) = 0
        assert r["js_old_micro"] == 0 and r["js_new_micro"] == 0


class TestGroupedMadOutliers:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.analytics import grouped_mad_outliers

        # group a: tight around 100 with a spike; group b: wide spread
        # where 180 is NORMAL (the global gate would flag it)
        ga = [100, 101, 99, 102, 98, 100, 500]
        gb = [0, 50, 100, 150, 180, 200, -2000]
        vals = ga + gb
        grps = ["a"] * len(ga) + ["b"] * len(gb)
        ids = list(range(len(vals)))
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "g": pa.array(grps, pa.string()),
                    "v": pa.array(vals, pa.int64()),
                }
            )
        ).repartition(3)
        out = grouped_mad_outliers(ds, "g", "v", k=5).to_pandas()

        def disc(xs):
            s = sorted(xs)
            return s[(len(s) + 1) // 2 - 1]

        ref = []
        for g, xs in (("a", ga), ("b", gb)):
            m = disc(xs)
            cut = 5 * disc([abs(x - m) for x in xs])
            base = 0 if g == "a" else len(ga)
            for i, x in enumerate(xs):
                if abs(x - m) > cut:
                    ref.append((base + i, g, x, abs(x - m)))
        ref.sort()
        got = [tuple(r) for r in out.itertuples(index=False)]
        assert got == ref
        flagged = {(g, x) for _, g, x, _ in got}
        assert ("a", 500) in flagged and ("b", -2000) in flagged
        # 180 is normal within group b's wide spread
        assert ("b", 180) not in flagged


class TestEntropyRate:
    def test_vs_brute_force(self, ray_session):
        import math
        import re
        from collections import Counter

        import ray.data

        from texoo_ray.stages.text_stats import entropy_rate

        texts = [
            "the cat sat on the mat",
            "the dog sat on the rug",
            "a cat and a dog",
        ]
        ds = ray.data.from_arrow(pa.table({"text": texts})).repartition(2)
        r = entropy_rate(ds).to_pandas().iloc[0]

        cb, cc = Counter(), Counter()
        for t in texts:
            ws = re.findall(r"[a-z0-9]+", t.lower())
            for a, b in zip(ws, ws[1:]):
                cb[(a, b)] += 1
                cc[a] += 1
        h = -sum(
            n * math.floor(math.log(n / cc[a]) * 1e6 + 0.5)
            for (a, _), n in cb.items()
        )
        assert r["n_bigrams"] == sum(cb.values())
        assert r["n_distinct_bigrams"] == len(cb)
        assert r["n_contexts"] == len(cc)
        assert r["h_micro"] == h
        assert h > 0

    def test_deterministic_text_scores_zero(self, ray_session):
        import ray.data

        from texoo_ray.stages.text_stats import entropy_rate

        # every context has exactly one successor -> H = 0
        ds = ray.data.from_arrow(
            pa.table({"text": ["alpha beta gamma", "alpha beta gamma"]})
        )
        r = entropy_rate(ds).to_pandas().iloc[0]
        assert r["h_micro"] == 0 and r["n_bigrams"] == 4


class TestCodeSignals:
    def test_hand_computed(self, ray_session):
        from texoo_ray.stages.text_stats import code_signals

        code = "if (x == 1) {\n    y = 2;\n}\n    z();"
        prose = "a perfectly ordinary sentence about nothing much at all"
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [code, prose, ""],
            }
        )
        out = code_signals(batch).to_pandas().set_index("doc_id")
        c = out.loc[1]
        assert (c["n_symbols"], c["n_lines"], c["indent_lines"]) == (11, 4, 2)
        assert c["is_code"] == 1
        p = out.loc[2]
        assert p["n_symbols"] == 0 and p["is_code"] == 0
        assert out.loc[3]["is_code"] == 0  # empty never code

    def test_indent_rule_alone(self, ray_session):
        from texoo_ray.stages.text_stats import code_signals

        # no symbols at all, but half the lines indented
        t = "def f\n    pass\nend\n    more"
        out = code_signals(
            pa.table({"doc_id": pa.array([1], pa.int64()), "text": [t]})
        ).to_pandas()
        assert out.iloc[0]["is_code"] == 1


def _brute_kruskal(edges):
    """Independent union-find Kruskal over the (w, src, dst) order."""
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    keep = []
    for w, s, d in sorted((w, s, d) for s, d, w in edges):
        a, b = find(s), find(d)
        if a != b:
            parent[max(a, b)] = min(a, b)
            keep.append((s, d, w))
    return sorted(keep)


class TestBoruvkaMst:
    def _edges_ds(self, edges):
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([e[0] for e in edges], pa.int64()),
                    "dst": pa.array([e[1] for e in edges], pa.int64()),
                    "w": pa.array([e[2] for e in edges], pa.int64()),
                }
            )
        ).repartition(3)

    def test_local_vs_brute(self, ray_session):
        from texoo_ray.pipelines.graph import boruvka_mst

        rng = np.random.RandomState(13)
        n = 40
        edges = set()
        for i in range(1, n):
            edges.add((rng.randint(0, i), i, int(rng.randint(1, 1000))))
        for _ in range(60):
            a, b = rng.randint(0, n, 2)
            if a != b:
                edges.add((min(a, b), max(a, b), int(rng.randint(1, 1000))))
        edges = sorted(edges)
        out = boruvka_mst(self._edges_ds(edges)).to_pandas()
        got = sorted(zip(out["src"], out["dst"], out["w"]))
        assert got == _brute_kruskal(edges)
        assert len(got) == n - 1  # connected -> spanning tree

    def test_path_equivalence_distributed(self, ray_session):
        """Distributed hook-and-contract equals local Kruskal — forced
        multi-round via chained components + a disconnected piece."""
        from texoo_ray.pipelines.graph import boruvka_mst

        rng = np.random.RandomState(29)
        edges = set()
        # two chains with cross edges, plus an isolated triangle
        for i in range(0, 19):
            edges.add((i, i + 1, int(100 + rng.randint(0, 50))))
        for i in range(30, 45):
            edges.add((i, i + 1, int(200 + rng.randint(0, 50))))
        edges.add((5, 35, 5000))
        edges.update({(100, 101, 7), (101, 102, 8), (100, 102, 9)})
        # duplicate weights on purpose: the (w, src, dst) order decides
        edges.add((2, 7, 100))
        edges = sorted(edges)
        local = boruvka_mst(self._edges_ds(edges)).to_pandas()
        dist = boruvka_mst(
            self._edges_ds(edges), local_threshold=0, num_partitions=4
        ).to_pandas()
        assert local.values.tolist() == dist.values.tolist()
        got = sorted(zip(local["src"], local["dst"], local["w"]))
        assert got == _brute_kruskal(edges)
        # forest: the (5, 35) bridge joins the chains -> 2 components
        nodes = {x for s, d, _ in edges for x in (s, d)}
        assert len(got) == len(nodes) - 2


class TestTrimmedStats:
    def test_vs_brute_force(self, ray_session):
        import ray.data

        from texoo_ray.pipelines.analytics import trimmed_stats

        rng = np.random.RandomState(17)
        rows_g, rows_v = [], []
        data = {}
        for g, nv in (("a", 53), ("b", 20), ("c", 3)):
            vals = rng.randint(-50, 1000, nv)
            vals[0] = 99999  # a spike the trim removes (when k >= 1)
            data[g] = sorted(vals.tolist())
            rows_g += [g] * nv
            rows_v += vals.tolist()
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "g": pa.array(rows_g, pa.string()),
                    "v": pa.array(rows_v, pa.int64()),
                }
            )
        ).repartition(4)
        out = trimmed_stats(ds, "g", "v", trim_pct=5).to_pandas()
        got = {r.g: (r.n, r.kept_n, r.trimmed_sum) for r in out.itertuples(index=False)}
        for g, sv in data.items():
            n = len(sv)
            k = n * 5 // 100
            kept = sv[k : n - k]
            assert got[g] == (n, len(kept), sum(kept)), g
        # spike trimmed for group a (k=2), untouched for c (k=0)
        assert got["a"][2] < sum(data["a"])
        assert got["c"][2] == sum(data["c"])


class TestCusumChangepoint:
    def test_vs_brute_force(self, ray_session):
        import pandas as pd
        import ray.data

        from texoo_ray.pipelines.analytics import cusum_changepoint

        # type A: rate doubles after hour 5; type B: flat
        rows = []
        eid = 0
        for hour in range(10):
            na = 2 if hour < 5 else 6
            for _ in range(na):
                rows.append({"event_type": "A",
                             "ts": pd.Timestamp(hour * 3600 + eid % 60, unit="s")})
                eid += 1
            for _ in range(3):
                rows.append({"event_type": "B",
                             "ts": pd.Timestamp(hour * 3600 + eid % 60, unit="s")})
                eid += 1
        df = pd.DataFrame(rows)
        df["ts"] = df["ts"].astype("datetime64[us]")  # parquet ts unit
        ds = ray.data.from_pandas(df).repartition(3)
        out = cusum_changepoint(ds).to_pandas().set_index("event_type")

        # brute force for A
        xs = [2] * 5 + [6] * 5
        n, total = len(xs), sum(xs)
        devs = []
        cum = 0
        for t, x in enumerate(xs, 1):
            cum += x
            devs.append(abs(n * cum - t * total))
        best = max(devs)
        a = out.loc["A"]
        assert (a["n_buckets"], a["total"], a["max_dev"]) == (n, total, best)
        assert a["at_hour"] == devs.index(best)  # epoch hour == bucket idx
        # flat series: max_dev at any prefix is 0
        assert out.loc["B"]["max_dev"] == 0


class TestSpearman:
    def test_vs_scipy_free_brute(self, ray_session):
        import math

        import ray.data

        from texoo_ray.pipelines.relational import spearman

        rng = np.random.RandomState(21)
        x = rng.randint(0, 500, 300)
        y = (x // 7) ** 2 + rng.randint(0, 3, 300)  # monotone-ish, nonlinear
        ds = ray.data.from_arrow(
            pa.table({"x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64())})
        ).repartition(4)
        r = spearman(ds, "x", "y").to_pandas().iloc[0]

        def min_rank(vals):
            sv = np.sort(np.unique(vals))
            below = {}
            c = 0
            import collections

            cnt = collections.Counter(vals.tolist())
            for v in sv:
                below[int(v)] = c + 1
                c += cnt[int(v)]
            return np.array([below[int(v)] for v in vals], np.int64)

        a, b = min_rank(x), min_rank(y)
        n = len(a)
        num = n * int((a * b).sum()) - int(a.sum()) * int(b.sum())
        denx = n * int((a * a).sum()) - int(a.sum()) ** 2
        deny = n * int((b * b).sum()) - int(b.sum()) ** 2
        exp = math.floor(
            float(num) / math.sqrt(float(denx) * float(deny)) * 1e6 + 0.5
        )
        assert r["n"] == n and r["rho_micro"] == exp
        assert r["rho_micro"] > 900_000  # strongly monotone


def test_cluster_top_terms_local_vs_distributed_paths(ray_session):
    """The driver-local c-TF-IDF tail (under local_threshold) must be
    bit-identical to the distributed fw-join/top-k tail (threshold=0
    forces it)."""
    import ray.data

    from texoo_ray.stages.encoders import cluster_top_terms

    docs = ray.data.from_items(
        [
            {"doc_id": i, "text": "alpha beta " + ("gamma " * (i % 3)) + ("delta" if i % 2 else "epsilon")}
            for i in range(60)
        ]
    ).repartition(4)
    labels = ray.data.from_items(
        [{"vec_id": i, "assigned_label": i % 4} for i in range(60)]
    ).repartition(3)
    a = (
        cluster_top_terms(docs, labels, k=3)
        .to_pandas()
        .sort_values(["label", "word"])
        .reset_index(drop=True)
    )
    b = (
        cluster_top_terms(docs, labels, k=3, local_threshold=0)
        .to_pandas()
        .sort_values(["label", "word"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_bucket_sum_matches_groupby(ray_session):
    """bucket_sum is bit-equivalent to the generic multi-key
    groupby().aggregate(Sum) on random int64 keys, including negatives
    and an empty input."""
    import ray.data
    from ray.data.aggregate import Sum

    from texoo_ray.stages.combine import bucket_sum

    rng = np.random.RandomState(3)
    tbl = pa.table(
        {
            "a": pa.array(rng.randint(-50, 50, 5000).astype(np.int64)),
            "b": pa.array(rng.randint(0, 200, 5000).astype(np.int64)),
            "n": pa.array(rng.randint(1, 9, 5000).astype(np.int64)),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = (
        bucket_sum(ds, ["a", "b"], "n")
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = (
        ds.groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want[["a", "b", "n"]])
    empty = ray.data.from_arrow(tbl.slice(0, 0))
    assert bucket_sum(empty, ["a", "b"], "n").count() == 0


def test_bucket_sum_carry_cols(ray_session):
    import ray.data

    from texoo_ray.stages.combine import bucket_sum

    # carry col = deterministic function of the key
    tbl = pa.table(
        {
            "k": pa.array(np.array([1, 2, 1, 3, 2, 1], np.int64)),
            "f": pa.array(np.array([10, 20, 10, 30, 20, 10], np.int64)),
            "n": pa.array(np.ones(6, np.int64)),
        }
    )
    out = (
        bucket_sum(ray.data.from_arrow(tbl).repartition(3), ["k"], "n",
                   carry_cols=["f"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out["k"]) == [1, 2, 3]
    assert list(out["n"]) == [3, 2, 1]
    assert list(out["f"]) == [10, 20, 30]


def test_bucket_distinct_matches_groupby(ray_session):
    import ray.data

    from texoo_ray.stages.combine import bucket_distinct

    rng = np.random.RandomState(7)
    tbl = pa.table(
        {
            "a": pa.array(rng.randint(-20, 20, 4000).astype(np.int64)),
            "b": pa.array(rng.randint(0, 50, 4000).astype(np.int64)),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = (
        bucket_distinct(ds, ["a", "b"])
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    import pandas as pd

    want = (
        tbl.to_pandas()
        .drop_duplicates()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
