"""Distributed evaluation: NER P/R/F1 and segmentation Pk/WindowDiff.

Counters are computed per turn inside ``map_batches`` (both gold and pred
live on the row — the reference's gold↔pred matching is row-local too,
MentionAnnotatorEval) and reduced with a global sum; only a handful of
numbers cross the wire (SURVEY.md §2.7 partial+final pattern).
"""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa

from ..core.evaluation import (
    calculate_k,
    masses_array,
    mention_match_counts,
    pk,
    positions_array,
    prf1,
    window_diff,
)


def ner_eval(ds, gold_col: str = "gold_mentions", pred_col: str = "mentions") -> Dict:
    """Corpus P/R/F1 (strong and weak) from per-turn mention columns."""

    def partial(batch: pa.Table) -> pa.Table:
        tp_s = tp_w = ng = np_ = 0
        for gold, pred in zip(batch[gold_col].to_pylist(), batch[pred_col].to_pylist()):
            gold = gold or []
            pred = pred or []
            s, g, p = mention_match_counts(gold, pred, weak=False)
            w, _, _ = mention_match_counts(gold, pred, weak=True)
            tp_s += s
            tp_w += w
            ng += g
            np_ += p
        return pa.table(
            {
                "tp_strong": pa.array([tp_s], pa.int64()),
                "tp_weak": pa.array([tp_w], pa.int64()),
                "n_gold": pa.array([ng], pa.int64()),
                "n_pred": pa.array([np_], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    import pandas as pd

    df = parts.to_pandas().sum()
    strong = prf1(int(df["tp_strong"]), int(df["n_gold"]), int(df["n_pred"]))
    weak = prf1(int(df["tp_weak"]), int(df["n_gold"]), int(df["n_pred"]))
    return {
        "n_gold": int(df["n_gold"]),
        "n_pred": int(df["n_pred"]),
        "strong": strong,
        "weak": weak,
    }


def _section_lengths(sentences: List[dict], sections: List[dict]) -> List[int]:
    """Sentence count per section. A sentence belongs to the section
    containing its begin offset (sections are disjoint and ordered; a
    sentence's trailing newline may lie between sections, so containment
    of the full span would undercount)."""
    out = []
    for sec in sections:
        n = sum(1 for s in sentences if sec["begin"] <= s["begin"] < sec["end"])
        if n:
            out.append(n)
    return out


def segmentation_eval(
    ds, ref_col: str = "sections_ref", hyp_col: str = "sections", sent_col: str = "sentences"
) -> Dict:
    """Mean Pk / WindowDiff over documents (k = half mean ref segment
    length per doc, SegmentationEvaluation.calculateK)."""

    def partial(batch: pa.Table) -> pa.Table:
        pk_sum = wd_sum = 0.0
        n = 0
        skipped = 0
        for sents, ref, hyp in zip(
            batch[sent_col].to_pylist(),
            batch[ref_col].to_pylist(),
            batch[hyp_col].to_pylist(),
        ):
            if not sents or not ref or not hyp:
                skipped += 1
                continue
            ref_pos = positions_array(_section_lengths(sents, ref))
            hyp_pos = positions_array(_section_lengths(sents, hyp))
            if len(ref_pos) != len(hyp_pos) or len(ref_pos) < 2:
                skipped += 1
                continue
            k = calculate_k(masses_array(ref_pos))
            pk_sum += pk(ref_pos, hyp_pos, k)
            wd_sum += window_diff(ref_pos, hyp_pos, k)
            n += 1
        return pa.table(
            {
                "pk_sum": pa.array([pk_sum], pa.float64()),
                "wd_sum": pa.array([wd_sum], pa.float64()),
                "n_docs": pa.array([n], pa.int64()),
                "n_skipped": pa.array([skipped], pa.int64()),
            }
        )

    df = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n = max(int(df["n_docs"]), 1)
    return {
        "n_docs": int(df["n_docs"]),
        "n_skipped": int(df["n_skipped"]),
        "mean_pk": float(df["pk_sum"]) / n,
        "mean_window_diff": float(df["wd_sum"]) / n,
    }


def _clipped_matches(ref_keys, cand_keys, stride, n_rows):
    """Per-doc CLIPPED gram matches: keys are ``doc * stride + gram``;
    for every gram the candidate's count is clipped at the reference's
    (min over the two count tables, aligned with one searchsorted) and
    the mins scatter-add into a per-doc vector. Shared by the n-gram
    eval primitives (:func:`bleu2_stats`, :func:`chrf_stats`)."""
    import numpy as np

    out = np.zeros(n_rows, dtype=np.int64)
    if len(cand_keys) == 0:
        return out
    ru, rc = np.unique(ref_keys, return_counts=True)
    cu, cc = np.unique(cand_keys, return_counts=True)
    idx = np.searchsorted(ru, cu)
    safe = np.minimum(idx, len(ru) - 1)
    ok = (idx < len(ru)) & (ru[safe] == cu)
    mins = np.minimum(cc[ok], rc[idx[ok]])
    np.add.at(out, (cu[ok] // stride).astype(np.int64), mins)
    return out


def bleu2_stats(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    sub_every: int = 3,
    sub_token: str = "xnoisex",
):
    """BLEU-2 sufficient statistics per document (Papineni et al. 2002)
    against a deterministic corruption of the text itself: the candidate
    is the reference with every ``sub_every``-th word (1-based position)
    replaced by ``sub_token``. Returns
    Dataset[(id, n_words, match1, match2)] where ``match1`` / ``match2``
    are the CLIPPED unigram / bigram matches (sum over distinct grams of
    min(count_cand, count_ref)) and the precision denominators are
    derivable (total1 = n_words, total2 = max(n_words - 1, 0); the
    substitution preserves length so the brevity penalty is 1 and corpus
    BLEU-2 is one libm expression over the summed row).

    This is the eval-harness primitive a generation pipeline runs at
    corpus scale (model output vs reference); the planted corruption
    makes it oracle-checkable without a second table. Row-local and
    shuffle-free: grams never leave the batch — per batch, grams key as
    ``doc * M^2 + c1 * M + c2`` over the batch dictionary, two
    ``np.unique`` count tables align with one ``searchsorted``, and the
    per-doc clipped sums come from ``np.add.at``. If ``sub_token``
    already occurs in the batch its dictionary code is reused, so a
    corpus that genuinely contains the token still counts exactly.

    The reference's evaluators are span-F1 / Pk (texoo-core/.../
    AnnotationEvaluation.java, this module above); n-gram-precision
    eval is part of the training-data extension surface.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.text_stats import _doc_word_codes

    clipped = _clipped_matches

    def partial(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        doc_of, codes, dic = _doc_word_codes(batch[text_col])
        hit = pc.index_in(pa.array([sub_token]), value_set=dic)[0]
        sub_code = hit.as_py() if hit.is_valid else len(dic)
        m = np.int64(len(dic) + 1)
        nw = np.bincount(doc_of, minlength=n_rows).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(nw)[:-1]])
        pos = np.arange(len(codes), dtype=np.int64) - starts[doc_of]
        cand = np.where((pos + 1) % sub_every == 0, sub_code, codes)
        match1 = clipped(doc_of * m + codes, doc_of * m + cand, m, n_rows)
        if len(codes) > 1:
            adj = doc_of[1:] == doc_of[:-1]
            d = doc_of[:-1][adj]
            rb = (d * m + codes[:-1][adj]) * m + codes[1:][adj]
            cb = (d * m + cand[:-1][adj]) * m + cand[1:][adj]
            match2 = clipped(rb, cb, m * m, n_rows)
        else:
            match2 = np.zeros(n_rows, dtype=np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(nw),
                "match1": pa.array(match1),
                "match2": pa.array(match2),
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow")


def chrf_stats(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_n: int = 3,
    sub_every: int = 7,
    sub_char: str = "q",
):
    """chrF sufficient statistics per document (Popović 2015,
    "chrF: character n-gram F-score") against a deterministic
    corruption: the candidate is the WHITESPACE-STRIPPED reference
    (chrF's standard preprocessing) with every ``sub_every``-th
    character (1-based) replaced by ``sub_char``. Returns
    Dataset[(id, n_chars, cmatch1..cmatch{max_n})] where ``cmatch_n``
    is the clipped char n-gram match count; the precision AND recall
    denominators are both ``max(n_chars - n + 1, 0)`` (substitution
    preserves length), so corpus chrF is one closed-form expression
    over the summed rows.

    Character-level sibling of :func:`bleu2_stats` and the second
    generation-eval primitive: robust to tokenization and morphology,
    the standard for non-whitespace scripts. Row-local and
    shuffle-free — per batch, all docs' stripped codepoints form one
    array (``np.unique`` dictionary, typically a few hundred distinct
    chars), n-gram keys pack as ``doc * m^n + c_1 m^{n-1} + ...`` and
    the clipped per-doc sums come from :func:`_clipped_matches`.
    Batches are processed in doc-chunks sized so the packed key stays
    inside int64 even on dictionary-heavy (CJK) text.

    The whitespace strip is RE2 ``\\s+`` on both sides (Arrow
    ``replace_substring_regex`` here, DuckDB ``regexp_replace`` in the
    oracle), so the two engines agree char-for-char."""
    import numpy as np
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        stripped = pc.replace_substring_regex(
            pc.fill_null(batch[text_col], ""),
            pattern=r"\s+",
            replacement="",
        )
        lens = np.asarray(pc.utf8_length(stripped), dtype=np.int64)
        joined = "".join(stripped.to_pylist())
        if joined:
            chars = np.frombuffer(
                joined.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
        else:
            chars = np.empty(0, dtype=np.int64)
        doc_of = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        dic, codes = np.unique(chars, return_inverse=True)
        sc = np.int64(ord(sub_char))
        at = int(np.searchsorted(dic, sc))
        sub_code = at if at < len(dic) and dic[at] == sc else len(dic)
        m = np.int64(len(dic) + 1)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        pos = np.arange(len(codes), dtype=np.int64) - starts[doc_of]
        cand = np.where((pos + 1) % sub_every == 0, sub_code, codes)
        match = [np.zeros(n_rows, dtype=np.int64) for _ in range(max_n)]
        # doc-chunk so doc_local * m**max_n stays inside int64
        docs_per = max(1, int((1 << 62) // max(1, int(m) ** max_n)))
        for d0 in range(0, n_rows, docs_per):
            d1 = min(n_rows, d0 + docs_per)
            c0 = int(starts[d0])
            c1 = int(starts[d1 - 1] + lens[d1 - 1])
            dl = doc_of[c0:c1] - d0
            rc, cc = codes[c0:c1], cand[c0:c1]
            for n in range(1, max_n + 1):
                end = len(rc) - n + 1
                if end <= 0:
                    continue
                valid = dl[:end] == dl[n - 1 :]
                rk = rc[:end].copy()
                ck = cc[:end].copy()
                for j in range(1, n):
                    rk = rk * m + rc[j : end + j]
                    ck = ck * m + cc[j : end + j]
                stride = m**n
                part = _clipped_matches(
                    (dl[:end] * stride + rk)[valid],
                    (dl[:end] * stride + ck)[valid],
                    stride,
                    d1 - d0,
                )
                match[n - 1][d0:d1] += part
        cols = {id_col: batch[id_col], "n_chars": pa.array(lens)}
        for n in range(1, max_n + 1):
            cols[f"cmatch{n}"] = pa.array(match[n - 1])
        return pa.table(cols)

    return ds.map_batches(partial, batch_format="pyarrow")


def auc_exact(ds, score_col: str = "score", label_col: str = "label"):
    """Exact ROC-AUC of an integer score against a binary label as the
    EXACT rational 2U / (2 * n_pos * n_neg), where 2U is the doubled
    Mann-Whitney U statistic with the standard tie correction (each
    tied positive/negative pair contributes 1, each strictly ordered
    pair 2 — so every contribution stays an integer and the result
    hash-checks without float aggregation order effects). Returns ONE
    row ``(n_pos, n_neg, u2, auc_den)`` with ``auc_den = 2 * n_pos *
    n_neg`` (0 when either class is empty; callers divide at the edge).

    The diagnostic a curation pipeline runs on every cheap quality
    feature: "does this score actually separate the gold classes?"
    (ranking counterpart of the reference's threshold-classification
    eval, ClassificationEvaluation.java — this measures the feature at
    EVERY threshold at once).

    Shape (the :func:`~texoo_ray.pipelines.relational.ks_drift` budget):
    batches reduce row-locally to per-score (n_pos, n_neg) partials;
    ONE ``groupby(score)`` sum yields the score-domain-sized table;
    the cumulative scan runs on that one small block. ``u2`` needs
    ``2 * n_pos * n_neg < 2**63`` — beyond ~2e9 x 2e9 rows per class,
    pre-bin the scores and subsample, noted deliberately.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch[score_col], dtype=np.int64)
        lab = np.asarray(batch[label_col], dtype=np.int64)
        u, inv = np.unique(s, return_inverse=True)
        npos = np.bincount(inv, weights=lab, minlength=len(u))
        nall = np.bincount(inv, minlength=len(u))
        return pa.table(
            {
                "score": pa.array(u, pa.int64()),
                "n_pos": pa.array(npos.astype(np.int64), pa.int64()),
                "n_neg": pa.array(
                    (nall - npos).astype(np.int64), pa.int64()
                ),
            }
        )

    t = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("score")
        .aggregate(
            Sum("n_pos", alias_name="n_pos"),
            Sum("n_neg", alias_name="n_neg"),
        )
    )

    def final(batch: pa.Table) -> pa.Table:
        cols = ("n_pos", "n_neg", "u2", "auc_den")
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        s = np.asarray(batch["score"], dtype=np.int64)
        order = np.argsort(s, kind="stable")
        np_ = np.asarray(batch["n_pos"], dtype=np.int64)[order]
        nn = np.asarray(batch["n_neg"], dtype=np.int64)[order]
        # negatives strictly below this score (exclusive cumsum)
        cum_below = np.concatenate([[0], np.cumsum(nn)[:-1]])
        u2 = int(np.sum(np_ * (2 * cum_below + nn)))
        tp, tn = int(np_.sum()), int(nn.sum())
        return pa.table(
            {
                "n_pos": pa.array([tp], pa.int64()),
                "n_neg": pa.array([tn], pa.int64()),
                "u2": pa.array([u2], pa.int64()),
                "auc_den": pa.array([2 * tp * tn], pa.int64()),
            }
        )

    return t.repartition(1).map_batches(final, batch_format="pyarrow")


def kappa_agreement(ds, col_a: str = "a", col_b: str = "b"):
    """Cohen's kappa (Cohen 1960) between two integer label columns on
    the same rows, as the EXACT rational ``kappa_num / kappa_den`` with

        kappa_num = N * n_agree - chance
        kappa_den = N * N      - chance
        chance    = sum over labels k of row_k * col_k

    (row_k / col_k are the marginal counts of label k under each
    annotator). Returns ONE row ``(n, n_agree, chance, kappa_num,
    kappa_den)``, all int64 — chance-corrected inter-annotator /
    inter-filter agreement, the standard diagnostic for whether two
    quality filters (or two annotators, reference
    MentionAnnotatorEval-style gold vs pred) measure the same thing.

    Shape: per-batch (a, b) pair-count partials, ONE groupby over the
    label-pair domain (k*k-sized, driver-trivial), final algebra in
    Python ints on that one block. ``N * N < 2**63`` holds to ~3e9
    rows; beyond that, sample or rescale — noted deliberately.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch[col_a], dtype=np.int64)
        b = np.asarray(batch[col_b], dtype=np.int64)
        pairs = np.stack([a, b], axis=1)
        u, counts = np.unique(pairs, axis=0, return_counts=True)
        return pa.table(
            {
                "a": pa.array(u[:, 0], pa.int64()),
                "b": pa.array(u[:, 1], pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    t = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def final(batch: pa.Table) -> pa.Table:
        cols = ("n", "n_agree", "chance", "kappa_num", "kappa_den")
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        a = np.asarray(batch["a"], dtype=np.int64)
        b = np.asarray(batch["b"], dtype=np.int64)
        n = np.asarray(batch["n"], dtype=np.int64)
        total = int(n.sum())
        agree = int(n[a == b].sum())
        labels = np.union1d(a, b)
        row = {int(k): 0 for k in labels}
        col = {int(k): 0 for k in labels}
        for ai, bi, ni in zip(a.tolist(), b.tolist(), n.tolist()):
            row[ai] += ni
            col[bi] += ni
        chance = sum(row[k] * col[k] for k in row)
        return pa.table(
            {
                "n": pa.array([total], pa.int64()),
                "n_agree": pa.array([agree], pa.int64()),
                "chance": pa.array([chance], pa.int64()),
                "kappa_num": pa.array([total * agree - chance], pa.int64()),
                "kappa_den": pa.array([total * total - chance], pa.int64()),
            }
        )

    return t.repartition(1).map_batches(final, batch_format="pyarrow")


def clustering_eval(ds, pred_col: str = "pred", gold_col: str = "gold"):
    """Exact clustering-quality metrics of a predicted labeling against
    gold classes, from the pair-counting contingency table (Hubert &
    Arabie 1985 Adjusted Rand Index + cluster purity), all EXACT
    integers: ONE row ``(n, sum_comb, comb_a, comb_b, purity_num,
    ari_num, ari_den)`` with

        sum_comb = sum over cells of C(n_ij, 2)
        comb_a/b = sum over pred / gold marginals of C(., 2)
        ari      = ari_num / ari_den  (the standard ARI, multiplied
                   through by 2*C(n,2) so both sides stay integers)
        purity   = purity_num / n  (sum over pred clusters of the
                   majority gold count)

    The "did k-means find the real classes?" gate over an embedding
    corpus — the unsupervised sibling of ner_eval's P/R/F1.

    Shape: per-batch (pred, gold) pair-count partials, ONE
    label-pair-domain groupby (k*k'-sized, driver-trivial), final
    algebra in Python ints on that one block, bounds-checked:
    ``C(n,2) * comb`` products exceed int64 near n ~ 5e4 — beyond
    that, evaluate on a deterministic sample (ARI is a pair statistic;
    subsampling is the standard practice), raised rather than wrapped.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch[pred_col], dtype=np.int64)
        g = np.asarray(batch[gold_col], dtype=np.int64)
        u, counts = np.unique(np.stack([p, g], axis=1), axis=0, return_counts=True)
        return pa.table(
            {
                "p": pa.array(u[:, 0], pa.int64()),
                "g": pa.array(u[:, 1], pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    t = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["p", "g"])
        .aggregate(Sum("n", alias_name="n"))
    )

    _I64 = 2**63

    def final(batch: pa.Table) -> pa.Table:
        cols = (
            "n", "sum_comb", "comb_a", "comb_b",
            "purity_num", "ari_num", "ari_den",
        )
        if batch.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        p = batch["p"].to_pylist()
        g = batch["g"].to_pylist()
        n = batch["n"].to_pylist()
        total = sum(n)
        row, col, best = {}, {}, {}
        sum_comb = 0
        for pi, gi, ni in zip(p, g, n):
            row[pi] = row.get(pi, 0) + ni
            col[gi] = col.get(gi, 0) + ni
            best[pi] = max(best.get(pi, 0), ni)
            sum_comb += ni * (ni - 1) // 2
        comb_a = sum(v * (v - 1) // 2 for v in row.values())
        comb_b = sum(v * (v - 1) // 2 for v in col.values())
        purity = sum(best.values())
        c2 = total * (total - 1) // 2
        ari_num = 2 * (c2 * sum_comb - comb_a * comb_b)
        ari_den = c2 * (comb_a + comb_b) - 2 * comb_a * comb_b
        if not (-_I64 <= ari_num < _I64 and -_I64 <= ari_den < _I64):
            raise OverflowError(
                "clustering_eval: ARI rational exceeds int64 — evaluate "
                "on a deterministic sample (pair statistics subsample "
                "cleanly)"
            )
        vals = (total, sum_comb, comb_a, comb_b, purity, ari_num, ari_den)
        return pa.table(
            {c: pa.array([v], pa.int64()) for c, v in zip(cols, vals)}
        )

    return t.repartition(1).map_batches(final, batch_format="pyarrow")
