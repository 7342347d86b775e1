"""Ranking / retrieval evaluation metrics.

Mirrors the reference's RetrievalEvaluation (texoo-retrieval,
RetrievalEvaluation.java:154-218) and ClassificationEvaluation: P@k, MRR,
MAP, NDCG@k over ranked result lists (the Query -> ranked Results model,
Query.java:21-31, Result.java:87-120). Pure functions over id lists;
distributed form is per-query partials -> mean.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Set


def precision_at_k(ranked: Sequence, relevant: Set, k: int) -> float:
    if k <= 0:
        return 0.0
    top = list(ranked)[:k]
    if not top:
        return 0.0
    return sum(1 for r in top if r in relevant) / k


def recall_at_k(ranked: Sequence, relevant: Set, k: int) -> float:
    if not relevant:
        return 0.0
    top = list(ranked)[:k]
    return sum(1 for r in top if r in relevant) / len(relevant)


def reciprocal_rank(ranked: Sequence, relevant: Set) -> float:
    for i, r in enumerate(ranked, start=1):
        if r in relevant:
            return 1.0 / i
    return 0.0


def average_precision(ranked: Sequence, relevant: Set) -> float:
    if not relevant:
        return 0.0
    hits = 0
    acc = 0.0
    for i, r in enumerate(ranked, start=1):
        if r in relevant:
            hits += 1
            acc += hits / i
    return acc / len(relevant)


def dcg_at_k(gains: Sequence[float], k: int) -> float:
    return sum(g / math.log2(i + 1) for i, g in enumerate(list(gains)[:k], start=1))


def ndcg_at_k(ranked: Sequence, relevance: Dict, k: int) -> float:
    """relevance: id -> graded gain (binary or graded)."""
    gains = [float(relevance.get(r, 0.0)) for r in ranked]
    ideal = sorted(relevance.values(), reverse=True)
    idcg = dcg_at_k([float(g) for g in ideal], k)
    if idcg == 0:
        return 0.0
    return dcg_at_k(gains, k) / idcg


def evaluate_queries(
    results: Dict, relevant: Dict, k: int = 10
) -> Dict[str, float]:
    """Mean P@k / R@k / MRR / MAP / NDCG@k over queries.

    results: query_id -> ranked id list; relevant: query_id -> set or
    {id: gain} dict.
    """
    if not results:
        return {"p_at_k": 0.0, "r_at_k": 0.0, "mrr": 0.0, "map": 0.0, "ndcg": 0.0}
    p = r = mrr = ap = nd = 0.0
    for qid, ranked in results.items():
        rel = relevant.get(qid, set())
        rel_set = set(rel)
        gains = rel if isinstance(rel, dict) else {x: 1.0 for x in rel_set}
        p += precision_at_k(ranked, rel_set, k)
        r += recall_at_k(ranked, rel_set, k)
        mrr += reciprocal_rank(ranked, rel_set)
        ap += average_precision(ranked, rel_set)
        nd += ndcg_at_k(ranked, gains, k)
    n = len(results)
    return {
        "p_at_k": p / n,
        "r_at_k": r / n,
        "mrr": mrr / n,
        "map": ap / n,
        "ndcg": nd / n,
    }
