"""Text retrieval: term-match scoring and ranked top-k over a documents
table.

The reference's retrieval model (Query -> ranked Results,
Query.java:21-31, InMemoryIndex.find) maps to: per-batch vectorized
scoring against a broadcast query -> per-batch partial top-k -> small
global sort+limit. ``term_match_topk`` uses exact word-boundary term
counting (SQL-reproducible oracle); embedding-based ranking lives in
stages.knn.
"""

from __future__ import annotations

import re
from typing import List, Sequence

import pyarrow as pa


def term_match_topk(
    ds,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Top-k docs by total word-boundary occurrences of the query terms.

    Returns Dataset[(rank implicit by order), doc_id, score] sorted by
    (score desc, doc_id asc) — deterministic total order.
    """
    pattern = re.compile(
        r"\b(?:" + "|".join(re.escape(t.lower()) for t in query_terms) + r")\b"
    )

    def score(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        scores = [len(pattern.findall((t or "").lower())) for t in texts]
        keep = [i for i, s in enumerate(scores) if s > 0]
        # partial top-k per batch
        keep.sort(key=lambda i: (-scores[i], ids[i]))
        keep = keep[:k]
        return pa.table(
            {
                id_col: pa.array([ids[i] for i in keep], pa.int64()),
                "score": pa.array([scores[i] for i in keep], pa.int64()),
            }
        )

    partial = ds.map_batches(score, batch_format="pyarrow")
    return partial.sort(["score", id_col], descending=[True, False]).limit(k)
