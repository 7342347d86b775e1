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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


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


def passage_candidates(
    docs_ds,
    queries_ds,
    num: int = 10,
    text_col: str = "text",
    passages_col: str = "gold_passages",
):
    """Per-query passage candidate generation — the PassageIndex analogue
    (texoo-cdv/.../index/PassageIndex.java:103-215, used by
    MatchZooReader.addCandidateSamples):

    - index every GOLD passage of every document (BM25 over the passage
      text, the RAM-Lucene stand-in),
    - per query, search ``entity aspect`` (with ``/ - :`` folded to
      spaces, :170-171) for up to ``num`` candidates,
    - splice ALL passages of the top hit's document in right after rank 1
      (:177-185 "in case of exact match"),
    - fill the query's results to ``num``, skipping passages already
      present (the GOLD result stays rank 0, relevance 1; candidates get
      relevance 0).

    Ray mapping: the passage index builds from a STREAMED pass over the
    documents (driver-held, KB-bounded like the linker KB), ships once via
    ``ray.put`` and is probed per query batch — broadcast small side, no
    shuffle. Returns Dataset[(query_id, rank, doc_id, passage_id,
    relevance)].
    """
    import ray

    from .linker import Bm25Index

    passages: List[dict] = []
    by_doc: dict = {}
    for batch in docs_ds.iter_batches(batch_format="pyarrow"):
        for doc_id, text, panns in zip(
            batch["doc_id"].to_pylist(),
            batch[text_col].to_pylist(),
            batch[passages_col].to_pylist(),
        ):
            for p in panns or []:
                idx = len(passages)
                passages.append(
                    {
                        "doc_id": doc_id,
                        "passage_id": p.get("id") or "%s#%d" % (doc_id, idx),
                        "text": "%s %s" % (
                            p.get("label") or "",
                            (text or "")[p["begin"] : p["end"]],
                        ),
                    }
                )
                by_doc.setdefault(doc_id, []).append(idx)
    index = Bm25Index([p["text"] for p in passages])
    shared = ray.put((index, passages, by_doc))

    def clean(s: str) -> str:
        return (s or "").replace("/", " ").replace("-", " ").replace(":", " ")

    def run(batch: pa.Table) -> pa.Table:
        index, passages, by_doc = ray.get(shared)
        q_col, r_col, d_col, p_col, rel_col = [], [], [], [], []
        for qid, entity, aspect, gold_doc, gold_begin, gold_end in zip(
            batch["query_id"].to_pylist(),
            batch["entity"].to_pylist(),
            batch["aspect"].to_pylist(),
            batch["doc_id"].to_pylist(),
            batch["begin"].to_pylist(),
            batch["end"].to_pylist(),
        ):
            hits = index.query(clean(entity) + " " + clean(aspect), num)
            cands = [passages[i] for i, _ in hits]
            if cands:
                # splice the top document's passages after rank 1
                top_doc = cands[0]["doc_id"]
                spliced = cands[:1] + [
                    passages[i] for i in by_doc.get(top_doc, [])
                ] + cands[1:]
            else:
                spliced = []
            gold_id = "%s:%d-%d" % (gold_doc, gold_begin, gold_end)
            seen = {gold_id}
            results = [
                {"doc_id": gold_doc, "passage_id": gold_id, "relevance": 1}
            ]
            for c in spliced:
                if len(results) >= num:
                    break
                if c["passage_id"] in seen:
                    continue
                seen.add(c["passage_id"])
                results.append(
                    {
                        "doc_id": c["doc_id"],
                        "passage_id": c["passage_id"],
                        "relevance": 0,
                    }
                )
            for rank, r in enumerate(results):
                q_col.append(qid)
                r_col.append(rank)
                d_col.append(r["doc_id"])
                p_col.append(r["passage_id"])
                rel_col.append(r["relevance"])
        return pa.table(
            {
                "query_id": pa.array(q_col, pa.string()),
                "rank": pa.array(r_col, pa.int32()),
                "doc_id": pa.array(d_col, pa.string()),
                "passage_id": pa.array(p_col, pa.string()),
                "relevance": pa.array(rel_col, pa.int32()),
            }
        )

    return queries_ds.map_batches(run, batch_format="pyarrow")


def grouped_topk(
    ds,
    group_col: str,
    order_col: str = None,
    k: int = 10,
    id_col: str = "doc_id",
    descending: bool = True,
    order_by: List[tuple] = None,
):
    """Top-k rows PER GROUP (SQL ``row_number() OVER (PARTITION BY g
    ORDER BY v DESC, id) <= k``), deterministic tie-break on ``id_col``.
    Pass either ``order_col``/``descending`` (single key + id tie-break)
    or an explicit ``order_by`` list of (column, "ascending"|"descending")
    pairs applied after the group column.

    Scale shape: a per-BATCH partial top-k first (each block contributes
    at most k rows per group it contains), so the ``groupby`` exchange
    moves O(blocks x groups_per_block x k) rows instead of the corpus;
    the per-group finalizer then re-ranks <= blocks*k rows. Skew-safe:
    a hot group's shuffle volume is capped by k per source block.
    """
    if order_by is None:
        order_by = [
            (order_col, "descending" if descending else "ascending"),
            (id_col, "ascending"),
        ]

    def order_tuple(tbl: pa.Table):
        return [(group_col, "ascending")] + list(order_by)

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native rank-within-run over the sorted batch (the
        # lexsort + segment-boundary idiom) — no pandas round-trip.
        # Null groups drop, matching pandas groupby(dropna=True).
        if batch.num_rows == 0:
            return batch
        if batch[group_col].null_count:
            batch = batch.filter(pc.is_valid(batch[group_col]))
            if batch.num_rows == 0:
                return batch
        batch = batch.sort_by(order_tuple(batch))
        g = batch[group_col].combine_chunks()
        n = len(g)
        neq = pc.not_equal(g.slice(1), g.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
        sizes = np.diff(np.concatenate([starts, [n]]))
        rank = np.arange(n) - np.repeat(starts, sizes)
        return batch.filter(pa.array(rank < k))

    def final(group: pa.Table) -> pa.Table:
        return group.sort_by(order_tuple(group)).slice(0, k)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )
