"""Distributed inverted (postings) index as a parquet layout, with
pruned-read conjunctive search.

Reference tie-in: TeXoo answers retrieval queries against a prebuilt
Lucene index — LuceneArticleIndex builds names/terms/text postings once
(texoo-entity-linking/.../LuceneArticleIndex.java:65-97) and queries hit
only the relevant postings lists (:180-214). The Ray-Data-native
analogue makes the index a STORAGE LAYOUT: postings rows (term, doc_id,
tf) are written once, hash-partitioned by term into ``bucket=i/``
directories (same manifest discipline as state/clustered.py), and a
query reads ONLY the bucket directories its terms hash to — the
prune-at-the-read shape. At 100 TB the full postings table is
corpus-sized, but a B-term query touches <= B/n_buckets of it, and each
bucket directory is independently rebuildable (resumable writes).

Build shape: one corpus pass emits per-document (term, tf) rows — a
(term, doc) pair is produced exactly once globally because a document
is a single row — then ``write_parquet(partition_cols=['bucket'])``
performs the one prepaid exchange. Search shape: pruned read ->
term-set filter -> per-batch partials -> one postings-sized (not
corpus-sized) groupby -> AND semantics as ``n_terms == |query|``.
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.strhash import utf8_hash64

_MANIFEST = "_postings_manifest.json"


def _term_buckets(terms, n_buckets: int) -> np.ndarray:
    h = utf8_hash64(pa.array(list(terms), pa.string()))
    return (np.asarray(h, dtype=np.uint64) % np.uint64(n_buckets)).astype(
        np.int64
    )


def build_postings(
    ds,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> str:
    """Write the inverted index: ``out_dir/bucket=i/`` parquet of
    (term, doc_id, tf) rows, term-hash partitioned, plus a layout
    manifest. RE2 ASCII ``\\w+`` lowercased terms."""
    from .text_stats import _doc_word_codes

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        doc_of, codes, dic = _doc_word_codes(batch[text_col])
        n = max(batch.num_rows, 1)
        if len(codes) == 0:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    id_col: pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        pair = codes * n + doc_of
        uk, cnt = np.unique(pair, return_counts=True)
        code_u = uk // n
        doc_u = uk % n
        buckets = _term_buckets(dic.to_pylist(), n_buckets)
        return pa.table(
            {
                "term": dic.take(pa.array(code_u, pa.int64())),
                id_col: pa.array(ids[doc_u], pa.int64()),
                "tf": pa.array(cnt.astype(np.int64), pa.int64()),
                "bucket": pa.array(buckets[code_u], pa.int64()),
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(partial, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(
            {"n_buckets": n_buckets, "hash": "fnv64", "id_col": id_col}, f
        )
    return out_dir


def search_postings(index_dir: str, terms: Sequence[str], k: int = 20):
    """Conjunctive (AND) search: documents containing EVERY query term,
    ranked by total term frequency (desc, then id). Reads ONLY the
    bucket directories the query terms hash to — never the rest of the
    index. Returns Dataset[(id_col, total_tf)], <= k rows."""
    import ray.data
    from ray.data.aggregate import Sum

    with open(os.path.join(index_dir, _MANIFEST)) as f:
        man = json.load(f)
    id_col = man["id_col"]
    qterms: List[str] = sorted(set(terms))
    buckets = sorted(set(_term_buckets(qterms, int(man["n_buckets"])).tolist()))
    paths = []
    for b in buckets:
        d = os.path.join(index_dir, f"bucket={b}")
        if os.path.isdir(d):
            paths.extend(
                sorted(
                    os.path.join(d, f)
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                )
            )
    need = len(qterms)
    term_set = pa.array(qterms, pa.string())
    if not paths:
        return ray.data.from_arrow(
            pa.table(
                {id_col: pa.array([], pa.int64()), "total_tf": pa.array([], pa.int64())}
            )
        )
    ds = ray.data.read_parquet(paths, columns=["term", id_col, "tf"])

    def partial(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch["term"], value_set=term_set))
        ids = np.asarray(hit[id_col], dtype=np.int64)
        tf = np.asarray(hit["tf"], dtype=np.int64)
        uid, inv = np.unique(ids, return_inverse=True)
        nt = np.bincount(inv, minlength=len(uid)).astype(np.int64)
        s = np.zeros(len(uid), dtype=np.int64)
        np.add.at(s, inv, tf)
        return pa.table(
            {
                id_col: pa.array(uid, pa.int64()),
                "nt": pa.array(nt, pa.int64()),
                "tf": pa.array(s, pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("nt", alias_name="nt"), Sum("tf", alias_name="total_tf"))
        .filter(expr=f"nt == {need}")
        .select_columns([id_col, "total_tf"])
        .sort(["total_tf", id_col], descending=[True, False])
        .limit(k)
    )
    return agg
