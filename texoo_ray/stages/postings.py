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
    positions: bool = False,
) -> str:
    """Write the inverted index: ``out_dir/bucket=i/`` parquet of
    (term, doc_id, tf) rows, term-hash partitioned, plus a layout
    manifest. RE2 ASCII ``\\w+`` lowercased terms. With
    ``positions=True`` each postings row also carries the 1-based
    in-document word positions (``pos: list<int64>``) for phrase
    search."""
    from .text_stats import _doc_word_codes

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        doc_of, codes, dic = _doc_word_codes(batch[text_col])
        n = max(batch.num_rows, 1)
        if len(codes) == 0:
            cols = {
                "term": pa.array([], pa.string()),
                id_col: pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
            }
            if positions:
                cols["pos"] = pa.array([], pa.list_(pa.int64()))
            cols["bucket"] = pa.array([], pa.int64())
            return pa.table(cols)
        pair = codes * n + doc_of
        order = np.argsort(pair, kind="stable")
        sp = pair[order]
        first = np.ones(len(sp), dtype=bool)
        first[1:] = sp[1:] != sp[:-1]
        starts = np.nonzero(first)[0]
        offsets = np.concatenate([starts, [len(sp)]]).astype(np.int64)
        uk = sp[starts]
        cnt = np.diff(offsets)
        code_u = uk // n
        doc_u = uk % n
        buckets = _term_buckets(dic.to_pylist(), n_buckets)
        cols = {
            "term": dic.take(pa.array(code_u, pa.int64())),
            id_col: pa.array(ids[doc_u], pa.int64()),
            "tf": pa.array(cnt.astype(np.int64), pa.int64()),
        }
        if positions:
            # 1-based word position within its document, flat order ==
            # text order (split + empty-filter preserve order)
            words_per_doc = np.bincount(doc_of, minlength=n)
            doc_starts = np.concatenate([[0], np.cumsum(words_per_doc)[:-1]])
            pos = (
                np.arange(len(codes), dtype=np.int64)
                - doc_starts[doc_of]
                + 1
            )
            cols["pos"] = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(pos[order], pa.int64()),
            )
        cols["bucket"] = pa.array(buckets[code_u], pa.int64())
        return pa.table(cols)

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(partial, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(
            {
                "n_buckets": n_buckets,
                "hash": "fnv64",
                "id_col": id_col,
                "positions": bool(positions),
            },
            f,
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


def phrase_search(index_dir: str, phrase: Sequence[str], k: int = 20):
    """Exact phrase search over a positional index
    (``build_postings(..., positions=True)``): documents containing the
    words of ``phrase`` at consecutive positions, ranked by occurrence
    count (desc, then id). Returns Dataset[(id_col, n_occ)], <= k rows.

    Scale shape: the read is pruned to the phrase terms' buckets; the
    only exchange is a ``groupby(doc)`` over the postings rows of THOSE
    terms (query-bounded, never index-sized); each group holds one row
    per distinct phrase term and verifies consecutiveness with
    ``np.intersect1d`` over shifted position lists. Repeated phrase
    words reuse the same postings row at different offsets."""
    import ray.data

    with open(os.path.join(index_dir, _MANIFEST)) as f:
        man = json.load(f)
    if not man.get("positions"):
        raise ValueError("index was built without positions=True")
    id_col = man["id_col"]
    phrase = [str(w) for w in phrase]
    if not phrase:
        raise ValueError("empty phrase")
    qterms = sorted(set(phrase))
    buckets = sorted(set(_term_buckets(qterms, int(man["n_buckets"])).tolist()))
    empty = pa.table(
        {id_col: pa.array([], pa.int64()), "n_occ": pa.array([], pa.int64())}
    )
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
    if not paths:
        return ray.data.from_arrow(empty)
    term_set = pa.array(qterms, pa.string())
    ds = ray.data.read_parquet(paths, columns=["term", id_col, "pos"])

    def prefilter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["term"], value_set=term_set))

    need = len(qterms)

    def verify(group: pa.Table) -> pa.Table:
        if group.num_rows < need:
            return empty
        pos_by_term = {
            t: np.asarray(p, dtype=np.int64)
            for t, p in zip(
                group["term"].to_pylist(), group["pos"].to_pylist()
            )
        }
        base = None
        for off, w in enumerate(phrase):
            if w not in pos_by_term:
                return empty
            shifted = pos_by_term[w] - off
            base = shifted if base is None else np.intersect1d(base, shifted)
            if len(base) == 0:
                return empty
        return pa.table(
            {
                id_col: pa.array(
                    [int(group[id_col][0].as_py())], pa.int64()
                ),
                "n_occ": pa.array([len(base)], pa.int64()),
            }
        )

    return (
        ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby(id_col)
        .map_groups(verify, batch_format="pyarrow")
        .sort(["n_occ", id_col], descending=[True, False])
        .limit(k)
    )


def update_postings(index_dir: str, new_ds, text_col: str = "text") -> str:
    """Incrementally add NEW documents to an existing postings index:
    their postings rows append as new parquet files inside the existing
    ``bucket=i/`` directories (Ray names output files uniquely, so this
    never rewrites or clobbers prior files). Searches over the updated
    index equal a fresh build over the union corpus because a (term,
    doc) row exists exactly once globally — new doc ids must be new.

    This is the index-maintenance half of the CDC story
    (pipelines/relational.py::upsert_merge): at 100 TB re-building the
    postings layout per crawl snapshot is a full corpus pass, while the
    update costs one pass over the DELTA only."""
    with open(os.path.join(index_dir, _MANIFEST)) as f:
        man = json.load(f)
    # identical layout parameters; build_postings would also rewrite the
    # manifest, which is byte-identical here
    return build_postings(
        new_ds,
        index_dir,
        text_col=text_col,
        id_col=man["id_col"],
        n_buckets=int(man["n_buckets"]),
        positions=bool(man.get("positions")),
    )
