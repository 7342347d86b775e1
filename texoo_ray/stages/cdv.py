"""CDV answer-passage retrieval — the texoo-cdv inference family.

Maps the reference's contextual-document-vector retrieval pipeline
(texoo-cdv/src/main/java/de/datexis/cdv) to Ray Data:

- ``clean_wiki_page_title`` / ``aspect_preprocess``: the two key
  preprocessors (WikipediaUrlPreprocessor.java:30-43,
  AspectPreprocessor.java:12-23).
- ``EntityIndex`` / ``AspectIndex``: key->vector lookup tables with
  encoder fallback (EntityIndex.java:44-65 multi-id ';' averaging,
  AspectIndex.java:50-84 heading splitting at " | "/" and "/"&"/"/").
- ``cdv_retrieve``: QueryRunner.java:157-272 — per document, a
  per-sentence relevance histogram = unit(query vector) projected onto
  the column-normalized stacked entity+aspect sentence matrix; passages
  come from either the SENTENCE_THRESHOLD state machine
  (QueryRunner.java:354-392, enter >= thres_in, exit < thres_out,
  score = mean) or PASSAGE_RANK averaging over predefined passages
  (QueryRunner.java:284-313).
- candidate preselection mirrors Candidates.INDEX
  (QueryRunner.java:147-155): a BM25 document index retrieves
  NUM_CANDIDATES=64 docs per query; docs outside every query's
  candidate set are skipped.

Ray shape: queries (the small side) are encoded ONCE and broadcast via
``ray.put``; documents stream through a stateless ``map_batches`` that
scores ALL queries against a doc's sentence matrix in one numpy matmul;
the per-query top-k finishes with a partial per-batch cap plus one
``groupby(query_id).map_groups`` over candidate rows only. Nothing
corpus-sized is materialized.

The learned CDV encoders (CDVTagger, training) are out of scope
(training ⛔); sentence embeddings default to the deterministic hashed
n-gram stand-in (core.features.sentence_embedding), with an optional
Word2VecEncoder matrix path like stages.extract.SectionStage.
"""

from __future__ import annotations

import html
import re
from typing import Dict, List, Optional, Sequence, Tuple
from urllib.parse import unquote

import numpy as np
import pyarrow as pa

from ..core.document import Newlines, segment_text
from ..core.features import sentence_embedding
from ..core.normalize import (
    replace_accents,
    replace_dashes,
    replace_numbers,
    replace_punctuation,
    replace_spaces,
    replace_umlauts,
)

NUM_CANDIDATES = 64  # QueryRunner.java:49
THRES_IN = 0.8  # QueryRunner.java:362
THRES_OUT = 0.6  # QueryRunner.java:363

ID_SEPARATOR = ";"  # EntityIndex.java:30
HEADING_SEPARATOR_RE = re.compile(r" \| | and |&|/")  # AspectIndex.java:31

_WIKI_PREFIX_RE = re.compile(r"^.+/wiki/")
_ANCHOR_RE = re.compile(r"#.+$")
_BAD_PCT_RE = re.compile(r"%(?![0-9A-F][0-9A-F])")


def clean_wiki_page_title(page_title: str) -> str:
    """WikipediaUrlPreprocessor.cleanWikiPageTitle (:30-43): strip URL
    host path and anchors, decode percent-escapes (lone '%' first
    escaped to '%25'), unescape HTML entities, spaces -> underscores."""
    page_title = _WIKI_PREFIX_RE.sub("", page_title, count=1)
    page_title = _ANCHOR_RE.sub("", page_title, count=1)
    page_title = _BAD_PCT_RE.sub("%25", page_title)
    try:
        page_title = unquote(page_title, errors="strict")
    except (UnicodeDecodeError, ValueError):
        pass
    page_title = html.unescape(page_title)
    return page_title.replace(" ", "_").strip()


def aspect_preprocess(token: Optional[str]) -> Optional[str]:
    """AspectPreprocessor.preProcess (:12-23): umlauts, accents, dashes
    -> space, punctuation stripped, numbers -> '#', spaces -> '_',
    lowercase."""
    if token is None:
        return None
    token = token.strip()
    token = replace_umlauts(token)
    token = replace_accents(token)
    token = replace_dashes(token, " ")
    token = replace_punctuation(token, "")
    token = replace_numbers(token, "#")
    token = replace_spaces(token, "_")
    return token.lower().strip()


def _unit(v: np.ndarray) -> np.ndarray:
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def cdv_sentence_embedding(token_texts: Sequence[str], dim: int) -> np.ndarray:
    """Order-sensitive hashed sentence embedding: unigram + word-bigram
    features, L2-normalized.

    The CDV paper's core claim is that its learned sentence encoders are
    order-sensitive (unlike bag-of-words baselines), so the deterministic
    stand-in for CDVTagger embeddings hashes consecutive-word bigrams in
    addition to tokens — a query phrase only aligns with sentences that
    contain its words in sequence. Unigrams keep the letter-n-gram
    hashing (sub-word generalization: 'caused'~'causes', like the
    reference's LetterNGramEncoder); each bigram is ONE signed hash
    feature with weight ``bigram_weight`` — single-hash so 'scan_row'
    shares nothing with 'scan'+'row', weighted so the order signal isn't
    drowned by unigram mass. (core.features.sentence_embedding stays
    pure bag-of-ngrams for the SECTOR stages.)"""
    import zlib

    from ..core.features import hashed_ngram_vector

    bigram_weight = 2.0
    v = np.zeros(dim, dtype=np.float32)
    prev = None
    for t in token_texts:
        if not t or t == "\n":
            continue
        w = t.lower()
        v += hashed_ngram_vector(w, dim)
        if prev is not None:
            h2 = zlib.crc32((prev + "_" + w).encode("utf-8"))
            v[h2 % dim] += bigram_weight if (h2 >> 16) & 1 else -bigram_weight
        prev = w
    norm = float(np.linalg.norm(v))
    if norm > 0:
        v /= norm
    return v


def encode_text(text: str, dim: int, w2v=None) -> np.ndarray:
    """Sentence vector of a raw string (tokenize + embed)."""
    doc = segment_text(text or "", Newlines.KEEP)
    toks = doc.tokens()
    if w2v is not None:
        return w2v.sentence_vector([t.text for t in toks]).astype(np.float32)
    return cdv_sentence_embedding([t.text for t in toks], dim)


class QueryIndex:
    """Key -> vector lookup with encoder fallback (QueryIndex.java:28-47
    over InMemoryIndex). ``vectors`` maps PREPROCESSED keys to numpy
    vectors; unseen keys fall back to encoding the surface text."""

    def __init__(self, dim: int, vectors: Optional[Dict[str, np.ndarray]] = None, w2v=None):
        self.dim = dim
        self.vectors: Dict[str, np.ndarray] = dict(vectors or {})
        self.w2v = w2v
        if w2v is not None and w2v.dim:
            self.dim = w2v.dim

    def preprocess(self, key: str) -> str:
        return key

    def put(self, key: str, vec: np.ndarray) -> None:
        self.vectors[self.preprocess(key)] = np.asarray(vec, dtype=np.float32)

    def lookup_raw(self, key: str) -> Optional[np.ndarray]:
        return self.vectors.get(self.preprocess(key))

    def encode(self, text: str) -> np.ndarray:
        return encode_text(text, self.dim, self.w2v)


class EntityIndex(QueryIndex):
    """EntityIndex.java:25-65 — Wikipedia-page-title keys; lookup splits
    multi-ids at ';' and averages; encode replaces '_' with spaces."""

    def preprocess(self, key: str) -> str:
        return clean_wiki_page_title(key)

    def lookup(self, entity_id: str) -> Optional[np.ndarray]:
        vecs = [
            v
            for v in (self.lookup_raw(s) for s in entity_id.split(ID_SEPARATOR))
            if v is not None
        ]
        if not vecs:
            return None
        return vecs[0] if len(vecs) == 1 else np.mean(vecs, axis=0)

    def encode(self, mention: str) -> np.ndarray:
        return super().encode(mention.replace("_", " "))


class AspectIndex(QueryIndex):
    """AspectIndex.java:27-105 — heading keys; both lookup and encode
    split at " | ", " and ", "&", "/" and average the parts."""

    def preprocess(self, key: str) -> str:
        return aspect_preprocess(key) or ""

    def lookup(self, heading: str) -> Optional[np.ndarray]:
        vecs = [
            v
            for v in (
                self.lookup_raw(s.strip())
                for s in HEADING_SEPARATOR_RE.split(heading)
            )
            if v is not None
        ]
        if not vecs:
            return None
        return vecs[0] if len(vecs) == 1 else np.mean(vecs, axis=0)

    def encode(self, heading: str) -> np.ndarray:
        parts = [s.strip() for s in HEADING_SEPARATOR_RE.split(heading)]
        vecs = [super(AspectIndex, self).encode(s) for s in parts if s]
        if not vecs:
            return np.zeros(self.dim, dtype=np.float32)
        return vecs[0] if len(vecs) == 1 else np.mean(vecs, axis=0)


def build_aspect_index_from_labels(
    labels: Sequence[str], dim: int = 32, w2v=None
) -> AspectIndex:
    """AspectIndex.encodeIndexFromLabels (:107-130): 'Abstract' maps to
    'Description'; each heading split becomes one key encoded from its
    own surface form."""
    idx = AspectIndex(dim, w2v=w2v)
    for label in labels:
        if label == "Abstract":
            label = "Description"
        for s in HEADING_SEPARATOR_RE.split(label):
            s = s.strip()
            key = idx.preprocess(s)
            if s and key not in idx.vectors:
                idx.vectors[key] = QueryIndex.encode(idx, s)
    return idx


def build_entity_index_from_queries(
    queries: Sequence[dict], dim: int = 64, w2v=None
) -> EntityIndex:
    """EntityIndex.encodeFromQueries (:117-147): key = each ';'-split
    entity_id, vector = fallback-encoded entity surface form (we have no
    pretrained id embeddings; the reference falls back the same way)."""
    idx = EntityIndex(dim, w2v=w2v)
    for q in queries:
        eid, entity = q.get("entity_id"), q.get("entity") or ""
        if not eid:
            continue
        for s in eid.split(ID_SEPARATOR):
            key = idx.preprocess(s)
            if key not in idx.vectors:
                idx.vectors[key] = idx.encode(entity)
    return idx


def query_vector(
    q: dict, entity_index: Optional[EntityIndex], aspect_index: Optional[AspectIndex]
) -> Optional[Tuple[str, np.ndarray]]:
    """QueryRunner.retrieveQueryFromDocs (:161-191): look up entity id
    (fallback: encode surface), look up preprocessed aspect (fallback:
    encode). Returns (mode, vector) with mode one of 'fa' (both parts,
    concatenated + re-unit-normalized, projectQuery :257-272), 'f'
    (entity-only, scored against the entity sentence matrix alone,
    QueryRunner.java:240-245), 'a' (aspect-only)."""
    qf = qa = None
    if entity_index is not None and (q.get("entity") or q.get("entity_id")):
        qf = entity_index.lookup(q.get("entity_id") or q.get("entity") or "")
        if qf is None:
            qf = entity_index.encode(q.get("entity") or "")
    if aspect_index is not None and q.get("aspect"):
        qa = aspect_index.lookup(q["aspect"])
        if qa is None:
            qa = aspect_index.encode(q["aspect"])
    if qf is not None and qa is not None:
        return "fa", _unit(np.concatenate([_unit(qf), _unit(qa)]).astype(np.float32))
    if qf is not None:
        return "f", _unit(qf.astype(np.float32))
    if qa is not None:
        return "a", _unit(qa.astype(np.float32))
    return None


def passages_by_threshold(
    hist: np.ndarray,
    bounds: Sequence[Tuple[int, int]],
    thres_in: float = THRES_IN,
    thres_out: float = THRES_OUT,
) -> List[Tuple[int, int, float]]:
    """QueryRunner.retrievePassagesByThreshold (:354-392): state machine
    over per-sentence scores; a passage opens at >= thres_in, extends
    while >= thres_out, closes below thres_out with score = mean; an
    open passage at EOF is flushed."""
    out: List[Tuple[int, int, float]] = []
    inside = False
    begin = end = 0
    length = 1.0
    ssum = 0.0
    for (s_begin, s_end), p in zip(bounds, hist):
        p = float(p)
        if not inside and p >= thres_in:
            inside = True
            length = 1.0
            ssum = p
            begin, end = s_begin, s_end
        elif inside and p < thres_out:
            inside = False
            out.append((begin, end, ssum / length))
        elif inside:
            length += 1.0
            ssum += p
            end = s_end
    if inside:
        out.append((begin, end, ssum / length))
    return out


def passages_by_rank(
    hist: np.ndarray,
    bounds: Sequence[Tuple[int, int]],
    candidates: Sequence[Tuple[int, int]],
) -> List[Tuple[int, int, float]]:
    """QueryRunner.retrievePassagesByRanking (:284-313): for each
    predefined candidate passage, score = mean histogram value over the
    sentences overlapping [begin, end)."""
    out: List[Tuple[int, int, float]] = []
    for c_begin, c_end in candidates:
        vals = [
            float(hist[i])
            for i, (s_begin, s_end) in enumerate(bounds)
            if s_begin < c_end and s_end > c_begin
        ]
        if vals:
            out.append((c_begin, c_end, float(np.mean(vals))))
    return out


class CdvRetrievalStage:
    """Actor-pool stage: broadcast queries scored against streamed docs.

    ``__init__`` (once per actor) gets the broadcast query pack — raw
    query rows plus optional prebuilt index vector dicts — builds the
    indexes and encodes every query vector once. ``__call__`` segments
    each doc, builds its entity+aspect sentence matrix, row-normalizes
    the stacked per-sentence vectors (CDVTagger.attachCDVDocumentMatrix
    contract, cited at QueryRunner.java:249-272), and computes ALL query
    histograms in one (n_sents, Q) matmul.
    """

    def __init__(
        self,
        queries_ref,
        entity_dim: int = 64,
        aspect_dim: int = 32,
        strategy: str = "threshold",
        thres_in: float = THRES_IN,
        thres_out: float = THRES_OUT,
        per_query_cap: int = 10,
        w2v_path: Optional[str] = None,
        text_col: str = "text",
        id_col: str = "doc_id",
        passages_col: Optional[str] = None,
    ):
        import ray

        assert strategy in ("threshold", "rank")
        self.strategy = strategy
        self.thres_in = thres_in
        self.thres_out = thres_out
        self.cap = per_query_cap
        self.text_col = text_col
        self.id_col = id_col
        self.passages_col = passages_col
        w2v = None
        if w2v_path:
            from .word2vec import Word2VecEncoder

            w2v = Word2VecEncoder(w2v_path)
        self.entity_dim = w2v.dim if w2v is not None and w2v.dim else entity_dim
        self.aspect_dim = w2v.dim if w2v is not None and w2v.dim else aspect_dim
        self.w2v = w2v
        pack = ray.get(queries_ref)
        rows = pack["queries"]
        ent_idx = EntityIndex(entity_dim, pack.get("entity_vectors"), w2v=w2v)
        asp_idx = AspectIndex(aspect_dim, pack.get("aspect_vectors"), w2v=w2v)
        # queries grouped by mode: 'fa' scores against the stacked
        # entity+aspect matrix, 'f'/'a' against the matching part alone
        # (QueryRunner.java:237-245's three projectQuery dispatches)
        self.query_ids: Dict[str, List[str]] = {"fa": [], "f": [], "a": []}
        self.candidates: Dict[str, List[Optional[frozenset]]] = {
            "fa": [],
            "f": [],
            "a": [],
        }
        qvecs: Dict[str, List[np.ndarray]] = {"fa": [], "f": [], "a": []}
        for q in rows:
            mv = query_vector(q, ent_idx, asp_idx)
            if mv is None:
                continue
            mode, v = mv
            self.query_ids[mode].append(q["query_id"])
            qvecs[mode].append(v)
            cand = q.get("candidate_docs")
            self.candidates[mode].append(frozenset(cand) if cand is not None else None)
        dims = {
            "fa": self.entity_dim + self.aspect_dim,
            "f": self.entity_dim,
            "a": self.aspect_dim,
        }
        self.qmat: Dict[str, np.ndarray] = {
            m: (
                np.stack(qvecs[m]).astype(np.float32)
                if qvecs[m]
                else np.zeros((0, dims[m]), dtype=np.float32)
            )
            for m in qvecs
        }
        flat_cands = [c for m in self.candidates for c in self.candidates[m]]
        self.any_doc_unrestricted = any(c is None for c in flat_cands)
        self.all_candidates = (
            None
            if self.any_doc_unrestricted
            else frozenset().union(*flat_cands)
            if flat_cands
            else frozenset()
        )
        self.n_queries = sum(len(v) for v in self.query_ids.values())

    def _doc_matrix(
        self, text: str
    ) -> Tuple[Dict[str, np.ndarray], List[Tuple[int, int]]]:
        """Per-sentence matrices for each query mode. CDVTagger's
        attachCDVDocumentMatrix unit-normalizes each part per sentence;
        the concatenated path re-normalizes the stacked vector
        (QueryRunner.java:257-272)."""
        doc = segment_text(text or "", Newlines.KEEP)
        bounds = [(s.begin, s.end) for s in doc.sentences]
        if not doc.sentences:
            z = {
                "f": np.zeros((0, self.entity_dim), dtype=np.float32),
                "a": np.zeros((0, self.aspect_dim), dtype=np.float32),
                "fa": np.zeros(
                    (0, self.entity_dim + self.aspect_dim), dtype=np.float32
                ),
            }
            return z, bounds
        rows_f, rows_a, rows_fa = [], [], []
        for s in doc.sentences:
            texts = [t.text for t in s.tokens]
            if self.w2v is not None:
                vf = self.w2v.sentence_vector(texts).astype(np.float32)
                va = vf
            else:
                vf = cdv_sentence_embedding(texts, self.entity_dim)
                va = cdv_sentence_embedding(texts, self.aspect_dim)
            uf, ua = _unit(vf), _unit(va)
            rows_f.append(uf)
            rows_a.append(ua)
            rows_fa.append(_unit(np.concatenate([uf, ua])))
        return (
            {
                "f": np.stack(rows_f).astype(np.float32),
                "a": np.stack(rows_a).astype(np.float32),
                "fa": np.stack(rows_fa).astype(np.float32),
            },
            bounds,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        q_col: List[str] = []
        d_col: List = []
        b_col: List[int] = []
        e_col: List[int] = []
        s_col: List[float] = []
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        panns = (
            batch[self.passages_col].to_pylist()
            if self.passages_col and self.passages_col in batch.column_names
            else [None] * len(ids)
        )
        for doc_id, text, passages in zip(ids, texts, panns):
            if not self.any_doc_unrestricted and (
                self.all_candidates is not None and doc_id not in self.all_candidates
            ):
                continue
            if self.n_queries == 0:
                continue
            mats, bounds = self._doc_matrix(text)
            if not bounds:
                continue
            cands = (
                [(p["begin"], p["end"]) for p in passages]
                if passages is not None
                else None
            )
            for mode in ("fa", "f", "a"):
                qids = self.query_ids[mode]
                if not qids:
                    continue
                H = mats[mode] @ self.qmat[mode].T  # (n_sents, Q_mode)
                for qi, qid in enumerate(qids):
                    allowed = self.candidates[mode][qi]
                    if allowed is not None and doc_id not in allowed:
                        continue
                    hist = H[:, qi]
                    if self.strategy == "rank" and cands is not None:
                        found = passages_by_rank(hist, bounds, cands)
                    else:
                        found = passages_by_threshold(
                            hist, bounds, self.thres_in, self.thres_out
                        )
                    found.sort(key=lambda t: (-t[2], t[0]))
                    for begin, end, score in found[: self.cap]:
                        q_col.append(qid)
                        d_col.append(doc_id)
                        b_col.append(begin)
                        e_col.append(end)
                        s_col.append(score)
        return pa.table(
            {
                "query_id": pa.array(q_col, pa.string()),
                self.id_col: pa.array(d_col, batch[self.id_col].type),
                "begin": pa.array(b_col, pa.int32()),
                "end": pa.array(e_col, pa.int32()),
                "score": pa.array(s_col, pa.float64()),
            }
        )


def bm25_doc_candidates(
    docs_ds, queries: List[dict], num: int = NUM_CANDIDATES,
    text_col: str = "text", id_col: str = "doc_id",
) -> List[dict]:
    """Candidates.INDEX preselection (QueryRunner.java:147-155): BM25
    top-``num`` documents per query entity. The doc index builds from
    one streamed pass (id + text only); returns the queries with a
    ``candidate_docs`` list attached."""
    from .linker import Bm25Index

    texts: List[str] = []
    ids: List = []
    for b in docs_ds.select_columns([id_col, text_col]).iter_batches(
        batch_format="pyarrow"
    ):
        ids.extend(b[id_col].to_pylist())
        texts.extend(t or "" for t in b[text_col].to_pylist())
    index = Bm25Index(texts)
    out = []
    for q in queries:
        hits = index.query(q.get("entity") or "", num)
        out.append(dict(q, candidate_docs=[ids[i] for i, _ in hits]))
    return out


def cdv_retrieve(
    docs_ds,
    queries: List[dict],
    k: int = 10,
    strategy: str = "threshold",
    thres_in: float = THRES_IN,
    thres_out: float = THRES_OUT,
    entity_dim: int = 64,
    aspect_dim: int = 32,
    entity_vectors: Optional[Dict[str, np.ndarray]] = None,
    aspect_vectors: Optional[Dict[str, np.ndarray]] = None,
    w2v_path: Optional[str] = None,
    concurrency: int = 2,
    batch_size: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    passages_col: Optional[str] = None,
):
    """Full retrieval pipeline: broadcast queries -> per-doc histograms
    -> per-query global top-k with rank column.

    ``queries``: dicts with query_id, entity, entity_id, aspect and
    optionally candidate_docs (from ``bm25_doc_candidates``). Returns
    Dataset[(query_id, doc_id, begin, end, score, rank)] sorted by
    (query_id, rank).
    """
    import ray

    pack_ref = ray.put(
        {
            "queries": queries,
            "entity_vectors": entity_vectors,
            "aspect_vectors": aspect_vectors,
        }
    )
    scored = docs_ds.map_batches(
        CdvRetrievalStage,
        fn_constructor_kwargs=dict(
            queries_ref=pack_ref,
            entity_dim=entity_dim,
            aspect_dim=aspect_dim,
            strategy=strategy,
            thres_in=thres_in,
            thres_out=thres_out,
            per_query_cap=k,
            w2v_path=w2v_path,
            text_col=text_col,
            id_col=id_col,
            passages_col=passages_col,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def topk(group: pa.Table) -> pa.Table:
        order = sorted(
            range(group.num_rows),
            key=lambda i: (
                -group["score"][i].as_py(),
                group[id_col][i].as_py(),
                group["begin"][i].as_py(),
            ),
        )[:k]
        t = group.take(pa.array(order))
        return t.append_column("rank", pa.array(range(len(order)), pa.int32()))

    return (
        scored.groupby("query_id")
        .map_groups(topk, batch_format="pyarrow")
        .sort(["query_id", "rank"])
    )
