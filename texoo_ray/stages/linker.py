"""Entity linking: lookup-join of mentions against a small knowledge base.

Reimplements the observable contract of the reference's
NamedEntityAnnotator + LuceneArticleIndex
(NamedEntityAnnotator.java:108-134, LuceneArticleIndex.java:180-270):
per mention, candidate generation by normalized name, rerank by
Jaro-Winkler similarity, attach the best candidate's (ref_id, ref_name,
ref_url).

Ray mapping (SURVEY.md §2.6): **broadcast-small-side join** — the KB dict
is built once on the driver, shipped once per actor (constructor arg or
``ray.put`` ref), and probed per mention inside ``map_batches``. No
shuffle. For a KB too large to broadcast, partition both sides by
``hash(normalized_name)`` and join per bucket (documented alternative; not
needed for gazetteer-scale KBs).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa

from . import schema

LINKED_MENTION_TYPE = pa.list_(
    pa.struct(
        [
            ("begin", pa.int32()),
            ("end", pa.int32()),
            ("text", pa.string()),
            ("type", pa.string()),
            ("confidence", pa.float64()),
            ("source", pa.string()),
            ("ref_id", pa.string()),
            ("ref_name", pa.string()),
            ("ref_score", pa.float64()),
        ]
    )
)

_WS_RE = re.compile(r"\s+")


def normalize_name(name: str) -> str:
    """Lowercase, accent-fold, collapse whitespace (the analogue of the
    reference's ICU-analyzed names field, LuceneArticleIndex.java:65-97)."""
    n = unicodedata.normalize("NFD", name or "")
    n = "".join(c for c in n if not unicodedata.combining(c))
    return _WS_RE.sub(" ", n.lower()).strip()


def jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1) -> float:
    """Jaro-Winkler similarity (the reference reranks candidates with it,
    LuceneArticleIndex.java:214-270). Standard public formula."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    window = max(len1, len2) // 2 - 1
    if window < 0:
        window = 0
    match1 = [False] * len1
    match2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(len2, i + window + 1)
        for j in range(lo, hi):
            if not match2[j] and s2[j] == c:
                match1[i] = match2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if match1[i]:
            while not match2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / len1 + matches / len2 + (matches - t) / matches) / 3
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return jaro + prefix * prefix_scale * (1 - jaro)


NUM_BM25_CANDIDATES = 1024  # LuceneArticleIndex.java:89


class Bm25Index:
    """In-memory inverted index with Okapi BM25 scoring (k1=1.2, b=0.75 —
    Lucene BM25Similarity defaults; the reference's candidate generator,
    LuceneArticleIndex.java:180-214,463-480). One instance per actor."""

    K1 = 1.2
    B = 0.75

    def __init__(self, docs: Sequence[str]):
        """docs: one token-source string per indexed entity."""
        self.postings: Dict[str, List[Tuple[int, int]]] = {}
        self.doc_len: List[int] = []
        for i, text in enumerate(docs):
            tf: Dict[str, int] = {}
            toks = normalize_name(text).split()
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            self.doc_len.append(len(toks))
            for t, n in tf.items():
                self.postings.setdefault(t, []).append((i, n))
        self.n_docs = len(docs)
        self.avg_len = (sum(self.doc_len) / self.n_docs) if self.n_docs else 0.0

    def query(self, text: str, k: int = NUM_BM25_CANDIDATES) -> List[Tuple[int, float]]:
        """Top-k (doc_index, bm25_score), score-desc then index-asc."""
        import math

        scores: Dict[int, float] = {}
        for t in set(normalize_name(text).split()):
            plist = self.postings.get(t)
            if not plist:
                continue
            df = len(plist)
            idf = math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
            for i, tf in plist:
                dl = self.doc_len[i] or 1
                denom = tf + self.K1 * (1 - self.B + self.B * dl / self.avg_len)
                scores[i] = scores.get(i, 0.0) + idf * tf * (self.K1 + 1) / denom
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


class KnowledgeBase:
    """In-memory KB: exact-norm index + BM25 over names/aliases/description
    + character-trigram partial matching, Jaro-Winkler rerank.

    Candidate generation follows LuceneArticleIndex.queryNames: BM25 pulls
    up to NUM_BM25_CANDIDATES, each candidate's score is the MAX
    Jaro-Winkler over its names (:180-196), stable-sorted descending. The
    trigram postings stand in for the reference KB's TrigramEncoder KNN
    (KnowledgeBaseTest.java: partial strings like "ace" must retrieve
    "acetaminophen"). Context terms, when given, break Jaro-Winkler ties
    by BM25 similarity of the context against the entity's description."""

    def __init__(self, entries: Sequence[tuple]):
        """entries: (ref_id, name) or (ref_id, name, aliases, description)."""
        self.by_norm: Dict[str, List[Tuple[str, str]]] = {}
        self.entities: List[dict] = []
        tri_post: Dict[str, set] = {}
        docs: List[str] = []
        ctx_docs: List[str] = []
        for e in entries:
            ref_id, name = e[0], e[1]
            aliases = list(e[2]) if len(e) > 2 and e[2] else []
            desc = e[3] if len(e) > 3 else ""
            idx = len(self.entities)
            names = [name] + [a for a in aliases if a]
            norms = sorted({normalize_name(n) for n in names if n})
            self.entities.append(
                {"ref_id": ref_id, "name": name, "norms": norms, "desc": desc}
            )
            for n in norms:
                self.by_norm.setdefault(n, []).append((ref_id, name))
                for tri in self._trigrams(n):
                    tri_post.setdefault(tri, set()).add(idx)
            docs.append(" ".join(norms))
            ctx_docs.append(desc or "")
        self.tri_post = {t: sorted(s) for t, s in tri_post.items()}
        self.bm25 = Bm25Index(docs)
        self.ctx_bm25 = Bm25Index(ctx_docs)

    @staticmethod
    def _trigrams(s: str):
        s = "#" + s.replace(" ", "#") + "#"
        return {s[i : i + 3] for i in range(max(len(s) - 2, 1))}

    def find_nearest(
        self, mention_text: str, k: int = 10, context: Optional[str] = None
    ) -> List[Tuple[str, str, float]]:
        """Ranked (ref_id, ref_name, score) candidates; empty when nothing
        shares a term or trigram (KnowledgeBaseTest: '123456' -> empty)."""
        norm = normalize_name(mention_text)
        if not norm:
            return []
        cands = {i for i, _ in self.bm25.query(norm, NUM_BM25_CANDIDATES)}
        for tri in self._trigrams(norm):
            cands.update(self.tri_post.get(tri, ()))
        if not cands:
            return []
        ctx_scores: Dict[int, float] = {}
        if context:
            ctx_scores = dict(self.ctx_bm25.query(context, NUM_BM25_CANDIDATES))
        scored = []
        for i in sorted(cands):
            ent = self.entities[i]
            jw = max((jaro_winkler(norm, n) for n in ent["norms"]), default=0.0)
            scored.append((-jw, -ctx_scores.get(i, 0.0), i))
        scored.sort()
        out = []
        for neg_jw, _neg_ctx, i in scored[:k]:
            ent = self.entities[i]
            out.append((ent["ref_id"], ent["name"], -neg_jw))
        return out

    def link(
        self,
        mention_text: str,
        min_score: float = 0.8,
        context: Optional[str] = None,
    ) -> Optional[Tuple[str, str, float]]:
        """(ref_id, ref_name, score) of the best candidate, or None."""
        norm = normalize_name(mention_text)
        exact = self.by_norm.get(norm)
        if exact:
            ref_id, name = exact[0]
            return ref_id, name, 1.0
        best = self.find_nearest(mention_text, k=1, context=context)
        if best and best[0][2] >= min_score:
            return best[0]
        return None


class LinkerStage:
    """requires: ``mentions`` — attaches: ``linked_mentions`` (mentions with
    ref_id/ref_name/ref_score for resolvable ones).

    KB replicated per actor (actor ``__init__`` from broadcast entries)."""

    def __init__(
        self,
        kb_entries: Optional[Sequence[tuple]] = None,
        kb_ref=None,
        min_score: float = 0.8,
        context_col: Optional[str] = None,
    ):
        if kb_entries is None and kb_ref is not None:
            import ray

            kb_entries = ray.get(kb_ref)
        self.kb = KnowledgeBase(kb_entries or [])
        self.min_score = min_score
        self.context_col = context_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: List[list] = []
        contexts = (
            batch[self.context_col].to_pylist()
            if self.context_col and self.context_col in batch.column_names
            else [None] * batch.num_rows
        )
        for mentions, ctx in zip(batch["mentions"].to_pylist(), contexts):
            linked = []
            for m in mentions or []:
                hit = self.kb.link(m["text"], self.min_score, context=ctx)
                lm = dict(m)
                if hit:
                    lm["ref_id"], lm["ref_name"], lm["ref_score"] = hit
                else:
                    lm["ref_id"], lm["ref_name"], lm["ref_score"] = "", "", 0.0
                linked.append(lm)
            out.append(linked)
        if "linked_mentions" in batch.column_names:
            batch = batch.drop_columns(["linked_mentions"])
        return batch.append_column(
            "linked_mentions", pa.array(out, LINKED_MENTION_TYPE)
        )
