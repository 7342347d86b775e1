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


class KnowledgeBase:
    """In-memory KB: normalized-name index with word-key candidate lookup."""

    def __init__(self, entries: Sequence[Tuple[str, str]]):
        """entries: (ref_id, name)."""
        self.by_norm: Dict[str, List[Tuple[str, str]]] = {}
        self.by_word: Dict[str, List[Tuple[str, str, str]]] = {}
        for ref_id, name in entries:
            norm = normalize_name(name)
            self.by_norm.setdefault(norm, []).append((ref_id, name))
            for w in norm.split():
                self.by_word.setdefault(w, []).append((norm, ref_id, name))

    def link(self, mention_text: str, min_score: float = 0.8) -> Optional[Tuple[str, str, float]]:
        """(ref_id, ref_name, score) of the best candidate, or None."""
        norm = normalize_name(mention_text)
        exact = self.by_norm.get(norm)
        if exact:
            ref_id, name = exact[0]
            return ref_id, name, 1.0
        # candidate generation by shared word, Jaro-Winkler rerank
        best: Optional[Tuple[str, str, float]] = None
        seen = set()
        for w in norm.split():
            for cand_norm, ref_id, name in self.by_word.get(w, ()):
                if cand_norm in seen:
                    continue
                seen.add(cand_norm)
                score = jaro_winkler(norm, cand_norm)
                if score >= min_score and (best is None or score > best[2]):
                    best = (ref_id, name, score)
        return best


class LinkerStage:
    """requires: ``mentions`` — attaches: ``linked_mentions`` (mentions with
    ref_id/ref_name/ref_score for resolvable ones).

    KB replicated per actor (actor ``__init__`` from broadcast entries)."""

    def __init__(self, kb_entries: Optional[Sequence[Tuple[str, str]]] = None, kb_ref=None, min_score: float = 0.8):
        if kb_entries is None and kb_ref is not None:
            import ray

            kb_entries = ray.get(kb_ref)
        self.kb = KnowledgeBase(kb_entries or [])
        self.min_score = min_score

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: List[list] = []
        for mentions in batch["mentions"].to_pylist():
            linked = []
            for m in mentions or []:
                hit = self.kb.link(m["text"], self.min_score)
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
