"""Planted-input constructions for non-SQL-expressible pipeline oracles.

The planted-codeword idiom (first used for the multimodal dedup family,
stages/multimodal.py): derive a deterministic input from row ids alone,
so a DuckDB oracle over the same tables can state the expected output in
closed form — converting rows-only driver checks into hash checks.

For SECTOR BEMD segmentation (core/sections.py::bemd_deviation,
reference SectorAnnotator.java:507-542) the chain (PCA with the first
two components zeroed, gaussian smoothing, geometric-mean directional
deviation, strict-local-maxima edges) admits no closed form, but it IS a
pure function of the text. So the construction below fixes a 52-residue
cycle of planted documents (text depends only on ``doc_id % 52``), and
``BEMD_RESIDUE_SECTIONS`` pins the section count the single-process core
path produces for each residue. The SQL oracle embeds that table as
literals (the knn_lsh seeded-hyperplane precedent) and the driver then
checks the DISTRIBUTED Ray pipeline against the pinned single-process
result — a layout/batching-independence check end-to-end through the
driver. tests/test_sections_eval.py recomputes the table from the core
stage on every run, so the literals can never drift from the code.
"""

from __future__ import annotations

BEMD_CYCLE = 52  # lcm(4 block-count residues, 13 vocab residues)


def bemd_planted_text(doc_id: int) -> str:
    """Deterministic k-block document (k = doc_id%4 + 2, six sentences
    per block, one block-unique word per sentence repeated three times).
    Text depends only on ``doc_id % BEMD_CYCLE``."""
    r = doc_id % BEMD_CYCLE
    k = r % 4 + 2
    parts = []
    for j in range(k):
        w = "B%dq%d" % (j, r % 13)
        parts += ["%s %s %s." % (w, w.lower(), w.lower())] * 6
    return " ".join(parts)


def bemd_sections_for_residue(r: int) -> int:
    """Single-process golden: run the REAL SectionStage pipeline pieces
    (segment/tokenize exactly as ExtractStage does) on the planted text
    and count sections. Used to (re)generate and pin
    ``BEMD_RESIDUE_SECTIONS`` — never called in the distributed path."""
    import numpy as np

    from .document import segment_text
    from .features import sentence_embedding
    from .sections import (
        bemd_deviation,
        detect_edges,
        directional_context,
        sections_from_edges,
    )

    doc = segment_text(bemd_planted_text(r))
    if not doc.sentences:
        return 0
    emb = np.stack(
        [sentence_embedding(s.tokens, 64) for s in doc.sentences]
    )
    fw, bw = directional_context(emb)
    dev = bemd_deviation(fw, bw) if emb.shape[0] >= 2 else None
    edges = detect_edges(dev)
    return len(sections_from_edges(doc.sentences, edges, doc.end))


# Pinned golden (see module docstring); regenerate with
#   python -c "from texoo_ray.core.planted import *; \
#              print([bemd_sections_for_residue(r) for r in range(52)])"
BEMD_RESIDUE_SECTIONS = [
    2, 1, 4, 5, 3, 1, 4, 5, 4, 1, 4, 5, 3, 2, 4, 5, 4, 1, 4, 5, 3, 1,
    3, 5, 4, 1, 5, 5, 3, 1, 4, 5, 3, 1, 3, 5, 3, 1, 4, 5, 4, 1, 4, 5,
    3, 1, 4, 5, 3, 2, 4, 5,
]


# --- planted entity-linking fixture (stages/linker.py::KnowledgeBase) ---

LINKER_N_ENTITIES = 60


def linker_codeword(i: int, salt: bytes = b"kbent") -> str:
    """Deterministic 12-lowercase-letter codeword for entity ``i``: md5
    bytes mapped onto a-z. Random 12-letter strings are pairwise
    JW-distant (the separation invariant is PINNED for all pairs in
    tests/test_linker_encoders.py, not assumed)."""
    import hashlib

    h = hashlib.md5(salt + b"-%d" % i).digest()
    return "".join(chr(ord("a") + b % 26) for b in h[:12])


def linker_entity_name(i: int) -> str:
    """KB entity name: unique codeword + a 6-way shared group token (the
    group token gives the BM25 candidate stage real posting lists)."""
    return "%s grp%d" % (linker_codeword(i), i % 6)


def linker_planted_mention(doc_id: int) -> tuple:
    """(mention_text, expected_ref_index) for a documents row.

    Linking rows (doc_id % 3 != 0): the target entity's codeword with
    ONE letter substituted (+13 ring shift at position doc_id % 12) +
    the target's group token — an inexact mention that must flow
    through BM25/trigram candidate generation and Jaro-Winkler rerank
    to entity ``(doc_id // 3) % LINKER_N_ENTITIES`` (expected index >=
    0). Non-linking rows (doc_id % 3 == 0): a fresh codeword NEVER
    inserted in the KB (salt differs) — every KB name's JW must stay
    below the 0.8 min_score (pinned), so the linker returns no link
    (expected index -1). The mention depends only on doc_id % 180
    (link rows) / doc_id % 291 (no-link rows), so the pinned test in
    tests/test_linker_encoders.py covers EVERY reachable input."""
    if doc_id % 3 == 0:
        return linker_codeword(doc_id % 97, b"nolink"), -1
    t = (doc_id // 3) % LINKER_N_ENTITIES
    w = linker_codeword(t)
    pos = doc_id % 12
    sub = chr(ord("a") + (ord(w[pos]) - ord("a") + 13) % 26)
    return "%s grp%d" % (w[:pos] + sub + w[pos + 1 :], t % 6), t


# --- planted CDV passage-retrieval fixture (stages/cdv.py) ---------------

CDV_CYCLE = 12
_CDV_ON = "Zephyr treatment."          # hist ~0.467: opens (>= 0.35)
_CDV_EXT = "Zephyr."                   # hist ~0.290: extends only (>= 0.25)
_CDV_OFF = "Filler garden weather."    # hist ~0.097: closes

_CDV_PATTERNS = {
    0: ["OFF", "OFF"],
    1: ["ON", "OFF"],
    2: ["ON", "EXT", "OFF"],
    3: ["EXT", "OFF"],                  # never opens: hysteresis
    4: ["ON", "OFF", "ON"],             # reopen -> two passages
    5: ["ON", "EXT", "EXT", "OFF", "ON", "OFF"],
    6: ["OFF", "EXT", "ON", "OFF"],     # EXT before open doesn't open
    7: ["ON"],                          # EOF flush
    8: ["ON", "EXT", "ON", "OFF"],      # one continuous passage
    9: ["OFF", "ON", "EXT"],            # EOF flush of extended passage
    10: ["EXT", "ON", "EXT", "OFF", "OFF", "ON"],
    11: ["OFF"],
}
_CDV_WORDS = {"ON": _CDV_ON, "EXT": _CDV_EXT, "OFF": _CDV_OFF}

CDV_QUERY = {"query_id": "q0", "entity": "zephyr", "aspect": "treatment"}


def cdv_planted_text(doc_id: int) -> str:
    """Deterministic sentence pattern exercising the CDV threshold state
    machine's full hysteresis (open / extend-only / close / EOF-flush /
    reopen); depends only on ``doc_id % CDV_CYCLE``."""
    return " ".join(
        _CDV_WORDS[k] for k in _CDV_PATTERNS[doc_id % CDV_CYCLE]
    )


def cdv_passages_for_residue(r: int):
    """Single-process golden: run the REAL CdvRetrievalStage on the
    planted text and return [(begin, end)] — used to (re)generate and
    pin ``CDV_RESIDUE_PASSAGES``."""
    import ray

    import pyarrow as pa

    from ..stages.cdv import CdvRetrievalStage

    ref = ray.put({"queries": [dict(CDV_QUERY)]})
    stage = CdvRetrievalStage(ref, thres_in=0.35, thres_out=0.25)
    out = stage(
        pa.table(
            {
                "doc_id": pa.array([int(r)], pa.int64()),
                "text": [cdv_planted_text(r)],
            }
        )
    )
    return list(zip(out["begin"].to_pylist(), out["end"].to_pylist()))


# Pinned golden (regenerated from the core stage in
# tests/test_cdv.py::test_cdv_planted_residue_table_pinned)
CDV_RESIDUE_PASSAGES = {
    0: [],
    1: [(0, 17)],
    2: [(0, 25)],
    3: [],
    4: [(0, 17), (41, 58)],
    5: [(57, 74), (0, 33)],
    6: [(31, 48)],
    7: [(0, 17)],
    8: [(0, 43)],
    9: [(23, 48)],
    10: [(80, 97), (8, 33)],
    11: [],
}


# --- planted w2v-loaded SECTOR fixture (stages/extract.py::SectionStage
#     with w2v_path; stages/word2vec.py::Word2VecEncoder load contract) ---

W2V_CYCLE = 8


def ensure_planted_w2v(path: str) -> str:
    """Write (once) a deterministic 10-word, 16-dim (word, vector)
    parquet: v_j = e(j%16) + 0.25 * e((7j+3)%16). Exercises the real
    Word2VecEncoder parquet-load path with vectors the goldens control."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    words, vecs = [], []
    for j in range(10):
        v = np.zeros(16, dtype=np.float32)
        v[j % 16] = 1.0
        v[(7 * j + 3) % 16] += 0.25
        words.append("w%d" % j)
        vecs.append(v.tolist())
    tmp = path + ".tmp"
    pq.write_table(
        pa.table(
            {
                "word": pa.array(words, pa.string()),
                "vector": pa.array(vecs, pa.list_(pa.float32())),
            }
        ),
        tmp,
    )
    os.rename(tmp, path)
    return path


def w2v_planted_text(doc_id: int) -> str:
    """k = r%4 + 2 blocks of six sentences, block j built from vocab
    word w((j+r) % 10); depends only on doc_id % W2V_CYCLE."""
    r = doc_id % W2V_CYCLE
    k = r % 4 + 2
    parts = []
    for j in range(k):
        w = "w%d" % ((j + r) % 10)
        parts += ["%s %s %s." % (w.capitalize(), w, w)] * 6
    return " ".join(parts)


def w2v_sections_for_residue(r: int, w2v_path: str) -> int:
    """Single-process golden via the REAL SegmentStage + SectionStage
    (method='bemd', w2v loaded from parquet)."""
    import pyarrow as pa

    from ..stages.extract import SectionStage, SegmentStage

    seg = SegmentStage(newlines="keep", strip=True)
    sec = SectionStage(method="bemd", w2v_path=w2v_path)
    batch = pa.table(
        {
            "conv_id": pa.array(["c"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array([w2v_planted_text(r)], pa.string()),
            "tool": pa.array([""], pa.string()),
        }
    )
    out = sec(seg(batch))
    return len(out["sections"].to_pylist()[0])


# Pinned golden (regenerated in tests/test_sections_eval.py)
W2V_RESIDUE_SECTIONS = [3, 1, 4, 5, 2, 1, 4, 5]
