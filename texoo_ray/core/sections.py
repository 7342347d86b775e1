"""SECTOR-style section segmentation heuristics (per-document numpy math).

Ports the observable math of SectorAnnotator.java:369-684 in
/root/reference/texoo-sector/src/main/java/de/datexis/sector/:

- NL: a section closes at every sentence containing a newline token (:381-401)
- MAX: new section when the sentence's top-k nearest labels no longer
  contain the running section label (:408-437)
- EMD: PCA(16) -> gaussian smooth (sd 2.5) -> cosine-distance first
  derivative -> local-maxima edges (:487-502)
- BEMD: forward/backward matrices -> PCA(16) with first two components
  zeroed -> smooth (sd 1.5) -> geometric-mean fw/bw deviation (:507-542)
- detect_edges: strict local maxima; first step always an edge; fixed-count
  variant picks the N-1 largest peaks then fills by magnitude (:631-684)

A section is a dict {begin, end, label, heading, confidence}.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .spans import Sentence

PCA_DIMS = 16


def pca_project(m: np.ndarray, dims: int, normalize: bool = True) -> np.ndarray:
    """Project rows of ``m`` onto the top principal components
    (ND4J PCA.pca_factor analogue, SectorAnnotator.java:578-580).

    Deterministic: SVD with sign convention (largest-|.| component of each
    factor is positive).
    """
    dims = min(dims, m.shape[1], max(1, m.shape[0] - 1) if m.shape[0] > 1 else m.shape[1])
    x = m.astype(np.float64)
    x = x - x.mean(axis=0, keepdims=True)
    if normalize:
        std = x.std(axis=0, ddof=1) if x.shape[0] > 1 else np.ones(x.shape[1])
        std[std == 0] = 1.0
        x = x / std
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    factors = vt[:dims].T  # (D, dims)
    # sign convention for determinism
    for j in range(factors.shape[1]):
        k = int(np.argmax(np.abs(factors[:, j])))
        if factors[k, j] < 0:
            factors[:, j] = -factors[:, j]
    return x @ factors


def gaussian_smooth(m: np.ndarray, sd: float = 2.5) -> np.ndarray:
    """Row-wise gaussian convolution: smooth[t] = sum_k N(k; t, sd) * m[k]
    (SectorAnnotator.java:582-598). Unnormalized, like the reference."""
    t_idx = np.arange(m.shape[0], dtype=np.float64)
    diff = t_idx[:, None] - t_idx[None, :]
    kernel = np.exp(-(diff**2) / (2 * sd * sd)) / (sd * np.sqrt(2 * np.pi))
    return kernel @ m


def _cosine_distance(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
    if na == 0 or nb == 0:
        return 1.0
    return 1.0 - float(np.dot(a, b)) / (na * nb)


def deviation(m: np.ndarray) -> np.ndarray:
    """Cosine distance between consecutive rows; dev[0]=0
    (SectorAnnotator.java:620-626)."""
    T = m.shape[0]
    dev = np.zeros(T)
    for t in range(1, T):
        dev[t] = _cosine_distance(m[t], m[t - 1])
    return dev


def deviation_bidirectional(fw: np.ndarray, bw: np.ndarray) -> np.ndarray:
    """Geometric mean of forward-late / backward-early first derivatives
    (SectorAnnotator.java:603-615)."""
    T = fw.shape[0]
    dev = np.zeros(T)
    for t in range(1, T):
        fwd1 = _cosine_distance(fw[t], fw[t + 1]) if t < T - 1 else 0.0
        bwd1 = _cosine_distance(bw[t - 1], bw[t - 2]) if t > 2 else 0.0
        geom = np.sqrt(max(fwd1, 0.0) * max(bwd1, 0.0))
        dev[t] = 0.0 if np.isnan(geom) else float(geom)
    return dev


def detect_edges(dev: Optional[np.ndarray], count: Optional[int] = None) -> Optional[np.ndarray]:
    """Edges at strict local maxima of the deviation; edge[0] is always set
    (SectorAnnotator.java:631-644). With ``count``, pick the N-1 largest
    peaks and fill remaining slots by raw magnitude (:647-684)."""
    if dev is None:
        return None
    T = dev.shape[0]
    edges = np.zeros(T)
    peaks = np.zeros(T)
    for t in range(1, T - 1):
        if dev[t - 1] < dev[t] and dev[t + 1] < dev[t]:
            peaks[t] = dev[t]
    if count is None:
        edges[peaks > 0] = 1.0
        edges[0] = 1.0
        return edges
    # fixed-count variant
    peak_order = np.argsort(-peaks, kind="stable")
    picked = 0
    for idx in peak_order:
        if picked >= count - 1:
            break
        if idx == 0:
            continue
        if peaks[idx] == 0.0:
            break
        edges[idx] = 1.0
        picked += 1
    mag_order = np.argsort(-dev, kind="stable")
    i = 0
    while i < T and edges.sum() < count - 1:
        idx = mag_order[i]
        i += 1
        if idx == 0 or edges[idx] == 1.0:
            continue
        edges[idx] = 1.0
    edges[0] = 1.0
    return edges


def _section(begin: int, end: int, label: str = "", heading: str = "", confidence: float = 1.0) -> Dict:
    return {"begin": begin, "end": end, "label": label, "heading": heading, "confidence": confidence}


def sections_from_edges(sentences: Sequence[Sentence], edges: Optional[np.ndarray], doc_end: Optional[int] = None) -> List[Dict]:
    """Edges (one per sentence) → section spans (applySectionsFromEdges,
    :442-482). Empty doc → no sections; single sentence or no edges → one
    section over the whole document."""
    sents = list(sentences)
    if not sents:
        return []
    begin0 = sents[0].begin
    end_doc = doc_end if doc_end is not None else sents[-1].end
    if edges is None or len(sents) < 2:
        return [_section(begin0, end_doc)]
    out: List[Dict] = []
    sec_begin = begin0
    sec_end = begin0
    sec_len = 0
    for t, s in enumerate(sents):
        if edges[t] > 0:
            if sec_len > 0:
                out.append(_section(sec_begin, sec_end))
            sec_begin = s.begin
            sec_len = 0
        sec_len += 1
        sec_end = s.end
    if sec_len > 0:
        out.append(_section(sec_begin, sec_end))
    return out


def sections_from_newlines(sentences: Sequence[Sentence], doc_end: Optional[int] = None) -> List[Dict]:
    """A section closes at each sentence containing a newline token
    (applySectionsFromNewlines, :381-401)."""
    out: List[Dict] = []
    sec_begin: Optional[int] = None
    sents = list(sentences)
    for s in sents:
        end_par = any(t.text in ("\n", "*NL*") for t in s.tokens)
        if sec_begin is None:
            sec_begin = s.begin
        if end_par:
            out.append(_section(sec_begin, s.end))
            sec_begin = None
    if sec_begin is not None and sents:
        out.append(_section(sec_begin, doc_end if doc_end is not None else sents[-1].end))
    return out


def sections_from_target_labels(
    sentences: Sequence[Sentence],
    predictions: np.ndarray,
    label_matrix: np.ndarray,
    label_names: Sequence[str],
    k: int = 2,
) -> List[Dict]:
    """MAX strategy (applySectionsFromTargetLabels, :408-437): a new section
    starts when the previous running-mean label is no longer among the
    sentence prediction's k nearest labels; each section is labeled by the
    nearest neighbour of its running mean prediction."""
    sents = list(sentences)
    if not sents:
        return []

    lm = label_matrix / np.maximum(np.linalg.norm(label_matrix, axis=1, keepdims=True), 1e-12)

    def nearest(vec: np.ndarray, kk: int) -> List[str]:
        n = float(np.linalg.norm(vec))
        v = vec / n if n > 0 else vec
        sims = lm @ v
        order = np.argsort(-sims, kind="stable")[:kk]
        return [label_names[i] for i in order]

    out: List[Dict] = []
    last_label = ""
    running = np.zeros(predictions.shape[1])
    sec_len = 0
    sec_begin = sents[0].begin
    sec_end = sents[0].end
    for t, s in enumerate(sents):
        pred = predictions[t]
        current_k = nearest(pred, k)
        if last_label not in current_k:
            if last_label:
                out.append(_section(sec_begin, sec_end, label=last_label))
            sec_begin = s.begin
            sec_len = 0
            running = np.zeros(predictions.shape[1])
        running = running + pred
        sec_len += 1
        sec_end = s.end
        last_label = nearest(running / sec_len, 1)[0]
    if last_label:
        out.append(_section(sec_begin, sec_end, label=last_label))
    return out


def emd_deviation(embeddings: np.ndarray) -> Optional[np.ndarray]:
    """EMD deviation series (detectSectionsFromEmbeddingDeviation, :487-502)."""
    if embeddings.shape[0] < 2:
        return None
    proj = pca_project(embeddings, PCA_DIMS, normalize=True)
    smooth = gaussian_smooth(proj, 2.5)
    return deviation(smooth)


def bemd_deviation(fw: np.ndarray, bw: np.ndarray) -> Optional[np.ndarray]:
    """BEMD deviation series (:507-542): PCA(16, unnormalized) per
    direction, zero the first two components, smooth sd=1.5, geometric-mean
    deviation."""
    if fw.shape[0] < 1:
        return None
    fw_p = pca_project(fw, PCA_DIMS, normalize=False)
    bw_p = pca_project(bw, PCA_DIMS, normalize=False)
    fw_p[:, : min(2, fw_p.shape[1])] = 0.0
    bw_p[:, : min(2, bw_p.shape[1])] = 0.0
    fw_s = gaussian_smooth(fw_p, 1.5)
    bw_s = gaussian_smooth(bw_p, 1.5)
    return deviation_bidirectional(fw_s, bw_s)


def directional_context(embeddings: np.ndarray, decay: float = 0.5) -> tuple:
    """Deterministic forward/backward context matrices: exponentially decayed
    running averages of the sentence embeddings from the left (fw) and right
    (bw). Stand-in for the reference's BLSTM fw/bw hidden states
    (SectorTagger.java:412-456) with the same shape contract."""
    T, D = embeddings.shape
    fw = np.zeros((T, D))
    bw = np.zeros((T, D))
    acc = np.zeros(D)
    for t in range(T):
        acc = decay * acc + (1 - decay) * embeddings[t]
        fw[t] = acc
    acc = np.zeros(D)
    for t in range(T - 1, -1, -1):
        acc = decay * acc + (1 - decay) * embeddings[t]
        bw[t] = acc
    return fw, bw
