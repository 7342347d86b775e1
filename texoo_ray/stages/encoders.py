"""Trainable lookup encoders: bag-of-words vocabulary and Bloom filter.

Mirrors BagOfWordsEncoder.java:64-118 (preprocess -> stopword filter ->
count -> truncate by min frequency) and BloomEncoder.java:29-76 /
BitArrayBloomFilter (4096 bits, 5 hashes, bitwise-OR mergeable).

Vocab building is the distributed aggregation (flat tokens -> per-batch
partial counts -> groupby(word).sum -> top-N collected to the driver and
broadcast); the built encoder is tiny and ships to actors whole.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa

from ..core.stopwords import STOPWORDS_EN

_WORD_RE = re.compile(r"\w+", re.UNICODE)

BLOOM_BITS = 4096
BLOOM_HASHES = 5


def build_vocab(
    ds,
    text_col: str = "text",
    min_freq: int = 1,
    max_size: int = 50_000,
    skip_stopwords: bool = True,
) -> List[str]:
    """Distributed vocabulary build -> ordered word list (count desc, word asc)."""
    from ray.data.aggregate import Sum

    stop = STOPWORDS_EN if skip_stopwords else frozenset()

    def partial(batch: pa.Table) -> pa.Table:
        counts: Dict[str, int] = {}
        for t in batch[text_col].to_pylist():
            for w in _WORD_RE.findall((t or "").lower()):
                if w not in stop:
                    counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "word": pa.array(list(counts.keys()), pa.string()),
                "cnt": pa.array(list(counts.values()), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    top = agg.sort(["cnt", "word"], descending=[True, False]).limit(max_size).to_pandas()
    return [w for w, c in zip(top["word"], top["cnt"]) if c >= min_freq]


def build_ngram_vocab(
    ds,
    n: int = 2,
    text_col: str = "text",
    top_k: int = 50,
):
    """Word n-gram vocabulary build (the SURVEY §2.7 n-gram vocab row,
    cf. LetterNGramEncoder's trainModel counting loop generalized to word
    n-grams): per-batch partial counts of space-joined lowercase word
    n-grams -> ``groupby(ngram).sum`` -> global top-k. The shuffle moves
    one row per distinct n-gram per block; the result is top_k rows.
    Returns Dataset[(ngram, cnt)] ordered (cnt desc, ngram asc)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .text_stats import _doc_word_codes

        empty = pa.table(
            {"ngram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
        doc_of, codes, dic = _doc_word_codes(batch[text_col], nonword="[^a-z0-9]+")
        if len(codes) < n:
            return empty
        m = len(codes) - n + 1
        valid = doc_of[:m] == doc_of[n - 1 :]
        if not valid.any():
            return empty
        # n-gram identity as a base-V positional key; needs n*log2(V)
        # bits, fine for the bigram/trigram vocab this builds (falls back
        # to direct string join per position when V^n would overflow)
        V = np.int64(len(dic))
        if n * max(1.0, np.log2(max(2, int(V)))) < 62:
            key = np.zeros(m, np.int64)
            for j in range(n):
                key = key * V + codes[j : j + m]
            u, cnt = np.unique(key[valid], return_counts=True)
            parts = []
            rest = u.copy()
            for _ in range(n):
                parts.append(rest % V)
                rest //= V
            parts.reverse()
        else:
            tr = np.stack([codes[j : j + m][valid] for j in range(n)], axis=1)
            u2, cnt = np.unique(tr, axis=0, return_counts=True)
            parts = [u2[:, j] for j in range(n)]
        cols = [dic.take(pa.array(p)) for p in parts]
        ngram = cols[0]
        for c in cols[1:]:
            ngram = pc.binary_join_element_wise(ngram, c, " ")
        return pa.table(
            {"ngram": ngram, "cnt": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return agg.sort(["cnt", "ngram"], descending=[True, False]).limit(top_k)


def doc_term_counts(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Explode documents into one row per (doc, word) with the term
    frequency. Each input row is a whole document, so per-row ``Counter``
    inside ``map_batches`` yields COMPLETE tf values with no groupby —
    the only later shuffles operate on the (much smaller) distinct-term
    rows. Returns Dataset[(id_col, word, tf:int64)]."""

    def explode(batch: pa.Table) -> pa.Table:
        from .text_stats import _doc_word_codes

        doc_of, codes, dic = _doc_word_codes(
            batch[text_col], nonword="[^a-z0-9]+"
        )
        if len(codes) == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch.schema.field(id_col).type),
                    "word": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        V = np.int64(len(dic))
        u, tf = np.unique(doc_of * V + codes, return_counts=True)
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(u // V)),
                "word": dic.take(pa.array(u % V)),
                "tf": pa.array(tf.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def tfidf_top_terms(
    ds,
    n_docs: int,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: Optional[int] = None,
):
    """Distributed TF-IDF: top-k highest-scoring terms per document.

    The reference scores retrieval baselines with Lucene's TF-IDF/BM25
    (texoo-cdv EvaluateBaselineRetrieval.java:15,45); this is the same
    statistic computed corpus-wide as a composed Ray Data pipeline:

      1. per-doc term counts (complete per batch, no shuffle);
      2. document frequency = per-batch partial row-counts per word
         -> ``groupby(word).sum`` (shuffle moves distinct words/block);
      3. tf >< df BIG-BIG hash join on word — the vocabulary of a
         100 TB corpus does not fit in a broadcast dict;
      4. score + per-doc top-k via ``grouped_topk`` (shuffle capped at
         k rows per group per block).

    Scores are stabilized to integer micros with floor(x*1e6+0.5) (DuckDB
    round semantics) and idf uses one libm ``math.log`` per distinct df
    so values hash-match the SQL oracle bit-for-bit.
    Returns Dataset[(id_col, word, tf, df, tfidf_micro)]."""
    import math

    from ray.data.aggregate import Sum

    from .dedup import _compact, _join_partitions
    from .retrieval import grouped_topk

    P = _join_partitions(cap=num_partitions or 16)
    terms = doc_term_counts(ds, id_col=id_col, text_col=text_col)

    def df_partial(batch: pa.Table) -> pa.Table:
        grp = batch.group_by(["word"]).aggregate([("word", "count")])
        return pa.table(
            {"w": grp["word"], "df": grp["word_count"].cast(pa.int64())}
        )

    df_ds = (
        terms.map_batches(df_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("df", alias_name="df"))
    )
    # _compact: Ray 2.49's hash aggregate emits SCHEMA-LESS blocks for
    # empty hash partitions; feeding one into the join's aggregator dies
    # with "No match ... for key field w" (stages/dedup.py::_compact).
    # Bounded by VOCABULARY size (distinct words), never the corpus.
    df_ds = _compact(df_ds)
    if df_ds is None:
        return terms.limit(0)

    joined = terms.join(df_ds, "inner", P, on=("word",), right_on=("w",))

    n = float(n_docs)

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "word": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "tfidf_micro": pa.array([], pa.int64()),
                }
            )
        tf = np.asarray(batch["tf"], dtype=np.float64)
        dfv = np.asarray(batch["df"], dtype=np.float64)
        uniq, inv = np.unique(dfv, return_inverse=True)
        idf = np.array([math.log(n / d) for d in uniq], dtype=np.float64)[inv]
        micro = np.floor(tf * idf * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "word": batch["word"],
                "tf": batch["tf"],
                "df": batch["df"],
                "tfidf_micro": pa.array(micro),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    return grouped_topk(
        scored,
        group_col=id_col,
        k=k,
        id_col="word",
        order_by=[("tfidf_micro", "descending"), ("word", "ascending")],
    )


def cluster_top_terms(
    docs,
    labels,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_id_col: str = "vec_id",
    label_col: str = "assigned_label",
    num_partitions: Optional[int] = None,
    local_threshold: int = 2_000_000,
):
    """c-TF-IDF cluster characterization (Grootendorst 2022, BERTopic's
    class-based TF-IDF): the top-k most DISTINCTIVE terms per document
    cluster, score(w, c) = tf(w, c) * ln(1 + A / f(w)) with tf(w, c)
    the count of w inside cluster c, f(w) the corpus count, and A the
    average word count per cluster. The corpus-understanding composition
    layer over the exact-int64 k-means family: ``labels`` is any
    Dataset[(id, label)] — in the driver query, kmeans_assign's output.

    Shape: per-doc term counts (row-local) -> ONE corpus-sized hash
    join with the label table on the doc id -> ONE (label, word)
    grouped sum; everything after — corpus word totals f(w), the A
    constant, scoring, per-label top-k — operates on the vocab x
    clusters table, never the corpus. Scores are integer micros via
    floor(x * 1e6 + 0.5) with the ln computed once per distinct
    (f, ctf) pair in the same IEEE order as the DuckDB oracle.
    Returns Dataset[(label, word, tf, ctfidf_micro)]."""
    import math

    from ray.data.aggregate import Sum

    from .dedup import _compact, _join_partitions
    from .retrieval import grouped_topk

    P = _join_partitions(cap=num_partitions or 16)
    terms = doc_term_counts(docs, id_col=id_col, text_col=text_col)
    lab = labels.select_columns([label_id_col, label_col])
    j = terms.join(lab, "inner", P, on=(id_col,), right_on=(label_id_col,))

    def ct_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "word" not in batch.column_names:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "word": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        g = batch.group_by([label_col, "word"]).aggregate([("tf", "sum")])
        return pa.table(
            {
                "label": g[label_col].cast(pa.int64()),
                "word": g["word"],
                "tf": g["tf_sum"].cast(pa.int64()),
            }
        )

    ctf = _compact(
        j.map_batches(ct_partial, batch_format="pyarrow")
        .groupby(["label", "word"])
        .aggregate(Sum("tf", alias_name="tf"))
    )
    if ctf is None:
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "word": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "ctfidf_micro": pa.array([], pa.int64()),
                }
            )
        )

    # A = total words / n clusters: two tiny driver-side aggregates over
    # the vocab x clusters table (never the corpus). The blocks are
    # already being read to the driver here, so when the (label, word)
    # domain fits under ``local_threshold`` the whole tail (corpus word
    # totals, scoring, per-label top-k) runs on the same collected
    # table with the IDENTICAL algebra — the bpe/kcore driver-local
    # precedent, removing three Ray jobs (fw groupby, ctf x fw join,
    # top-k exchange); the distributed tail below remains the
    # over-threshold branch (path-equivalence pinned in
    # tests/test_stats_ops.py).
    import ray

    tot = 0
    lbls = set()
    parts = []
    for r in ctf.to_arrow_refs():
        t = ray.get(r)
        if t.num_rows:
            tot += int(np.sum(np.asarray(t["tf"], dtype=np.int64)))
            lbls.update(np.unique(np.asarray(t["label"], np.int64)).tolist())
            parts.append(t.select(["label", "word", "tf"]))
    A = float(tot) / float(len(lbls))

    if ctf.count() <= local_threshold:
        import ray.data

        lt = pa.concat_tables(parts).combine_chunks()
        lab = np.asarray(lt["label"], dtype=np.int64)
        words = np.asarray(lt["word"].to_pylist(), dtype=object)
        tf = np.asarray(lt["tf"], dtype=np.int64)
        uw, winv = np.unique(words, return_inverse=True)
        f = np.zeros(len(uw), dtype=np.int64)
        np.add.at(f, winv, tf)
        fvals = f[winv].astype(np.float64)
        uniq, inv = np.unique(fvals, return_inverse=True)
        lg = np.array(
            [math.log(1.0 + A / x) for x in uniq], dtype=np.float64
        )[inv]
        micro = np.floor(tf.astype(np.float64) * lg * 1e6 + 0.5).astype(
            np.int64
        )
        order = np.lexsort((words, -micro, lab))
        lab, words, tf, micro = (
            lab[order],
            words[order],
            tf[order],
            micro[order],
        )
        starts = np.concatenate(
            [[0], np.flatnonzero(lab[1:] != lab[:-1]) + 1]
        )
        sizes = np.diff(np.concatenate([starts, [len(lab)]]))
        rank = np.arange(len(lab)) - np.repeat(starts, sizes)
        keep = rank < k
        return ray.data.from_arrow(
            pa.table(
                {
                    "label": pa.array(lab[keep], pa.int64()),
                    "word": pa.array(list(words[keep]), pa.string()),
                    "tf": pa.array(tf[keep], pa.int64()),
                    "ctfidf_micro": pa.array(micro[keep], pa.int64()),
                }
            )
        )

    def fw_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["word"]).aggregate([("tf", "sum")])
        return pa.table(
            {"w": g["word"], "f": g["tf_sum"].cast(pa.int64())}
        )

    fw = _compact(
        ctf.map_batches(fw_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("f", alias_name="f"))
    )

    joined = ctf.join(fw, "inner", P, on=("word",), right_on=("w",))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "word" not in batch.column_names:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "word": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "ctfidf_micro": pa.array([], pa.int64()),
                }
            )
        tf = np.asarray(batch["tf"], dtype=np.float64)
        f = np.asarray(batch["f"], dtype=np.float64)
        uniq, inv = np.unique(f, return_inverse=True)
        lg = np.array(
            [math.log(1.0 + A / x) for x in uniq], dtype=np.float64
        )[inv]
        micro = np.floor(tf * lg * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "label": batch["label"].cast(pa.int64()),
                "word": batch["word"],
                "tf": batch["tf"].cast(pa.int64()),
                "ctfidf_micro": pa.array(micro, pa.int64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    return grouped_topk(
        scored,
        group_col="label",
        k=k,
        id_col="word",
        order_by=[("ctfidf_micro", "descending"), ("word", "ascending")],
    )


class BagOfWordsEncoder:
    """vocab -> index map; encode(words) = count vector over the vocab."""

    def __init__(self, vocab: Sequence[str]):
        self.vocab = list(vocab)
        self.index = {w: i for i, w in enumerate(self.vocab)}

    def encode(self, text: str) -> np.ndarray:
        v = np.zeros(len(self.vocab), dtype=np.float32)
        for w in _WORD_RE.findall((text or "").lower()):
            i = self.index.get(w)
            if i is not None:
                v[i] += 1.0
        return v

    def is_unknown(self, word: str) -> bool:
        return word.lower() not in self.index


class OneHotEncoder:
    """Vocab-indexed 1-hot vectors (OneHotEncoder.java:19-90): tokens are
    MinimalLowercase-preprocessed; unknown words encode to all-zeros.
    ``train`` counts words across documents and keeps those meeting
    ``min_word_frequency`` in first-seen order (the reference's
    vocab.addWord insertion order, :67-82)."""

    def __init__(self, vocab: Optional[Sequence[str]] = None):
        from ..core.normalize import minimal_lowercase

        self._pre = minimal_lowercase
        self.vocab: List[str] = list(vocab) if vocab else []
        self.index = {w: i for i, w in enumerate(self.vocab)}

    @classmethod
    def train(cls, texts, min_word_frequency: int = 1) -> "OneHotEncoder":
        from ..core.normalize import minimal_lowercase
        from ..core.tokenizer import tokenize

        counts: Dict[str, int] = {}
        order: List[str] = []
        for t in texts:
            for tok in tokenize(t or ""):
                w = minimal_lowercase(tok)
                if not w:
                    continue
                if w not in counts:
                    order.append(w)
                counts[w] = counts.get(w, 0) + 1
        return cls([w for w in order if counts[w] >= min_word_frequency])

    @property
    def size(self) -> int:
        return len(self.vocab)

    def encode(self, word: str) -> np.ndarray:
        v = np.zeros(len(self.vocab), dtype=np.float32)
        i = self.index.get(self._pre(word))
        if i is not None:
            v[i] = 1.0
        return v

    def is_unknown(self, word: str) -> bool:
        return self._pre(word) not in self.index


class PositionEncoder:
    """4-dim positional flags per token — (beginDoc, beginSent, endSent,
    endDoc) — over a document's sentence/token structure
    (PositionEncoder.java:69-102): sequential by definition, so only the
    document form exists; beginDoc fires on the first token of the first
    sentence, endDoc on the last token of the last sentence."""

    size = 4

    def encode_each(self, sentences: Sequence[Sequence[str]]) -> np.ndarray:
        """(total_tokens, 4) float32 matrix for a doc given per-sentence
        token lists."""
        rows: List[List[float]] = []
        n_sents = len(sentences)
        for si, toks in enumerate(sentences):
            T = len(toks)
            for ti in range(T):
                begin_sent = ti == 0
                end_sent = ti == T - 1
                rows.append(
                    [
                        1.0 if (si == 0 and begin_sent) else 0.0,
                        1.0 if begin_sent else 0.0,
                        1.0 if end_sent else 0.0,
                        1.0 if (si == n_sents - 1 and end_sent) else 0.0,
                    ]
                )
        return (
            np.asarray(rows, dtype=np.float32)
            if rows
            else np.zeros((0, 4), np.float32)
        )


def _bloom_positions(word: str, bits: int = BLOOM_BITS, hashes: int = BLOOM_HASHES) -> List[int]:
    """k positions via double hashing (Kirsch-Mitzenmacher, the standard
    public construction used by Guava-style blooms)."""
    d = hashlib.blake2b(word.encode("utf-8"), digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return [((h1 + i * h2) % (1 << 61)) % bits for i in range(hashes)]


class BloomFilter:
    """Fixed-size bit-array Bloom filter; merge = bitwise OR."""

    def __init__(self, bits: int = BLOOM_BITS, hashes: int = BLOOM_HASHES, array: Optional[np.ndarray] = None):
        self.bits = bits
        self.hashes = hashes
        self.arr = array if array is not None else np.zeros(bits // 64, dtype=np.uint64)

    def add(self, word: str) -> None:
        for p in _bloom_positions(word, self.bits, self.hashes):
            self.arr[p >> 6] |= np.uint64(1) << np.uint64(p & 63)

    def __contains__(self, word: str) -> bool:
        one = np.uint64(1)
        for p in _bloom_positions(word, self.bits, self.hashes):
            if not (self.arr[p >> 6] >> np.uint64(p & 63)) & one:
                return False
        return True

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        return BloomFilter(self.bits, self.hashes, self.arr | other.arr)

    def to_bytes(self) -> bytes:
        return self.arr.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, bits: int = BLOOM_BITS, hashes: int = BLOOM_HASHES):
        return cls(bits, hashes, np.frombuffer(data, dtype=np.uint64).copy())

    def encode(self, text: str) -> np.ndarray:
        """Per-word membership-bit vector (BloomEncoder.encode analogue):
        OR of the k positions for each word of ``text``."""
        v = np.zeros(self.bits, dtype=np.float32)
        for w in _WORD_RE.findall((text or "").lower()):
            for p in _bloom_positions(w, self.bits, self.hashes):
                v[p] = 1.0
        return v


def build_bloom(
    ds, text_col: str = "text", bits: int = BLOOM_BITS, hashes: int = BLOOM_HASHES
) -> BloomFilter:
    """Distributed Bloom build: one partial filter per batch (bitwise-OR
    mergeable sketch), OR-merged in a tiny final step."""

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(bits, hashes)
        for t in batch[text_col].to_pylist():
            for w in _WORD_RE.findall((t or "").lower()):
                bf.add(w)
        return pa.table({"bloom": pa.array([bf.to_bytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out = BloomFilter(bits, hashes)
    for row in parts:
        out = out.merge(BloomFilter.from_bytes(row["bloom"], bits, hashes))
    return out
