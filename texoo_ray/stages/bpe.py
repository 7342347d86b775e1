"""Distributed BPE merge learning + application (tokenizer training).

Semantics are the public byte-pair-encoding algorithm for subword
tokenization (Sennrich, Haddow & Birch, ACL 2016, "Neural Machine
Translation of Rare Words with Subword Units"): start from words split
into characters, repeatedly pick the most frequent adjacent symbol pair
(count weighted by word frequency) and merge it everywhere, greedily
left-to-right within each word. The reference ties in as the
train-once / apply-everywhere corpus-statistic shape of its encoder
family (LookupCacheEncoder.java:1-181, BagOfWordsEncoder.java:64-118
``trainModel`` -> ``encode``); BPE learning is the same shape one level
down, over subword units instead of words.

Scale shape (100 TB safe):

1. ONE corpus pass builds the word-frequency table (per-batch
   dictionary-encoded partials -> ``groupby(word).sum``). This is the
   only corpus-sized exchange; everything after runs on the
   vocabulary-sized word table — corpus-size independent, the standard
   BPE trick (learning cost depends on |vocab|, not |corpus|).
2. Each merge round = one vectorized map over the word table (adjacent
   pair partials weighted by word freq), one pair-vocabulary-sized
   groupby, a single-row driver pick, and one vectorized literal
   replace over the word table. No Python loops over rows, characters,
   or pairs anywhere; the word table is re-materialized per round to
   keep lineage flat (vocabulary-sized, never the corpus).

Symbol sequences are strings with every symbol wrapped in US (chr 31):
``'abc' -> '\\x1fa\\x1f\\x1fb\\x1f\\x1fc\\x1f'``. Merging pair (a, b)
is then the literal replace ``'\\x1fa\\x1f\\x1fb\\x1f' ->
'\\x1fab\\x1f'`` — and leftmost non-overlapping replacement (Arrow
``replace_substring`` == DuckDB ``replace`` == Python ``str.replace``)
IS the greedy left-to-right BPE merge, because adjacent matches share
no bytes under the double-separator wrapping ('a a a a' merges to
'aa aa', not 'aa a a'). chr(31) cannot appear inside a symbol: words
are RE2 ASCII ``\\w+`` runs. The US byte (0x1f) also sorts below every
word byte, so the joined pair key ``l + US + r`` orders exactly like
the (l, r) tuple — the deterministic tie-break (max count, then
lexicographically smallest pair) is engine/SQL identical.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_US = "\x1f"
_SEP2 = _US + _US

_MERGE_SCHEMA = pa.schema(
    [
        ("merge_idx", pa.int64()),
        ("lhs", pa.string()),
        ("rhs", pa.string()),
        ("freq", pa.int64()),
    ]
)


def _wrap(words):
    """Wrap every character of each word in US separators (vectorized)."""
    return pc.replace_substring_regex(words, "(.)", _US + r"\1" + _US)


def _symbols(seq):
    """ListArray of symbols per wrapped sequence."""
    lst = pc.split_pattern(pc.utf8_trim(seq, _US), pattern=_SEP2)
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    return lst


def word_freq_table(ds, text_col: str = "text"):
    """Dataset[(word, freq)] over RE2 ASCII ``\\w+`` words of the
    lowercased corpus — the one corpus-sized pass of BPE learning."""
    from ray.data.aggregate import Sum

    from .text_stats import _doc_word_codes

    def partial(batch: pa.Table) -> pa.Table:
        _, codes, dic = _doc_word_codes(batch[text_col])
        return pa.table(
            {
                "word": dic,
                "freq": pa.array(
                    np.bincount(codes, minlength=len(dic)), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
    )


def _pair_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (pair, cnt) partials: adjacent symbol pairs of each
    word, weighted by the word's corpus frequency."""
    empty = pa.table(
        {"pair": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
    )
    if batch.num_rows == 0:
        return empty
    freq = np.asarray(batch["freq"], dtype=np.int64)
    lst = _symbols(batch["seq"])
    flat = lst.flatten()
    if len(flat) < 2:
        return empty
    off = np.asarray(lst.offsets, dtype=np.int64)
    valid = np.ones(len(flat) - 1, dtype=bool)
    inner = off[1:-1]
    valid[inner[inner > 0] - 1] = False  # pairs crossing word boundaries
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return empty
    take = pa.array(idx, pa.int64())
    left = flat.take(take)
    right = flat.take(pa.array(idx + 1, pa.int64()))
    key = pc.binary_join_element_wise(left, right, _US)
    row_of = np.searchsorted(off, idx, side="right") - 1
    w = freq[row_of]
    dk = key.dictionary_encode()
    codes = np.asarray(dk.indices, dtype=np.int64)
    cnt = np.zeros(len(dk.dictionary), dtype=np.int64)
    np.add.at(cnt, codes, w)
    return pa.table({"pair": dk.dictionary, "cnt": pa.array(cnt, pa.int64())})


def _merge_table(merges) -> pa.Table:
    if not merges:
        return _MERGE_SCHEMA.empty_table()
    idxs, ls, rs, fs = zip(*merges)
    return pa.table(
        {
            "merge_idx": pa.array(idxs, pa.int64()),
            "lhs": pa.array(ls, pa.string()),
            "rhs": pa.array(rs, pa.string()),
            "freq": pa.array(fs, pa.int64()),
        }
    )


def _bpe_learn_local(seq: pa.Array, freq: pa.Array, n_merges: int):
    """The merge loop on a driver-resident word table — the SAME
    primitives (:func:`_pair_partial`, literal replace) on one local
    batch, so the trajectory is identical to the distributed loop."""
    merges: List[Tuple[int, str, str, int]] = []
    for r in range(n_merges):
        part = _pair_partial(pa.table({"seq": seq, "freq": freq}))
        if part.num_rows == 0:
            break
        rows = sorted(
            zip(part["pair"].to_pylist(), part["cnt"].to_pylist()),
            key=lambda kv: (-kv[1], kv[0]),
        )
        pair, cnt = rows[0]
        lhs, rhs = pair.split(_US)
        merges.append((r + 1, lhs, rhs, int(cnt)))
        seq = pc.replace_substring(
            seq, _US + lhs + _US + _US + rhs + _US, _US + lhs + rhs + _US
        )
    return merges


def bpe_learn(
    ds,
    text_col: str = "text",
    n_merges: int = 8,
    materialize_every: int = 16,
    driver_vocab_threshold: int = 200_000,
) -> pa.Table:
    """Learn ``n_merges`` BPE merges over the corpus; returns a driver
    table (merge_idx, lhs, rhs, freq) — n_merges rows (fewer iff the
    vocabulary runs out of adjacent pairs first).

    The corpus-sized work is always the ONE distributed word-frequency
    pass. The merge loop then runs in one of two places with an
    identical trajectory (pinned by tests):

    - vocabulary <= ``driver_vocab_threshold``: collected to the driver
      and looped locally — what every standard BPE trainer does after
      the counting pass, and at bench scale it removes n_merges
      sequential Ray jobs of pure launch overhead;
    - larger vocabularies: the distributed loop. Round structure: pair
      partials (vectorized word-table map) -> pair-vocabulary groupby ->
      1-row deterministic pick -> literal replace, with round r's
      replace FUSED into round r+1's counting map (one Ray job per
      round) and ``materialize_every`` bounding the re-applied chain at
      O(R * materialize_every * vocab) total replace work.
    """
    from ray.data.aggregate import Sum

    wt = word_freq_table(ds, text_col)

    def to_seq(batch: pa.Table) -> pa.Table:
        return pa.table({"seq": _wrap(batch["word"]), "freq": batch["freq"]})

    base = wt.map_batches(to_seq, batch_format="pyarrow").materialize()

    if base.count() <= driver_vocab_threshold:
        local = pa.Table.from_pylist(base.take_all())
        if local.num_rows == 0:
            return _MERGE_SCHEMA.empty_table()
        merges = _bpe_learn_local(
            local["seq"].combine_chunks(),
            local["freq"].combine_chunks(),
            n_merges,
        )
        return _merge_table(merges)

    def apply_pending(seq, pending):
        for l, rr in pending:
            seq = pc.replace_substring(
                seq, _US + l + _US + _US + rr + _US, _US + l + rr + _US
            )
        return seq

    def make_partial(pending):
        def fn(batch: pa.Table) -> pa.Table:
            return _pair_partial(
                pa.table(
                    {
                        "seq": apply_pending(batch["seq"], pending),
                        "freq": batch["freq"],
                    }
                )
            )

        return fn

    def make_apply(pending):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "seq": apply_pending(batch["seq"], pending),
                    "freq": batch["freq"],
                }
            )

        return fn

    merges: List[Tuple[int, str, str, int]] = []
    pending: List[Tuple[str, str]] = []
    for r in range(n_merges):
        if len(pending) >= materialize_every:
            base = base.map_batches(
                make_apply(tuple(pending)), batch_format="pyarrow"
            ).materialize()
            pending = []
        best = (
            base.map_batches(make_partial(tuple(pending)), batch_format="pyarrow")
            .groupby("pair")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .sort(["cnt", "pair"], descending=[True, False])
            .limit(1)
            .take_all()
        )
        if not best:
            break
        lhs, rhs = best[0]["pair"].split(_US)
        merges.append((r + 1, lhs, rhs, int(best[0]["cnt"])))
        pending.append((lhs, rhs))

    return _merge_table(merges)


def bpe_token_count(
    ds,
    merges: Optional[Sequence[Tuple[str, str]]] = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 8,
):
    """Apply a learned merge list per document and count the resulting
    BPE tokens: Dataset[(id_col, n_words, n_bpe_tokens)], one row per
    input document (0/0 for wordless documents).

    When ``merges`` is None they are learned from ``ds`` first
    (``bpe_learn``). Application is fully vectorized and runs on each
    batch's DISTINCT words only: wrap the word dictionary, apply the K
    merges as K literal replaces, count symbols per distinct word
    (``count_substring(SEP2) + 1``), then gather per document through
    the dictionary codes — a document never re-tokenizes a repeated
    word. Zero shuffle; the merge list is closure-broadcast (KB-sized).
    """
    from .text_stats import _doc_word_codes

    if merges is None:
        mt = bpe_learn(ds, text_col=text_col, n_merges=n_merges)
        merges = list(zip(mt["lhs"].to_pylist(), mt["rhs"].to_pylist()))
    merges = [(str(l), str(r)) for l, r in merges]

    def count(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        doc_of, codes, dic = _doc_word_codes(batch[text_col])
        n = batch.num_rows
        if len(dic) == 0:
            zero = pa.array(np.zeros(n, dtype=np.int64), pa.int64())
            return pa.table(
                {id_col: ids, "n_words": zero, "n_bpe_tokens": zero}
            )
        seq = _wrap(dic)
        for l, r in merges:
            seq = pc.replace_substring(
                seq, _US + l + _US + _US + r + _US, _US + l + r + _US
            )
        per_word = (
            np.asarray(pc.count_substring(seq, _SEP2), dtype=np.int64) + 1
        )
        n_words = np.bincount(doc_of, minlength=n).astype(np.int64)
        n_tok = np.zeros(n, dtype=np.int64)
        np.add.at(n_tok, doc_of, per_word[codes])
        return pa.table(
            {
                id_col: ids,
                "n_words": pa.array(n_words, pa.int64()),
                "n_bpe_tokens": pa.array(n_tok, pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow")
