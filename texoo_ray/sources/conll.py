"""CoNLL-2003-style reader.

Mirrors CoNLLDatasetReader.java:133-252 in
/root/reference/texoo-entity-recognition/src/main/java/de/datexis/ner/reader/:

- ``-DOCSTART-`` starts a new document
- blank lines break sentences
- column 0 is the token text; the tag column (default: last) carries
  ``B-TYPE | I-TYPE | O``
- an ``I-`` with no open run, or whose type differs from the open run, is
  coerced to ``B-`` (createTag, :211-252)
- inter-token spacing is rebuilt with the skipSpaceBefore/After rules
- GOLD mentions are decoded from the tags (annotateFromTags)

Distributed form: ``ray.data.read_binary_files(paths)`` ->
``map_batches(parse)``, one file parsed per row (files are the natural
parallel unit for line-oriented corpora).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from ..core.abbrev import SKIP_SPACE_AFTER, SKIP_SPACE_BEFORE
from ..core.mentions import mentions_from_bio2
from ..core.spans import Sentence, Token
from ..stages import schema


def _coerce_labels(raw: List[str]) -> Tuple[List[str], List[Optional[str]]]:
    """Split 'B-PER'-style tags into (label, type), coercing invalid I."""
    labels: List[str] = []
    types: List[Optional[str]] = []
    open_type: Optional[str] = None
    for tag in raw:
        if tag == "O" or not tag:
            labels.append("O")
            types.append(None)
            open_type = None
            continue
        if "-" in tag:
            label, ttype = tag.split("-", 1)
        else:
            label, ttype = tag, "GENERIC"
        if label == "I" and (open_type is None or open_type != ttype):
            label = "B"
        if label not in ("B", "I"):
            label = "B"
        labels.append(label)
        types.append(ttype)
        open_type = ttype
    return labels, types


def parse_conll(text: str, tag_col: int = -1) -> List[Dict]:
    """Parse one CoNLL file into document dicts with sentences/tokens/
    tags/mentions columns (GOLD source)."""
    docs: List[Dict] = []
    cur_sents: List[List[Tuple[str, str]]] = []  # [(token, raw_tag)]
    cur_sent: List[Tuple[str, str]] = []

    def close_sent():
        nonlocal cur_sent
        if cur_sent:
            cur_sents.append(cur_sent)
            cur_sent = []

    def close_doc():
        nonlocal cur_sents
        close_sent()
        if cur_sents:
            docs.append(_build_doc(cur_sents, tag_col))
        cur_sents = []

    for line in text.splitlines():
        stripped = line.strip()
        if stripped.startswith("-DOCSTART-"):
            close_doc()
            continue
        if not stripped:
            close_sent()
            continue
        cols = stripped.split()
        cur_sent.append((cols[0], cols[tag_col]))
    close_doc()
    return docs


def _build_doc(sent_rows: List[List[Tuple[str, str]]], tag_col: int) -> Dict:
    sentences: List[Sentence] = []
    cursor = 0
    last = ""
    flat_raw: List[str] = []
    for rows in sent_rows:
        toks: List[Token] = []
        for word, raw_tag in rows:
            begin, end = cursor, cursor + len(word)
            if last not in SKIP_SPACE_AFTER and word not in SKIP_SPACE_BEFORE:
                begin += 1
                end += 1
            cursor = end
            toks.append(Token(word, begin, end))
            flat_raw.append(raw_tag)
            last = word
        sentences.append(Sentence(toks))
    labels, types = _coerce_labels(flat_raw)
    confs = [1.0] * len(labels)
    mentions = mentions_from_bio2(
        [s.tokens for s in sentences], labels, types=types, confidences=confs, source="GOLD"
    )
    from ..core.spans import tokens_to_text

    all_tokens = [t for s in sentences for t in s.tokens]
    sents_l = [{"begin": s.begin, "end": s.end} for s in sentences]
    toks_l = [
        {"begin": t.begin, "end": t.end, "text": t.text, "sent_idx": si}
        for si, s in enumerate(sentences)
        for t in s.tokens
    ]
    tags_l = [
        {"bio2": l, "bioes": "", "type": ty or "", "confidence": 1.0}
        for l, ty in zip(labels, types)
    ]
    return {
        "text": tokens_to_text(all_tokens, 0),
        "sentences": sents_l,
        "tokens": toks_l,
        "tags": tags_l,
        "mentions": mentions,
    }


def conll_docs_to_table(docs: List[Dict]) -> pa.Table:
    return pa.table(
        {
            "text": pa.array([d["text"] for d in docs], pa.string()),
            "sentences": pa.array([d["sentences"] for d in docs], schema.SENTENCE_TYPE),
            "tokens": pa.array([d["tokens"] for d in docs], schema.TOKEN_TYPE),
            "tags": pa.array([d["tags"] for d in docs], schema.TAG_TYPE),
            "mentions": pa.array([d["mentions"] for d in docs], schema.MENTION_TYPE),
        }
    )


def read_conll(paths, tag_col: int = -1):
    """Ray reader: one parsed document per output row."""
    import ray.data

    def parse_files(batch: pa.Table) -> pa.Table:
        docs: List[Dict] = []
        for payload in batch["bytes"].to_pylist():
            docs.extend(parse_conll(payload.decode("utf-8"), tag_col))
        return conll_docs_to_table(docs)

    return ray.data.read_binary_files(paths).map_batches(
        parse_files, batch_format="pyarrow"
    )
