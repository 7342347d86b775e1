"""Arrow schema for derived columns + converters to/from core span objects.

The reference's object hierarchy (Document -> Sentence -> Token ->
Tag/Annotation, SURVEY.md §1.2) flattens to nested Arrow list columns on
the turn row; these helpers build/read them without pandas round-trips.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import pyarrow as pa

from ..core.document import Document
from ..core.spans import Sentence, Token

SENTENCE_TYPE = pa.list_(
    pa.struct([("begin", pa.int32()), ("end", pa.int32())])
)
TOKEN_TYPE = pa.list_(
    pa.struct(
        [
            ("begin", pa.int32()),
            ("end", pa.int32()),
            ("text", pa.string()),
            ("sent_idx", pa.int32()),
        ]
    )
)
TAG_TYPE = pa.list_(
    pa.struct(
        [
            ("bio2", pa.string()),
            ("bioes", pa.string()),
            ("type", pa.string()),
            ("confidence", pa.float64()),
        ]
    )
)
MENTION_TYPE = pa.list_(
    pa.struct(
        [
            ("begin", pa.int32()),
            ("end", pa.int32()),
            ("text", pa.string()),
            ("type", pa.string()),
            ("confidence", pa.float64()),
            ("source", pa.string()),
        ]
    )
)
SECTION_TYPE = pa.list_(
    pa.struct(
        [
            ("begin", pa.int32()),
            ("end", pa.int32()),
            ("label", pa.string()),
            ("heading", pa.string()),
            ("confidence", pa.float64()),
        ]
    )
)


def doc_to_row_lists(doc: Document) -> Tuple[List[dict], List[dict]]:
    """Document -> (sentences list, tokens list) of plain dicts."""
    sents = [{"begin": s.begin, "end": s.end} for s in doc.sentences]
    toks = [
        {"begin": t.begin, "end": t.end, "text": t.text, "sent_idx": si}
        for si, s in enumerate(doc.sentences)
        for t in s.tokens
    ]
    return sents, toks


def row_to_doc(tokens: Sequence[dict]) -> Document:
    """Rebuild a Document from a row's token dicts (sent_idx grouping)."""
    doc = Document()
    cur_idx = -1
    for t in tokens or []:
        if t["sent_idx"] != cur_idx:
            doc.sentences.append(Sentence([]))
            cur_idx = t["sent_idx"]
        doc.sentences[-1].tokens.append(Token(t["text"], t["begin"], t["end"]))
    return doc


def column(values: List[list], dtype: pa.DataType) -> pa.Array:
    return pa.array(values, type=dtype)
