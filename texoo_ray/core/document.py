"""Document assembly: text → sentences → tokens, with newline policy.

Mirrors the reference's DocumentFactory.addToDocumentFromText
(/root/reference/texoo-core/src/main/java/de/datexis/preprocess/
DocumentFactory.java:219-267):

- sentence spans from the splitter, each tokenized independently
- ``Newlines.KEEP``: ``\\n`` tokens are kept, offsets are original
- ``Newlines.DISCARD``: ``\\n`` tokens are dropped; the FIRST newline of a
  run keeps its character slot (becomes padding space), every further
  newline in the run compacts offsets by one (``nlOffset``); the
  newline-run counter persists across sentence boundaries
- reconstruction (``tokens_to_text``) then reproduces the input text with
  every non-``\\n`` whitespace char rendered as a space and trailing
  whitespace dropped (pinned by DocumentFactoryTest.java:48,56,66 and
  DocumentModelTest.java:67-93)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional

from .sentences import sentence_spans
from .spans import Sentence, Token, tokens_to_text
from .tokenizer import _tokenize_spans_cached


class Newlines(Enum):
    KEEP = "keep"
    DISCARD = "discard"


@dataclass
class Document:
    """In-memory document for the single-process oracle and unit tests.

    The distributed engine stores the same data as Arrow list columns on
    the turn row (SURVEY.md §1.2); this object is the row-local view.
    """

    sentences: List[Sentence] = field(default_factory=list)
    language: str = ""

    @property
    def begin(self) -> int:
        return self.sentences[0].begin if self.sentences else 0

    @property
    def end(self) -> int:
        return self.sentences[-1].end if self.sentences else 0

    def tokens(self) -> List[Token]:
        return [t for s in self.sentences for t in s.tokens]

    def text(self) -> str:
        return tokens_to_text(self.tokens(), self.begin)

    def count_sentences(self) -> int:
        return len(self.sentences)

    def count_tokens(self) -> int:
        return sum(len(s.tokens) for s in self.sentences)


def segment_text(text: str, newlines: Newlines = Newlines.DISCARD) -> Document:
    """Split ``text`` into sentences and tokens under the newline policy."""
    doc = Document()
    count_newlines = 0
    nl_offset = 0  # chars compacted away so far (DISCARD only)
    for s_begin, s_end in sentence_spans(text):
        sentence_text = text[s_begin:s_end]
        spans = _tokenize_spans_cached(sentence_text)
        if "\n" not in sentence_text:
            # fast path: no newline bookkeeping; offsets shift by a const
            off = s_begin - nl_offset
            token_list = [
                Token(sentence_text[b:e], off + b, off + e) for b, e in spans
            ]
            if token_list:
                count_newlines = 0
                doc.sentences.append(Sentence(token_list))
            continue
        token_list: List[Token] = []
        for t_begin, t_end in spans:
            token_text = sentence_text[t_begin:t_end]
            if token_text == "\n":
                count_newlines += 1
                if newlines is Newlines.KEEP:
                    token_list.append(
                        Token(token_text, s_begin + t_begin - nl_offset, s_begin + t_end - nl_offset)
                    )
                elif count_newlines > 1:
                    nl_offset += 1
            else:
                token_list.append(
                    Token(token_text, s_begin + t_begin - nl_offset, s_begin + t_end - nl_offset)
                )
                count_newlines = 0
        if token_list:
            doc.sentences.append(Sentence(token_list))
    return doc
