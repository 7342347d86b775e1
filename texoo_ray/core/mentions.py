"""Mention (span annotation) encode/decode against tag sequences.

Mirrors MentionAnnotation.java:152-299 in
/root/reference/texoo-entity-recognition/src/main/java/de/datexis/ner/.
A mention is a dict: {begin, end, text, type, confidence, source}.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from .spans import Token, tokens_in_range, tokens_to_text
from .tags import bioes_to_bio2

GENERIC = "GENERIC"


def _make_mention(
    tokens: List[Token], mtype: str, confidence: float, source: str
) -> Dict:
    begin, end = tokens[0].begin, tokens[-1].end
    return {
        "begin": begin,
        "end": end,
        "text": tokens_to_text(tokens, begin),
        "type": mtype,
        "confidence": confidence,
        "source": source,
    }


def mentions_from_bio2(
    sentences: Sequence[Sequence[Token]],
    labels: Sequence[str],
    types: Optional[Sequence[Optional[str]]] = None,
    confidences: Optional[Sequence[float]] = None,
    default_type: str = GENERIC,
    source: str = "PRED",
) -> List[Dict]:
    """Decode BIO2 runs into mentions (MentionAnnotation.createFromBIO2Tags,
    :226-272). ``labels``/``types``/``confidences`` are flat, parallel to the
    concatenated tokens of ``sentences``. Runs close at sentence ends;
    I-after-O starts a run like B; confidence is the mean over the run's
    tokens; the run type is fixed by its first tagged token.
    """
    mentions: List[Dict] = []
    i = 0
    for sent in sentences:
        run: List[Token] = []
        conf = 0.0
        mtype = default_type
        for t in sent:
            label = labels[i]
            tconf = confidences[i] if confidences is not None else 1.0
            ttype = types[i] if types is not None else None
            i += 1
            if not run:
                if label in ("B", "I"):
                    run.append(t)
                    conf = tconf
                    if ttype:
                        mtype = ttype
            else:
                if label == "B":
                    mentions.append(_make_mention(run, mtype, conf / len(run), source))
                    run = [t]
                    conf = tconf
                    mtype = default_type
                    if ttype:
                        mtype = ttype
                elif label == "I":
                    run.append(t)
                    conf += tconf
                else:
                    mentions.append(_make_mention(run, mtype, conf / len(run), source))
                    run = []
                    conf = 0.0
                    mtype = default_type
        if run:
            mentions.append(_make_mention(run, mtype, conf / len(run), source))
    return mentions


def mentions_from_bioes(
    sentences: Sequence[Sequence[Token]],
    labels: Sequence[str],
    **kwargs,
) -> List[Dict]:
    """BIOES decode = convert to BIO2 then decode (annotateFromTags, :208-216)."""
    return mentions_from_bio2(sentences, bioes_to_bio2(list(labels)), **kwargs)


def bioes_tags_from_mentions(
    tokens: Sequence[Token], mentions: Sequence[Dict]
) -> List[str]:
    """Project mention char ranges onto tokens as BIOES labels
    (createBIOESTagsFromAnnotations, :287-299). Tokens overlapping the
    mention range participate; single-token mentions tag S."""
    labels = ["O"] * len(tokens)
    idx = {id(t): k for k, t in enumerate(tokens)}
    for ann in mentions:
        covered = tokens_in_range(list(tokens), ann["begin"], ann["end"], enclosed=False)
        if not covered:
            continue
        ks = [idx[id(t)] for t in covered]
        if len(ks) == 1:
            labels[ks[0]] = "S"
        else:
            labels[ks[0]] = "B"
            for k in ks[1:-1]:
                labels[k] = "I"
            labels[ks[-1]] = "E"
    return labels


def mention_from_positions(
    tokens: Sequence[Token],
    begin: int,
    end: int,
    mtype: str = GENERIC,
    source: str = "GOLD",
    ref_id: Optional[str] = None,
) -> Optional[Dict]:
    """Align a char range to tokens and build a mention
    (createFromPositions, :152-184). The begin token must *cover* ``begin``
    (t.begin <= begin < t.end); inside tokens start before ``end``."""
    run: List[Token] = []
    inside = False
    for t in tokens:
        if not inside and t.begin <= begin < t.end:
            inside = True
            run.append(t)
        elif inside and t.begin < end:
            run.append(t)
        elif inside:
            break
    if not run:
        return None
    m = {
        "begin": begin,
        "end": end,
        "text": tokens_to_text(run, run[0].begin),
        "type": mtype,
        "confidence": 1.0,
        "source": source,
    }
    if ref_id is not None:
        m["ref_id"] = ref_id
    return m
