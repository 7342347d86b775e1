"""Property-based invariants (hypothesis) for the conformance core.

These encode the reference's test contracts (FIXTURES.md §2) over
arbitrary text, not just fixtures: whitespace-exact reconstruction,
offset monotonicity, tag-sequence validity, decode/encode round-trip.
"""

import re

from hypothesis import given, settings, strategies as st

from texoo_ray.core.document import Newlines, segment_text
from texoo_ray.core.mentions import bioes_tags_from_mentions, mentions_from_bioes
from texoo_ray.core.tags import bio2_to_bioes, bioes_to_bio2, is_correct_bioes
from texoo_ray.core.tagger import FeatureTagger

# text with whitespace, newlines, punctuation, unicode letters, digits
text_strategy = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Po", "Ps", "Pe", "Zs"),
        whitelist_characters="\n\t .!?()[]\"'-äöüß",
        max_codepoint=0x2FF,
    ),
    max_size=400,
)


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_reconstruction_invariant(text):
    """KEEP reconstruction == text with non-newline whitespace as spaces,
    truncated at the last token (DocumentFactoryTest round-trip)."""
    doc = segment_text(text, Newlines.KEEP)
    recon = doc.text()
    expected = re.sub(r"[^\S\n]", " ", text)
    # reconstruction pads from doc.begin (Document.getText reconstructs
    # from getBegin(), dropping leading whitespace before the first token)
    window = expected[doc.begin : doc.begin + len(recon)]
    assert window == recon
    assert expected[doc.begin + len(recon):].strip() == ""


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_offsets_monotonic_and_sliceable(text):
    doc = segment_text(text, Newlines.KEEP)
    expected = re.sub(r"[^\S\n]", " ", text)
    prev_end = 0
    for t in doc.tokens():
        assert 0 <= t.begin < t.end <= len(text)
        assert t.begin >= prev_end
        prev_end = t.end
        # token text equals the (whitespace-normalized) slice
        assert expected[t.begin : t.end] == t.text or t.text == "\n"


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_discard_drops_all_newlines(text):
    doc = segment_text(text, Newlines.DISCARD)
    assert all(t.text != "\n" for t in doc.tokens())
    assert "\n" not in doc.text()


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_tagger_emits_valid_bioes(text):
    doc = segment_text(text, Newlines.KEEP)
    tagger = FeatureTagger("en")
    labels, confs = tagger.tag_sentences(doc.sentences)
    assert len(labels) == len(confs) == doc.count_tokens()
    # validity per sentence
    i = 0
    for s in doc.sentences:
        seg = labels[i : i + len(s.tokens)]
        assert is_correct_bioes(seg), seg
        i += len(s.tokens)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(["B", "I", "O"]), max_size=30))
def test_bio2_bioes_round_trip(labels):
    valid_bio2 = all(
        not (b == "I" and (i == 0 or labels[i - 1] == "O"))
        for i, b in enumerate(labels)
    )
    bioes = bio2_to_bioes(labels)
    back = bioes_to_bio2(bioes)
    if valid_bio2:
        # valid BIO2 -> valid BIOES, exact round-trip (invalid I-after-O
        # inputs map to invalid BIOES in the reference too,
        # BIO2Tag.convertToBIOES:224-253)
        assert is_correct_bioes(bioes)
        assert back == labels


@settings(max_examples=80, deadline=None)
@given(text_strategy)
def test_mention_decode_encode_round_trip(text):
    """Tag -> mention -> tag is identity on the tagger's output."""
    doc = segment_text(text, Newlines.KEEP)
    tagger = FeatureTagger("en")
    labels, confs = tagger.tag_sentences(doc.sentences)
    sentences = [s.tokens for s in doc.sentences]
    mentions = mentions_from_bioes(sentences, labels, confidences=confs)
    for m in mentions:
        assert 0 <= m["begin"] < m["end"]
    # re-encode per sentence and compare to the BIO2 form of the labels
    flat_tokens = doc.tokens()
    back = bioes_tags_from_mentions(flat_tokens, mentions)
    assert bioes_to_bio2(back) == bioes_to_bio2(list(labels))

# word sequences like the extraction-oracle corpora: nonempty ASCII words
_word = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=12
)
_words_strategy = st.lists(_word, max_size=120).map(" ".join)


@settings(max_examples=60, deadline=None)
@given(_words_strategy)
def test_html_wrap_extract_roundtrip(text):
    """wrap -> boilerplate-strip recovers the ws-normalized source exactly
    for ANY word sequence (the html_main_content oracle contract)."""
    import pyarrow as pa

    from texoo_ray.stages.extract_html import MainContentStage, wrap_documents_html

    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": [text]})
    out = MainContentStage(include_headings=False)(wrap_documents_html(t))
    got = (out["main_text"][0].as_py() or "").replace("\n\n", " ")
    assert got == " ".join(text.split())


@settings(max_examples=60, deadline=None)
@given(_words_strategy)
def test_layout_wrap_parse_roundtrip(text):
    """two-column render -> layout parse recovers reading order exactly
    (the layout_main_content oracle contract)."""
    import pyarrow as pa

    from texoo_ray.stages.extract_html import LayoutParseStage, wrap_documents_layout

    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": [text]})
    out = LayoutParseStage()(wrap_documents_layout(t))
    got = (out["main_text"][0].as_py() or "").replace("\n\n", " ")
    assert got == " ".join(text.split())


# ---- round-4 additions ----------------------------------------------------

_float_arrays = st.lists(
    st.one_of(
        st.floats(allow_nan=False, allow_infinity=True, width=64),
        st.none(),
    ),
    min_size=0,
    max_size=60,
)
_int_arrays = st.lists(
    st.one_of(st.integers(min_value=-(2**62), max_value=2**62), st.none()),
    min_size=0,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(_float_arrays)
def test_order_key_monotone_floats(vals):
    """quantile_trim's float->uint64 key map preserves numeric order for
    every finite/infinite float (incl. -0.0 vs 0.0 ties) and masks
    nulls invalid."""
    import numpy as np
    import pyarrow as pa

    from texoo_ray.pipelines.curation import _order_key_fn

    arr = pa.array(vals, pa.float64())
    keys, valid = _order_key_fn(pa.float64())(arr)
    vs = [v for v in vals if v is not None]
    ks = keys[valid].tolist()
    assert valid.tolist() == [v is not None for v in vals]
    # key comparison == value comparison for every pair
    for i in range(len(vs)):
        for j in range(len(vs)):
            if vs[i] < vs[j]:
                assert ks[i] < ks[j]
            elif vs[i] > vs[j]:
                assert ks[i] > ks[j]
            elif vs[i] == vs[j]:
                # -0.0 == 0.0 maps to adjacent keys; any other equal
                # values map to the same key
                assert abs(ks[i] - ks[j]) <= 1


@settings(max_examples=200, deadline=None)
@given(_int_arrays)
def test_order_key_monotone_ints(vals):
    import pyarrow as pa

    from texoo_ray.pipelines.curation import _order_key_fn

    arr = pa.array(vals, pa.int64())
    keys, valid = _order_key_fn(pa.int64())(arr)
    vs = [v for v in vals if v is not None]
    ks = keys[valid].tolist()
    assert sorted(range(len(vs)), key=lambda i: vs[i]) == sorted(
        range(len(vs)), key=lambda i: ks[i]
    )


_html_fragment = st.one_of(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
            whitelist_characters=" .!?&;-",
            max_codepoint=0x2FF,
        ),
        max_size=30,
    ).map(lambda s: s.replace("<", "")),
    st.sampled_from(
        [
            "<p>", "</p>", "<div>", "</div>", "<ul>", "<li>", "</li>",
            "<h1>", "</h1>", "<nav>", "</nav>", "<a href='/x'>", "</a>",
            "<span>", "</span>", "<br/>", "<em>", "</em>",
            "<script>var a = 1 < 2;</script>",
            "<style>p { }</style>",
            "<!-- comment -->", "&amp;", "&#65;", "&lt;",
            "<title>", "</title>", "<P CLASS='u'>",
        ]
    ),
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_html_fragment, min_size=0, max_size=40))
def test_fast_scanner_equivalence_structured_soup(frags):
    """On structured markup (well-formed tags, closed comments, entities,
    script/style with closers) the compiled-regex scanner must equal the
    stdlib html.parser path block-for-block."""
    from texoo_ray.core.html_extract import parse_blocks

    html = "".join(frags)
    assert parse_blocks(html, "fast") == parse_blocks(html, "stdlib")
