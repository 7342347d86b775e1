"""Distributed == oracle equality tests for the Ray stages.

The north-rule invariant: the distributed run's per-turn extracted
text/spans equal the deterministic single-process oracle's, under stable
(conv_id, turn_idx) ordering, regardless of block boundaries.
"""

import pyarrow as pa
import pytest

from texoo_ray.core.document import Newlines, segment_text
from texoo_ray.sources.turns import TURNS_SCHEMA, turns_table
from texoo_ray.stages.extract import (
    ExtractStage,
    GazetteerStage,
    MentionDecodeStage,
    SegmentStage,
    SectionStage,
    TagStage,
)
from texoo_ray.sources.fixtures import GAZETTEER_TERMS


@pytest.fixture(scope="module")
def small_turns() -> pa.Table:
    return turns_table(0, 30, seed=42)


def sort_key(table: pa.Table) -> pa.Table:
    return table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


class TestOracleInvariants:
    def test_reconstruction_invariant(self, small_turns):
        """Every generated turn round-trips: reconstructed == clean text
        under Newlines.KEEP modulo whitespace normalization
        (DocumentFactoryTest round-trip contract)."""
        stage = SegmentStage(newlines="keep", strip=True, attach_reconstructed=True)
        out = stage(small_turns)
        import re

        for clean, recon in zip(
            out["clean_text"].to_pylist(), out["reconstructed"].to_pylist()
        ):
            expected = re.sub(r"[^\S\n]", " ", clean)
            # reconstruction stops at the last token; trailing ws trimmed
            assert expected.startswith(recon)
            assert expected[len(recon):].strip() == ""

    def test_mention_slice_invariant(self, small_turns):
        """text[m.begin:m.end] == m.text for every mention
        (Document.java:429-431)."""
        stage = ExtractStage(gazetteer_terms=GAZETTEER_TERMS)
        out = stage(small_turns)
        checked = 0
        for clean, mentions in zip(
            out["clean_text"].to_pylist(), out["mentions"].to_pylist()
        ):
            for m in mentions:
                assert clean[m["begin"] : m["end"]] == m["text"]
                checked += 1
        assert checked > 10

    def test_sections_cover_document(self, small_turns):
        stage = ExtractStage(section_method="nl")
        out = stage(small_turns)
        for toks, secs in zip(out["tokens"].to_pylist(), out["sections"].to_pylist()):
            if not toks:
                assert secs == []
                continue
            assert secs[0]["begin"] == toks[0]["begin"]
            assert secs[-1]["end"] == toks[-1]["end"]

    def test_tags_parallel_to_tokens(self, small_turns):
        seg = SegmentStage(newlines="keep")
        tag = TagStage()
        out = tag(seg(small_turns))
        for toks, tags in zip(out["tokens"].to_pylist(), out["tags"].to_pylist()):
            assert len(toks) == len(tags)

    def test_fused_equals_chained(self, small_turns):
        """ExtractStage == Segment >> Tag >> MentionDecode >> Gazetteer >>
        Section on every shared column."""
        fused = ExtractStage(gazetteer_terms=GAZETTEER_TERMS, section_method="nl")(
            small_turns
        )
        chained = small_turns
        for stage in (
            SegmentStage(newlines="keep", strip=True),
            TagStage(),
            MentionDecodeStage(),
            GazetteerStage(terms=GAZETTEER_TERMS, strategy="case_sensitive"),
            SectionStage(method="nl"),
        ):
            chained = stage(chained)
        for col in ("lang", "sentences", "tokens", "tags", "mentions", "sections"):
            assert fused[col].to_pylist() == chained[col].to_pylist(), col


class TestDistributedEqualsOracle:
    @pytest.mark.parametrize("override_blocks", [1, 7])
    def test_map_batches_partition_independence(
        self, ray_session, small_turns, override_blocks
    ):
        """Same rows in, same rows out, for any block structure."""
        import ray.data

        oracle = ExtractStage(gazetteer_terms=GAZETTEER_TERMS)(small_turns)
        ds = ray.data.from_arrow(small_turns).repartition(override_blocks)
        out = ds.map_batches(
            ExtractStage,
            fn_constructor_kwargs=dict(gazetteer_terms=GAZETTEER_TERMS),
            batch_format="pyarrow",
            batch_size=16,
            concurrency=2,
        )
        want = sort_key(oracle).to_pandas().reset_index(drop=True)
        got_df = (
            out.to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        for col in ("conv_id", "turn_idx", "lang", "n_tokens", "n_mentions", "clean_text"):
            assert got_df[col].tolist() == want[col].tolist(), col
        assert got_df["mentions"].map(len).tolist() == want["mentions"].map(len).tolist()

    def test_sorted_output_order(self, ray_session, small_turns):
        import ray.data

        from texoo_ray.pipelines.extract import extract_turns, ordered

        ds = ray.data.from_arrow(small_turns).random_shuffle(seed=1)
        out = ordered(extract_turns(ds, concurrency=2, batch_size=32))
        df = out.to_pandas()
        keys = list(zip(df["conv_id"], df["turn_idx"]))
        assert keys == sorted(keys)
