"""JSON interop: write extracted docs as JSON, read back, types restored."""


def test_json_docs_round_trip(ray_session, tmp_path):
    import ray.data

    from texoo_ray.sources.fixtures import GAZETTEER_TERMS
    from texoo_ray.sources.json_docs import read_json_docs, write_json_docs
    from texoo_ray.sources.turns import turns_table
    from texoo_ray.stages.extract import ExtractStage
    from texoo_ray.stages import schema

    tbl = turns_table(0, 8, seed=42)
    out = ExtractStage(gazetteer_terms=GAZETTEER_TERMS)(tbl)
    # JSON cannot carry timestamps natively in a round-trippable way;
    # drop ts like a debug dump would
    out = out.drop_columns(["ts"])
    ds = ray.data.from_arrow(out)
    json_dir = str(tmp_path / "docs_json")
    write_json_docs(ds, json_dir)

    back = read_json_docs(json_dir)
    refs = back.to_arrow_refs()
    import ray as _ray

    import pyarrow as pa

    blocks = [_ray.get(r) for r in refs]
    got = pa.concat_tables([b for b in blocks if b.num_rows])
    assert got.num_rows == out.num_rows
    assert got.schema.field("tokens").type == schema.TOKEN_TYPE
    assert got.schema.field("mentions").type == schema.MENTION_TYPE

    want = out.to_pylist()
    have = sorted(got.to_pylist(), key=lambda r: (r["conv_id"], r["turn_idx"]))
    want = sorted(want, key=lambda r: (r["conv_id"], r["turn_idx"]))
    for w, h in zip(want, have):
        assert w["tokens"] == h["tokens"]
        assert w["mentions"] == h["mentions"]
        assert w["sections"] == h["sections"]
        assert w["clean_text"] == h["clean_text"]
