"""JSON document reader/writer.

The reference serializes Documents to JSON with Jackson
(ObjectSerializer.java:42-92, streaming iterator :80-82) — per-document
objects with sentences/tokens/annotations. Our canonical interchange is
Parquet; JSON is the debug/interop format:

- ``write_json_docs``: ``ds.write_json`` (one JSON object per row; nested
  span columns serialize as nested JSON, mirroring the reference layout)
- ``read_json_docs``: ``ray.data.read_json`` with schema coercion of the
  nested span columns back to the canonical Arrow types
"""

from __future__ import annotations

import pyarrow as pa

from ..stages import schema

_NESTED = {
    "sentences": schema.SENTENCE_TYPE,
    "tokens": schema.TOKEN_TYPE,
    "tags": schema.TAG_TYPE,
    "mentions": schema.MENTION_TYPE,
    "sections": schema.SECTION_TYPE,
}


def write_json_docs(ds, out_dir: str):
    ds.write_json(out_dir)


def read_json_docs(paths):
    import ray.data

    ds = ray.data.read_json(paths)

    def coerce(batch: pa.Table) -> pa.Table:
        for name, typ in _NESTED.items():
            if name in batch.column_names:
                idx = batch.column_names.index(name)
                col = batch[name]
                if col.type != typ:
                    batch = batch.set_column(
                        idx, name, pa.array(col.to_pylist(), typ)
                    )
        return batch

    return ds.map_batches(coerce, batch_format="pyarrow")
