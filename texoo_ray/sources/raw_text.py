"""Raw-text directory reader.

Mirrors DirectoryDatasetReader + RawTextDatasetReader
(/root/reference/texoo-core/src/main/java/de/datexis/reader/
DirectoryDatasetReader.java:52-124, RawTextDatasetReader.java:56-76):
sorted directory walk, filename regex filter, optional limit; per file:
UTF-8 decode, lines joined with ``\\n``, one Document per file with
``id = filename``, ``source = path``, optional first-line-as-title.

Ray mapping: file discovery on the driver (cheap metadata), then
``read_binary_files`` + ``map_batches`` parse — file parallelism is
handled by Ray Data (the reference used a fork-join parallel stream).
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import pyarrow as pa


def list_files(
    root: str, pattern: Optional[str] = None, limit: Optional[int] = None
) -> List[str]:
    """Sorted recursive file list with filename regex filter + limit."""
    out: List[str] = []
    rx = re.compile(pattern) if pattern else None
    for dirpath, _dirnames, filenames in sorted(os.walk(root)):
        for fn in sorted(filenames):
            if rx is None or rx.fullmatch(fn):
                out.append(os.path.join(dirpath, fn))
    out.sort()
    if limit is not None:
        out = out[:limit]
    return out


def read_raw_text(
    root_or_files,
    pattern: Optional[str] = None,
    limit: Optional[int] = None,
    use_first_line_as_title: bool = False,
):
    """Dataset[(doc_id, source, title, text)] — one row per file; empty
    files skipped (DirectoryDatasetReader.java:98)."""
    import ray.data

    if isinstance(root_or_files, str):
        files = list_files(root_or_files, pattern, limit)
    else:
        files = sorted(root_or_files)[: limit or None]

    def parse(batch: pa.Table) -> pa.Table:
        ids, sources, titles, texts = [], [], [], []
        for path, payload in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            text = "\n".join(payload.decode("utf-8", errors="replace").splitlines())
            if not text.strip():
                continue
            title = ""
            if use_first_line_as_title:
                nl = text.find("\n")
                if nl >= 0:
                    title, text = text[:nl], text[nl + 1 :]
                else:
                    title, text = text, ""
            ids.append(os.path.basename(path))
            sources.append(path)
            titles.append(title)
            texts.append(text)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "source": pa.array(sources, pa.string()),
                "title": pa.array(titles, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ray.data.read_binary_files(files, include_paths=True).map_batches(
        parse, batch_format="pyarrow"
    )
