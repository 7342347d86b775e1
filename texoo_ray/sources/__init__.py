"""Sources: synthetic transcript generator and corpus readers.

``READERS`` is the DatasetReader plug point (the analogue of the
reference's ``DatasetReader`` interface, texoo-core/.../reader/
DatasetReader.java): name -> reader callable returning a
``ray.data.Dataset`` (or a (documents, queries) pair for QA corpora).
User extensions register with :func:`register_reader`.
"""

from __future__ import annotations

from typing import Callable, Dict

READERS: Dict[str, Callable] = {}


def register_reader(name: str, fn: Callable) -> None:
    READERS[name] = fn


def get_reader(name: str) -> Callable:
    if name not in READERS:
        raise KeyError(
            "unknown reader %r (registered: %s)" % (name, ", ".join(sorted(READERS)))
        )
    return READERS[name]


def _register_builtins() -> None:
    from .conll import read_conll
    from .entity_linking import read_wned
    from .json_docs import read_json_docs
    from .qa_corpora import read_healthqa, read_matchzoo, read_medquad
    from .raw_text import read_raw_text
    from .segmentation_corpora import (
        read_choi,
        read_multiseg,
        read_wiki727,
        read_wikicities,
    )
    from .wikisection import read_wikisection

    for name, fn in (
        ("raw_text", read_raw_text),
        ("conll", read_conll),
        ("json", read_json_docs),
        ("wikisection", read_wikisection),
        ("wiki727", read_wiki727),
        ("choi", read_choi),
        ("multiseg", read_multiseg),
        ("wikicities", read_wikicities),
        ("wned", read_wned),
        ("medquad", read_medquad),
        ("healthqa", read_healthqa),
        ("matchzoo", read_matchzoo),
    ):
        register_reader(name, fn)


_register_builtins()
