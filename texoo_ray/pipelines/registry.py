"""Stage registry + declarative pipeline config.

The analogue of the reference's annotator XML + reflection registry
(AnnotatorFactory.java:50-59,149-230: component classes discovered by
simple name, assembled into an annotator DAG). Here: a name -> stage-class
dict and a JSON/dict pipeline spec::

    [
      {"stage": "segment", "newlines": "keep"},
      {"stage": "tag"},
      {"stage": "mention_decode"},
      {"stage": "gazetteer", "terms": [...], "concurrency": 4},
      {"stage": "sections", "method": "bemd"},
    ]

``build_pipeline(spec)`` returns ``fn(ds) -> ds`` chaining
``map_batches`` calls; per-stage keys ``concurrency``/``batch_size``
control the actor pool. User extensions register with ``register()``.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, List, Optional, Sequence, Type

from ..stages.extract import (
    ExtractStage,
    GazetteerStage,
    MentionDecodeStage,
    SectionStage,
    SegmentStage,
    TagStage,
)
from ..stages.linker import LinkerStage
from ..stages.multimodal import MediaFeatureStage

_REGISTRY: Dict[str, Type] = {}


def register(name: str, stage_cls: Type) -> None:
    _REGISTRY[name] = stage_cls


def registered() -> List[str]:
    return sorted(_REGISTRY)


for _name, _cls in [
    ("segment", SegmentStage),
    ("tag", TagStage),
    ("mention_decode", MentionDecodeStage),
    ("gazetteer", GazetteerStage),
    ("sections", SectionStage),
    ("extract", ExtractStage),
    ("link", LinkerStage),
    ("media_features", MediaFeatureStage),
]:
    register(_name, _cls)


def build_pipeline(spec: Sequence[dict] | str) -> Callable:
    """Compile a pipeline spec into ``fn(ds) -> ds``."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    stages = []
    for entry in spec:
        entry = dict(entry)
        name = entry.pop("stage")
        if name not in _REGISTRY:
            raise KeyError(
                "unknown stage %r (registered: %s)" % (name, ", ".join(registered()))
            )
        concurrency = entry.pop("concurrency", 2)
        batch_size = entry.pop("batch_size", 256)
        stages.append((_REGISTRY[name], entry, concurrency, batch_size))

    def run(ds):
        for cls, kwargs, concurrency, batch_size in stages:
            ds = ds.map_batches(
                cls,
                fn_constructor_kwargs=kwargs,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency,
            )
        return ds

    return run
