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
from ..stages.extract_html import LayoutParseStage, MainContentStage
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
    ("main_content", MainContentStage),
    ("layout_parse", LayoutParseStage),
]:
    register(_name, _cls)


# kwargs holding component resources get externalized into their own
# artifact file on save (the analogue of each AnnotatorComponent saving
# its model binary next to the annotator XML, Annotator.java:143-148)
_ARTIFACT_KEYS = ("terms", "kb_entries", "vectors", "queries")


def save_pipeline(spec: Sequence[dict] | str, path: str, name: str = "annotator") -> str:
    """Write a reloadable pipeline bundle — the Annotator.writeModel
    analogue (Annotator.java:121-148 + AnnotatorFactory.writeXML:67):
    ``<path>/<name>.json`` holds the stage DAG; large component
    resources (gazetteer terms, KB entries, ...) are saved as one
    artifact file per stage and referenced by relative path, so the
    bundle directory is self-contained and diffable. Returns the spec
    file path."""
    import os

    if isinstance(spec, str):
        spec = json.loads(spec)
    os.makedirs(path, exist_ok=True)
    out_spec: List[dict] = []
    for i, entry in enumerate(spec):
        entry = dict(entry)
        stage = entry.get("stage", "stage")
        for key in _ARTIFACT_KEYS:
            if key in entry and not isinstance(entry[key], str):
                art = "%02d_%s_%s.json" % (i, stage, key)
                with open(os.path.join(path, art), "w") as f:
                    json.dump(entry[key], f)
                entry[key] = {"$file": art}
        out_spec.append(entry)
    spec_file = os.path.join(path, "%s.json" % name)
    with open(spec_file, "w") as f:
        json.dump({"texoo_ray_pipeline": 1, "stages": out_spec}, f, indent=2)
    return spec_file


def load_pipeline(path: str, name: Optional[str] = None) -> Callable:
    """Reconstruct a pipeline fn from a ``save_pipeline`` bundle — the
    AnnotatorFactory.loadAnnotator analogue (:149-230, incl. findXML's
    scan for the spec file when ``name`` is omitted). Artifact
    references are re-inlined; tuples in JSON arrive as lists, which the
    stages accept."""
    import os

    if name is None:
        cands = sorted(
            f
            for f in os.listdir(path)
            if f.endswith(".json") and _is_spec(os.path.join(path, f))
        )
        if not cands:
            raise FileNotFoundError("no pipeline spec json under %r" % path)
        name = cands[0][: -len(".json")]
    with open(os.path.join(path, "%s.json" % name)) as f:
        bundle = json.load(f)
    spec = []
    for entry in bundle["stages"]:
        entry = dict(entry)
        for key, val in list(entry.items()):
            if isinstance(val, dict) and "$file" in val:
                with open(os.path.join(path, val["$file"])) as f:
                    loaded = json.load(f)
                if isinstance(loaded, list):
                    # JSON lowers (term, label) tuples to lists
                    loaded = [tuple(x) if isinstance(x, list) else x for x in loaded]
                entry[key] = loaded
        spec.append(entry)
    return build_pipeline(spec)


def _is_spec(file_path: str) -> bool:
    try:
        with open(file_path) as f:
            head = f.read(4096)
        return '"texoo_ray_pipeline"' in head
    except OSError:
        return False


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
