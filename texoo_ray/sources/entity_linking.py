"""WNED entity-linking corpus reader (ACE2004, AIDA-CoNLL, AQUAINT,
ClueWeb12, MSNBC, Wikipedia subsets).

Mirrors WNEDDataset.java (texoo-entity-linking/.../nel/reader/
WNEDDataset.java): an XML file lists ``<document docName="...">`` blocks
whose ``<annotation>`` children carry ``<mention>``, ``<wikiName>``,
``<offset>``, ``<length>``; raw document text lives in files next to the
XML. Reference behaviors preserved:

- double newlines collapse to " \\n" before segmentation
  (WNEDDataset.java:141 ``txt.replaceAll("\\n\\n", " \\n")``),
- a length that disagrees with the mention text is repaired to the text
  length (:178-183),
- annotations become GOLD with confidence 1.0; ``wikiName`` "NIL" keeps
  ref_id NIL (no KB resolution in-sandbox; :78-86 is the optional
  Wikidata remap step).

Ray mapping: the XML (small) parses on the driver; the per-document
annotation lists broadcast to the binary-file read of the raw texts — a
broadcast-small-side attach, no shuffle.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Dict, List, Tuple

import pyarrow as pa

ENTITY_ANN_TYPE = pa.list_(
    pa.struct(
        [
            ("begin", pa.int32()),
            ("end", pa.int32()),
            ("text", pa.string()),
            ("ref_id", pa.string()),
            ("source", pa.string()),
            ("confidence", pa.float64()),
        ]
    )
)


def parse_wned_xml(xml_text: str) -> Dict[str, List[Dict]]:
    """docName -> list of gold entity annotations."""
    root = ET.fromstring(xml_text)
    out: Dict[str, List[Dict]] = {}
    for doc in root.iter("document"):
        name = doc.get("docName") or ""
        anns: List[Dict] = []
        for item in doc.iter("annotation"):
            mention = (item.findtext("mention") or "")
            wiki = item.findtext("wikiName")
            offset = int(item.findtext("offset") or 0)
            length = int(item.findtext("length") or 0)
            if length != len(mention):
                # WNEDDataset.java:178-183: repair to the mention length
                length = len(mention)
            anns.append(
                {
                    "begin": offset,
                    "end": offset + length,
                    "text": mention,
                    "ref_id": (wiki or "").strip() or "NIL",
                    "source": "GOLD",
                    "confidence": 1.0,
                }
            )
        out[name] = anns
    return out


def normalize_wned_text(txt: str) -> str:
    """WNEDDataset.java:141: documents use two newlines between sentences;
    collapse to ' \\n' so offsets line up with the reference's parse."""
    return txt.replace("\n\n", " \n")


def read_wned(xml_path: str, raw_text_dir: str):
    """Ray reader: Dataset[(doc_id, text, gold_entities)].

    The annotation map ships once per task via closure capture of the
    (small) parsed XML — the raw text files stream through
    read_binary_files."""
    import ray.data

    with open(xml_path, encoding="utf-8") as f:
        ann_map = parse_wned_xml(f.read())
    paths = [
        os.path.join(raw_text_dir, name)
        for name in sorted(ann_map)
        if os.path.exists(os.path.join(raw_text_dir, name))
    ]

    def parse(batch: pa.Table) -> pa.Table:
        ids: List[str] = []
        texts: List[str] = []
        anns: List[List[Dict]] = []
        for path, payload in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            name = os.path.basename(path)
            ids.append(name)
            texts.append(normalize_wned_text(payload.decode("utf-8", errors="replace")))
            anns.append(ann_map.get(name, []))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "text": pa.array(texts, pa.string()),
                "gold_entities": pa.array(anns, ENTITY_ANN_TYPE),
            }
        )

    return ray.data.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="pyarrow"
    )
