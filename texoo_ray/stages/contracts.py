"""Data-contract validation with dead-letter (quarantine) routing.

Production pipelines gate every ingest behind row-level contracts
(allowed enums, cross-column consistency, non-null/non-empty) and route
violations to a quarantine table with a machine-readable reason instead
of failing the job — the "dead letter queue" pattern. The reference
applies the same idea per document at construction time
(DocumentFactory's KEEP/DISCARD empty-token handling,
texoo-core Document assembly); this lifts it to corpus scale.

Shape: entirely row-local — ONE stateless ``map_batches`` pass per
side, zero shuffle; every rule is a vectorized predicate over the Arrow
batch and the FIRST failed rule (in declaration order) names the
quarantine reason, so routing is deterministic.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# a rule is (name, fn) where fn(batch) returns a boolean PASS array
Rule = Tuple[str, Callable[[pa.Table], np.ndarray]]


def _first_failure(batch: pa.Table, rules: Sequence[Rule]):
    """(fail_mask, reason_codes) — reason is the index of the FIRST
    failed rule per row (-1 when all pass)."""
    n = batch.num_rows
    reason = np.full(n, -1, np.int64)
    for i, (_, fn) in enumerate(rules):
        ok = np.asarray(fn(batch), dtype=bool)
        hit = (~ok) & (reason == -1)
        reason[hit] = i
    return reason >= 0, reason


def quarantine(ds, rules: List[Rule], keep_cols: Sequence[str] = ("doc_id",)):
    """Dataset[keep_cols + (reason,)] — the rows violating any contract
    rule, labeled with the first failed rule's name."""
    names = np.asarray([n for n, _ in rules], dtype=object)

    def bad(batch: pa.Table) -> pa.Table:
        fail, reason = _first_failure(batch, rules)
        mask = pa.array(fail)
        cols = {c: batch[c].filter(mask) for c in keep_cols}
        cols["reason"] = pa.array(names[reason[fail]], pa.string())
        return pa.table(cols)

    return ds.map_batches(bad, batch_format="pyarrow")


def enforce(ds, rules: List[Rule]):
    """The surviving side: rows passing EVERY contract rule, original
    columns untouched."""

    def ok(batch: pa.Table) -> pa.Table:
        fail, _ = _first_failure(batch, rules)
        return batch.filter(pa.array(~fail))

    return ds.map_batches(ok, batch_format="pyarrow")


def lang_allowed(col: str, allowed: Sequence[str]) -> Rule:
    allowed_arr = pa.array(sorted(allowed), pa.string())

    def fn(batch: pa.Table) -> np.ndarray:
        return np.asarray(pc.is_in(batch[col], value_set=allowed_arr), bool)

    return (f"{col}_allowed", fn)


def length_consistent(len_col: str, text_col: str) -> Rule:
    """Cross-column consistency: declared length equals the text's
    code-point count."""

    def fn(batch: pa.Table) -> np.ndarray:
        actual = pc.utf8_length(pc.fill_null(batch[text_col], ""))
        return np.asarray(
            pc.equal(pc.cast(batch[len_col], pa.int64()),
                     pc.cast(actual, pa.int64())),
            bool,
        )

    return (f"{len_col}_consistent", fn)


def text_nonempty(text_col: str) -> Rule:
    def fn(batch: pa.Table) -> np.ndarray:
        return np.asarray(
            pc.greater(pc.utf8_length(pc.fill_null(batch[text_col], "")), 0),
            bool,
        )

    return (f"{text_col}_nonempty", fn)
