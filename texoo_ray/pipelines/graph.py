"""Distributed graph analytics: exact-integer PageRank.

Complements the dedup family's min-label propagation
(stages/dedup.py::cluster_from_edges — unweighted connected components)
with WEIGHTED iterative message passing: each round, every node splits
its rank across its out-edges and the destinations sum what arrives —
the BSP shape of Pregel-style systems, expressed as one hash join plus
one grouped sum per round over Ray Datasets.

Exactness: ranks live in integer micro-units and shares use floor
division (``pr * damp_num // (damp_den * outdeg)``), so every round is
order-independent, bit-equal across block layouts and cluster sizes,
and the whole trajectory unrolls into a DuckDB CTE oracle — the same
exact-integer-iteration treatment as stages/knn.py::kmeans_iterate.

Scale shape per round: ONE hash join (edges x node-state on src; the
state table is node-sized, edges stream through it) and ONE
groupby(dst) sum whose input is pre-combined per batch (at most one row
per distinct dst per block). The driver holds nothing graph-sized;
iterations stop at a fixed count (PageRank's usual operating mode) so
lineage stays bounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pagerank(
    edges,
    iterations: int = 2,
    damp_num: int = 85,
    damp_den: int = 100,
    scale: int = 1_000_000,
    num_partitions: int | None = None,
):
    """Exact integer PageRank over a directed edge Dataset[(src, dst)]
    (int64 node ids; parallel edges count once each). Returns
    Dataset[(id, pr)] after ``iterations`` rounds, starting from
    ``pr0 = scale`` for every node appearing as a source or
    destination:

        share_i(u)  = pr_i(u) * damp_num // (damp_den * outdeg(u))
        pr_{i+1}(v) = scale * (damp_den - damp_num) // damp_den
                      + sum over in-edges (u, v) of share_i(u)

    Dangling nodes (no out-edges) keep receiving the base term and leak
    their rank, as in the plain power-iteration formulation.
    """
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import _compact, _join_partitions, _norm

    if num_partitions is None:
        # each per-round join pays fixed aggregator cost per partition:
        # size to the edge count (one count() pass, cheap next to the
        # iteration joins), capped by the cluster-sized default
        n_edges = edges.count()
        num_partitions = max(2, min(_join_partitions(), 1 + n_edges // 50_000))
    P = num_partitions
    base = scale * (damp_den - damp_num) // damp_den

    id_schema = pa.schema([("id", pa.int64())])
    deg_schema = pa.schema([("id", pa.int64()), ("outdeg", pa.int64())])
    contrib_schema = pa.schema([("id", pa.int64()), ("s", pa.int64())])
    state_schema = pa.schema(
        [("id", pa.int64()), ("pr", pa.int64()), ("outdeg", pa.int64())]
    )
    out_schema = pa.schema([("id", pa.int64()), ("pr", pa.int64())])

    @_norm(id_schema)
    def all_ids(b: pa.Table) -> pa.Table:
        src = b["src"].combine_chunks().cast(pa.int64())
        dst = b["dst"].combine_chunks().cast(pa.int64())
        ids = pc.unique(pa.concat_arrays([src, dst]))
        return pa.table({"id": ids})

    nodes = _compact(
        edges.map_batches(all_ids, batch_format="pyarrow")
        .groupby("id")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["id"])
    )
    if nodes is None:
        import ray.data

        return ray.data.from_arrow(out_schema.empty_table())

    @_norm(deg_schema)
    def deg_partial(b: pa.Table) -> pa.Table:
        src = np.asarray(b["src"], dtype=np.int64)
        u, c = np.unique(src, return_counts=True)
        return pa.table(
            {
                "id": pa.array(u, pa.int64()),
                "outdeg": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    outdeg = _compact(
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("id")
        .aggregate(Sum("outdeg", alias_name="outdeg"))
    )

    # node state (id, pr, outdeg); nodes without out-edges get outdeg 0
    state = _compact(
        nodes.join(
            outdeg, "left_outer", P, on=("id",)
        ).map_batches(
            _norm(state_schema)(
                lambda b: pa.table(
                    {
                        "id": b["id"],
                        "pr": pa.array(
                            np.full(b.num_rows, scale, np.int64), pa.int64()
                        ),
                        "outdeg": pc.fill_null(
                            pc.cast(b["outdeg"], pa.int64()), 0
                        ),
                    }
                )
            ),
            batch_format="pyarrow",
        )
    )

    for _ in range(iterations):
        joined = edges.join(state, "inner", P, on=("src",), right_on=("id",))

        @_norm(contrib_schema)
        def contrib(b: pa.Table) -> pa.Table:
            pr = np.asarray(b["pr"], dtype=np.int64)
            od = np.asarray(b["outdeg"], dtype=np.int64)
            dst = np.asarray(b["dst"], dtype=np.int64)
            share = pr * damp_num // (damp_den * np.maximum(od, 1))
            # per-batch combine: one row per distinct dst
            u, inv = np.unique(dst, return_inverse=True)
            sums = np.zeros(len(u), np.int64)
            np.add.at(sums, inv, share)
            return pa.table(
                {
                    "id": pa.array(u, pa.int64()),
                    "s": pa.array(sums, pa.int64()),
                }
            )

        sums = _compact(
            joined.map_batches(contrib, batch_format="pyarrow")
            .groupby("id")
            .aggregate(Sum("s", alias_name="s"))
        )
        nxt = state.join(
            sums, "left_outer", P, on=("id",)
        ) if sums is not None else state.map_batches(
            _norm(state_schema)(
                lambda b: pa.table(
                    {
                        "id": b["id"],
                        "pr": b["pr"],
                        "outdeg": b["outdeg"],
                        "s": pa.nulls(b.num_rows, pa.int64()),
                    }
                )
            ),
            batch_format="pyarrow",
        )

        @_norm(state_schema)
        def advance(b: pa.Table) -> pa.Table:
            s = pc.fill_null(pc.cast(b["s"], pa.int64()), 0)
            pr = pc.add(pa.scalar(base, pa.int64()), s)
            return pa.table(
                {"id": b["id"], "pr": pr, "outdeg": b["outdeg"]}
            )

        state = _compact(nxt.map_batches(advance, batch_format="pyarrow"))

    return state.map_batches(
        _norm(out_schema)(
            lambda b: pa.table({"id": b["id"], "pr": b["pr"]})
        ),
        batch_format="pyarrow",
    )
