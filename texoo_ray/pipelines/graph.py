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
    broadcast_threshold: int = 2_000_000,
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

    Two executions of the identical integer algebra (path-equivalence
    pinned in tests/test_ops.py):

    - node table <= ``broadcast_threshold``: BROADCAST-STATE rounds
      (the dedup_bloom / dsir precedent) — the (id, pr, outdeg) state
      ships via ``ray.put`` as sorted int64 arrays, each round is ONE
      map over the materialized edge set (searchsorted lookup +
      per-batch dst pre-combine) + one node-domain ``bucket_sum``, and
      the advance is a driver-side array update. Measured 37 s -> ~6 s
      at sf0.1/32 cpus: the per-round hash joins were paying aggregator
      pool startup 3x per round and re-executing the lazy edge lineage.
    - larger node tables: the original per-round edges x state hash
      join + grouped-sum rounds (the Pregel BSP shape) — state never
      touches the driver.
    """
    from ray.data.aggregate import Count, Sum

    from ..stages.combine import bucket_sum
    from ..stages.dedup import _compact, _join_partitions, _norm

    if num_partitions is None:
        # each per-round join pays fixed aggregator cost per partition:
        # size to the edge count (one count() pass, cheap next to the
        # iteration joins), capped by the cluster-sized default
        n_edges = edges.count()
        num_partitions = max(2, min(_join_partitions(), 1 + n_edges // 50_000))
    P = num_partitions
    base = scale * (damp_den - damp_num) // damp_den

    # ---- broadcast-state fast path --------------------------------------
    def _deg_all(b: pa.Table) -> pa.Table:
        src = np.asarray(b["src"], dtype=np.int64)
        dst = np.asarray(b["dst"], dtype=np.int64)
        u, c = np.unique(src, return_counts=True)
        ud = np.unique(dst)
        return pa.table(
            {
                "id": pa.array(np.concatenate([u, ud]), pa.int64()),
                "outdeg": pa.array(
                    np.concatenate(
                        [c.astype(np.int64), np.zeros(len(ud), np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    if broadcast_threshold:
        import ray

        edges_mat = edges.materialize()
        node_tbl = bucket_sum(
            edges_mat.map_batches(_deg_all, batch_format="pyarrow"),
            ["id"],
            "outdeg",
        ).to_pandas()
        if len(node_tbl) == 0:
            import ray.data

            return ray.data.from_arrow(
                pa.schema(
                    [("id", pa.int64()), ("pr", pa.int64())]
                ).empty_table()
            )
        if len(node_tbl) <= broadcast_threshold:
            import ray.data

            ids = node_tbl["id"].to_numpy(np.int64)
            order = np.argsort(ids)
            ids = ids[order]
            outdeg = node_tbl["outdeg"].to_numpy(np.int64)[order]
            pr = np.full(len(ids), scale, dtype=np.int64)
            for _ in range(iterations):
                ref = ray.put((ids, pr, outdeg))

                def contrib_bcast(b: pa.Table) -> pa.Table:
                    s_ids, s_pr, s_od = ray.get(ref)
                    src = np.asarray(b["src"], dtype=np.int64)
                    dst = np.asarray(b["dst"], dtype=np.int64)
                    pos = np.searchsorted(s_ids, src)
                    share = (
                        s_pr[pos]
                        * damp_num
                        // (damp_den * np.maximum(s_od[pos], 1))
                    )
                    u, inv = np.unique(dst, return_inverse=True)
                    sums = np.zeros(len(u), np.int64)
                    np.add.at(sums, inv, share)
                    return pa.table(
                        {
                            "id": pa.array(u, pa.int64()),
                            "s": pa.array(sums, pa.int64()),
                        }
                    )

                st = bucket_sum(
                    edges_mat.map_batches(
                        contrib_bcast, batch_format="pyarrow"
                    ),
                    ["id"],
                    "s",
                ).to_pandas()
                nxt = np.full(len(ids), base, dtype=np.int64)
                if len(st):
                    pos = np.searchsorted(
                        ids, st["id"].to_numpy(np.int64)
                    )
                    nxt[pos] += st["s"].to_numpy(np.int64)
                pr = nxt
            return ray.data.from_arrow(
                pa.table(
                    {
                        "id": pa.array(ids, pa.int64()),
                        "pr": pa.array(pr, pa.int64()),
                    }
                )
            )
        edges = edges_mat  # reuse the materialization in the join rounds

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


def _star_pass(tbl: pa.Table, large: bool) -> pa.Table:
    """Vectorized large-star / small-star rewrite over ONE hash bucket of
    incidence pairs (center, nbr) — many centers per call, numpy segment
    reduction instead of per-group dispatch (the bucketed idiom from
    stages/dedup.py's posting lists). Duplicate (center, nbr) pairs are
    deduped here, so the edge multiset never inflates across rounds."""
    c = np.asarray(tbl["center"], dtype=np.int64)
    n = np.asarray(tbl["nbr"], dtype=np.int64)
    order = np.lexsort((n, c))
    c, n = c[order], n[order]
    if len(c):
        keep = np.ones(len(c), bool)
        keep[1:] = (c[1:] != c[:-1]) | (n[1:] != n[:-1])
        c, n = c[keep], n[keep]
    new_seg = np.r_[True, c[1:] != c[:-1]] if len(c) else np.zeros(0, bool)
    starts = np.flatnonzero(new_seg)
    # nbrs sort ascending within each center segment, so the segment's
    # first nbr is its min; fold the center itself in for large-star.
    m_center = np.minimum(c[starts], n[starts])
    seg = np.cumsum(new_seg) - 1
    m = m_center[seg] if len(c) else np.zeros(0, np.int64)
    if large:
        mask = n > c
        src, dst = n[mask], m[mask]
    else:
        mask = n != m
        src = np.concatenate([n[mask], c[starts]])
        dst = np.concatenate([m[mask], m_center])
    return pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
        }
    )


def connected_components(edges, star_rounds: int = 20, num_partitions: int | None = None):
    """Connected components via the alternating large-star / small-star
    algorithm (Kiveris et al. 2014, "Connected Components in MapReduce
    and Beyond" — public paper), finished with one exact min-label pass.

    ``edges``: Dataset[(src, dst)] int64, any orientation, parallel edges
    and self-loops tolerated. Returns Dataset[(id, component)] over every
    node appearing in ``edges``, where ``component`` is the minimum node
    id of the connected component — the same contract as
    stages/dedup.py::cluster_from_edges, reached in O(log n) rounds
    instead of O(graph diameter): each round contracts every node toward
    its neighborhood minimum, so million-hop chains (web graphs, citation
    chains) collapse in ~20 rounds where plain label propagation needs
    millions.

    Round shape: large-star then small-star, each ONE hash-bucketed
    groupby over the edge set (per-bucket numpy segment reduction — no
    per-node group dispatch, no join). Early stop uses the potential
    S = sum(src) + sum(dst), which both stars provably never increase;
    correctness does NOT depend on it: both transformations preserve
    connected components, so whenever the loop stops, the final
    cluster_from_edges pass computes the exact answer on the contracted
    graph (diameter <= 2 at convergence, so it finishes in O(1) rounds).
    """
    from ray.data.aggregate import Count

    from ..stages.dedup import _compact, _join_partitions, _norm

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    inc_schema = pa.schema(
        [("bkt", pa.int64()), ("center", pa.int64()), ("nbr", pa.int64())]
    )
    id_schema = pa.schema([("id", pa.int64())])
    out_schema = pa.schema([("id", pa.int64()), ("component", pa.int64())])

    P = num_partitions or _join_partitions()

    def _bkt(center: np.ndarray) -> np.ndarray:
        # multiplicative hash: structured ids (consecutive ranges) still
        # spread evenly across buckets
        h = center.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return ((h >> np.uint64(33)) % np.uint64(P)).astype(np.int64)

    @_norm(edge_schema)
    def clean(b: pa.Table) -> pa.Table:
        s = np.asarray(b["src"], dtype=np.int64)
        d = np.asarray(b["dst"], dtype=np.int64)
        keep = s != d
        return pa.table(
            {"src": pa.array(s[keep], pa.int64()), "dst": pa.array(d[keep], pa.int64())}
        )

    cur = _compact(edges.map_batches(clean, batch_format="pyarrow"))

    @_norm(id_schema)
    def endpoint_ids(b: pa.Table) -> pa.Table:
        s = b["src"].combine_chunks().cast(pa.int64())
        d = b["dst"].combine_chunks().cast(pa.int64())
        return pa.table({"id": pc.unique(pa.concat_arrays([s, d]))})

    # node universe from the ORIGINAL edges (self-loop-only nodes count)
    nodes = _compact(
        edges.map_batches(endpoint_ids, batch_format="pyarrow")
        .groupby("id")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["id"])
    )
    if nodes is None:
        import ray.data

        return ray.data.from_arrow(out_schema.empty_table())

    @_norm(inc_schema)
    def sym_incidence(b: pa.Table) -> pa.Table:  # large-star input
        s = np.asarray(b["src"], dtype=np.int64)
        d = np.asarray(b["dst"], dtype=np.int64)
        center = np.concatenate([s, d])
        nbr = np.concatenate([d, s])
        return pa.table(
            {
                "bkt": pa.array(_bkt(center), pa.int64()),
                "center": pa.array(center, pa.int64()),
                "nbr": pa.array(nbr, pa.int64()),
            }
        )

    @_norm(inc_schema)
    def hi_incidence(b: pa.Table) -> pa.Table:  # small-star input
        s = np.asarray(b["src"], dtype=np.int64)
        d = np.asarray(b["dst"], dtype=np.int64)
        center = np.maximum(s, d)
        nbr = np.minimum(s, d)
        return pa.table(
            {
                "bkt": pa.array(_bkt(center), pa.int64()),
                "center": pa.array(center, pa.int64()),
                "nbr": pa.array(nbr, pa.int64()),
            }
        )

    def large_fn(g: pa.Table) -> pa.Table:
        return _star_pass(g, large=True)

    def small_fn(g: pa.Table) -> pa.Table:
        return _star_pass(g, large=False)

    prev = None
    if cur is not None:
        for _ in range(star_rounds):
            inc = cur.map_batches(sym_incidence, batch_format="pyarrow")
            cur = _compact(
                inc.groupby("bkt").map_groups(large_fn, batch_format="pyarrow")
            )
            if cur is None:
                break
            inc = cur.map_batches(hi_incidence, batch_format="pyarrow")
            cur = _compact(
                inc.groupby("bkt").map_groups(small_fn, batch_format="pyarrow")
            )
            if cur is None:
                break
            sig = (cur.count(), cur.sum("src"), cur.sum("dst"))
            if sig == prev:
                break
            prev = sig

    labeled = _cluster(nodes, cur)
    return labeled.map_batches(
        _norm(out_schema)(
            lambda b: pa.table({"id": b["id"], "component": b["cluster_id"]})
        ),
        batch_format="pyarrow",
    )


def _cluster(nodes, edges):
    from ..stages.dedup import cluster_from_edges

    if edges is None:
        import ray.data

        return nodes.map_batches(
            lambda b: pa.table({"id": b["id"], "cluster_id": b["id"]}),
            batch_format="pyarrow",
        )
    return cluster_from_edges(nodes, edges, id_col="id")


def triangle_count(edges, num_partitions: int | None = None):
    """Per-node triangle counts over an undirected graph given as a
    directed edge Dataset[(src, dst)] (int64; orientation, parallel
    edges and self-loops are normalized away). Returns
    Dataset[(id, triangles)] for every node in >= 1 triangle.

    Algorithm: the degree-ordered wedge-check of Suri & Vassilvitskii
    2011 ("Counting triangles and the curse of the last reducer", WWW —
    public paper). Every edge is oriented from its lower-(degree, id)
    endpoint to its higher one, so each node's out-degree is bounded by
    O(sqrt(m)) on any graph and total wedge volume by O(m^1.5) — hub
    nodes never explode a reducer, which is the whole point at 100 TB.

    Stages (every intermediate stays a Dataset):
      1. canonical edge set — one groupby((lo, hi)) distinct;
      2. degrees — partial bincount per batch + node-sized groupby sum;
      3. orientation — two node-table hash joins attach endpoint
         degrees, a row-local pass picks the (deg, id) order;
      4. wedges — oriented edges hash-bucket BY SRC (many centers per
         bucket, cached triu indices per adjacency length — the
         term_cooccurrence idiom, no per-node group dispatch); each
         wedge (a, b, apex) is emitted with (a, b) already in
         orientation order, so the closing edge can only be a -> b;
      5. match — wedges and oriented edges hash-bucket by the (a, b)
         pair; per bucket one structured-array searchsorted marks the
         closed wedges, which credit apex, a and b;
      6. per-node groupby sum of the credits.
    """
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import _compact, _join_partitions, _norm
    from ..stages.text_stats import _triu_cached

    P = num_partitions or _join_partitions()

    lohi_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])
    deg_schema = pa.schema([("id", pa.int64()), ("d", pa.int64())])
    orient_schema = pa.schema(
        [
            ("bkt", pa.int64()),
            ("src", pa.int64()),
            ("dst", pa.int64()),
            ("sd", pa.int64()),  # sort key within the src adjacency
        ]
    )
    pair_schema = pa.schema(
        [
            ("bkt", pa.int64()),
            ("a", pa.int64()),
            ("b", pa.int64()),
            ("apex", pa.int64()),  # -1 marks a closing edge row
        ]
    )
    cnt_schema = pa.schema([("id", pa.int64()), ("triangles", pa.int64())])
    out_schema = cnt_schema

    def _empty():
        import ray.data

        return ray.data.from_arrow(out_schema.empty_table())

    def _bkt(x: np.ndarray) -> np.ndarray:
        h = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return ((h >> np.uint64(33)) % np.uint64(P)).astype(np.int64)

    @_norm(lohi_schema)
    def canon(b: pa.Table) -> pa.Table:
        s = np.asarray(b["src"], dtype=np.int64)
        d = np.asarray(b["dst"], dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "lo": pa.array(np.minimum(s, d), pa.int64()),
                "hi": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    from ..stages.combine import bucket_distinct, bucket_sum

    e = _compact(
        bucket_distinct(
            edges.map_batches(canon, batch_format="pyarrow"), ["lo", "hi"]
        )
    )
    if e is None:
        return _empty()

    @_norm(deg_schema)
    def deg_partial(b: pa.Table) -> pa.Table:
        lo = np.asarray(b["lo"], dtype=np.int64)
        hi = np.asarray(b["hi"], dtype=np.int64)
        u, c = np.unique(np.concatenate([lo, hi]), return_counts=True)
        return pa.table(
            {
                "id": pa.array(u, pa.int64()),
                "d": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    deg = _compact(
        bucket_sum(
            e.map_batches(deg_partial, batch_format="pyarrow"), ["id"], "d"
        )
    )

    j = e.join(deg, "inner", P, on=("lo",), right_on=("id",))
    j = _compact(
        j.map_batches(
            _norm(pa.schema([("lo", pa.int64()), ("hi", pa.int64()), ("dlo", pa.int64())]))(
                lambda b: pa.table(
                    {"lo": b["lo"], "hi": b["hi"], "dlo": b["d"]}
                )
            ),
            batch_format="pyarrow",
        )
    )
    if j is None:
        return _empty()
    j = j.join(deg, "inner", P, on=("hi",), right_on=("id",))

    @_norm(orient_schema)
    def orient(b: pa.Table) -> pa.Table:
        lo = np.asarray(b["lo"], dtype=np.int64)
        hi = np.asarray(b["hi"], dtype=np.int64)
        dlo = np.asarray(b["dlo"], dtype=np.int64)
        dhi = np.asarray(b["d"], dtype=np.int64)
        # src = endpoint with the smaller (degree, id); ids distinct, so
        # the tie-break is total
        lo_first = (dlo < dhi) | ((dlo == dhi) & (lo < hi))
        src = np.where(lo_first, lo, hi)
        dst = np.where(lo_first, hi, lo)
        sd = np.where(lo_first, dhi, dlo)
        return pa.table(
            {
                "bkt": pa.array(_bkt(src), pa.int64()),
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "sd": pa.array(sd, pa.int64()),
            }
        )

    oriented = _compact(j.map_batches(orient, batch_format="pyarrow"))
    if oriented is None:
        return _empty()

    def wedges(g: pa.Table) -> pa.Table:
        src = np.asarray(g["src"], dtype=np.int64)
        dst = np.asarray(g["dst"], dtype=np.int64)
        sd = np.asarray(g["sd"], dtype=np.int64)
        # adjacency ordered by (dst degree, dst id) inside each src run,
        # so pair (i, j) with i < j is already orientation-ordered
        order = np.lexsort((dst, sd, src))
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        ends = np.r_[starts[1:], len(src)]
        aa, bb, ap = [], [], []
        for s0, s1 in zip(starts, ends):
            L = s1 - s0
            if L < 2:
                continue
            i, jx = _triu_cached(L)
            aa.append(dst[s0 + i])
            bb.append(dst[s0 + jx])
            ap.append(np.full(len(i), src[s0], np.int64))
        if not aa:
            return pair_schema.empty_table()
        a = np.concatenate(aa)
        bcol = np.concatenate(bb)
        return pa.table(
            {
                "bkt": pa.array(_bkt(a * np.int64(31) + bcol), pa.int64()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(bcol, pa.int64()),
                "apex": pa.array(np.concatenate(ap), pa.int64()),
            }
        )

    wedge_ds = oriented.groupby("bkt").map_groups(
        wedges, batch_format="pyarrow"
    )

    @_norm(pair_schema)
    def edge_pairs(b: pa.Table) -> pa.Table:
        src = np.asarray(b["src"], dtype=np.int64)
        dst = np.asarray(b["dst"], dtype=np.int64)
        return pa.table(
            {
                "bkt": pa.array(_bkt(src * np.int64(31) + dst), pa.int64()),
                "a": pa.array(src, pa.int64()),
                "b": pa.array(dst, pa.int64()),
                "apex": pa.array(np.full(len(src), -1, np.int64), pa.int64()),
            }
        )

    both = wedge_ds.union(
        oriented.map_batches(edge_pairs, batch_format="pyarrow")
    )

    def close(g: pa.Table) -> pa.Table:
        a = np.asarray(g["a"], dtype=np.int64)
        b = np.asarray(g["b"], dtype=np.int64)
        apex = np.asarray(g["apex"], dtype=np.int64)
        is_edge = apex == -1
        if not is_edge.any() or is_edge.all():
            return cnt_schema.empty_table()
        ek = np.stack([a[is_edge], b[is_edge]], axis=1)
        ev = np.sort(ek.view([("a", "<i8"), ("b", "<i8")]).ravel())
        wk = np.stack([a[~is_edge], b[~is_edge]], axis=1)
        wv = wk.view([("a", "<i8"), ("b", "<i8")]).ravel()
        pos = np.searchsorted(ev, wv)
        pos[pos >= len(ev)] = len(ev) - 1
        hit = ev[pos] == wv
        if not hit.any():
            return cnt_schema.empty_table()
        ids = np.concatenate(
            [a[~is_edge][hit], b[~is_edge][hit], apex[~is_edge][hit]]
        )
        u, c = np.unique(ids, return_counts=True)
        return pa.table(
            {
                "id": pa.array(u, pa.int64()),
                "triangles": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    return bucket_sum(
        both.groupby("bkt").map_groups(close, batch_format="pyarrow"),
        ["id"],
        "triangles",
    )


def kcore(
    edges,
    k: int = 3,
    max_rounds: int = 50,
    broadcast_threshold: int = 2_000_000,
    materialize_every: int = 8,
    driver_edge_threshold: int = 5_000_000,
    num_partitions: int | None = None,
):
    """k-CORE: the maximal subgraph of the undirected graph (directed
    Dataset[(src, dst)] input; orientation, parallel edges and
    self-loops normalized away) in which every vertex keeps degree
    >= ``k``. Returns Dataset[(id, d)] — the core's vertices with
    their core-internal degree. The classic peeling fixpoint
    (Seidman 1983, "Network structure and minimum degree"): repeatedly
    delete vertices of degree < k until none remain.

    Shape — ONE Ray job per peel round, not four (the
    N-sequential-tiny-jobs lesson): peeling only ever REMOVES
    vertices, so instead of re-materializing the edge set each round,
    the accumulated doomed-vertex set ships via ``ray.put`` (sorted
    int64, zero-copy per batch) and the round's single aggregate fuses
    [drop doomed edges -> per-batch degree bincount] into its map
    before the node-sized groupby sum; the round's new sub-k vertices
    come straight off the MATERIALIZED degree table's blocks (pure
    object-store reads, no job launch).
    Every ``materialize_every`` rounds the filter folds into a real
    compacted edge set and the doomed set resets, bounding both the
    re-scan cost and the broadcast size at depth (deep peels on
    power-law graphs). If a round's doomed collection exceeds
    ``broadcast_threshold`` ids, that round falls back to two hash
    semi-joins against the surviving GOOD node table instead of a
    driver-sized broadcast — the corpus-scale early-round path.

    Hybrid fast path (the bpe_merges precedent): when the canonical
    edge set fits ``driver_edge_threshold`` rows (~16 B each), the
    whole peel loops locally on the driver with ZERO per-round Ray
    jobs — at query scale the distributed loop is launch-bound
    (measured 34 s for 11 aggregate rounds at sf0.1 vs one collect).
    Path equivalence between the two loops is pinned in tests; at
    corpus scale the distributed loop runs."""
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import _compact, _join_partitions, _norm

    P = num_partitions or _join_partitions()
    lohi_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])
    deg_schema = pa.schema([("id", pa.int64()), ("d", pa.int64())])
    empty = pa.table(
        {"id": pa.array([], pa.int64()), "d": pa.array([], pa.int64())}
    )

    @_norm(lohi_schema)
    def canon(b: pa.Table) -> pa.Table:
        s = np.asarray(b["src"], dtype=np.int64)
        d = np.asarray(b["dst"], dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "lo": pa.array(np.minimum(s, d), pa.int64()),
                "hi": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    def _alive(b: pa.Table, doomed: np.ndarray):
        lo = np.asarray(b["lo"], dtype=np.int64)
        hi = np.asarray(b["hi"], dtype=np.int64)
        if len(doomed):
            il = np.minimum(np.searchsorted(doomed, lo), len(doomed) - 1)
            ih = np.minimum(np.searchsorted(doomed, hi), len(doomed) - 1)
            keep = (doomed[il] != lo) & (doomed[ih] != hi)
            lo, hi = lo[keep], hi[keep]
        return lo, hi

    def degrees(e, ref):
        @_norm(deg_schema)
        def drop_and_count(b: pa.Table) -> pa.Table:
            lo, hi = _alive(b, ray.get(ref))
            u, c = np.unique(np.concatenate([lo, hi]), return_counts=True)
            return pa.table(
                {
                    "id": pa.array(u, pa.int64()),
                    "d": pa.array(c.astype(np.int64), pa.int64()),
                }
            )

        return _compact(
            e.map_batches(drop_and_count, batch_format="pyarrow")
            .groupby("id")
            .aggregate(Sum("d", alias_name="d"))
        )

    def collect_bad_capped(deg_ds, cap):
        """Pull the round's sub-k vertex ids straight off the
        MATERIALIZED degree table's blocks — pure object-store reads,
        no extra Ray job per round (the degree aggregate is the round's
        only job in the common case). Aborts past ``cap`` collected
        rows and returns None, signalling the hash-semi-join fallback."""
        got, total = [], 0
        for r in deg_ds.to_arrow_refs():
            t = ray.get(r)
            if t.num_rows == 0:
                continue
            ids = np.asarray(t["id"], dtype=np.int64)
            d = np.asarray(t["d"], dtype=np.int64)
            ids = ids[d < k]
            total += len(ids)
            if total > cap:
                return None
            if len(ids):
                got.append(ids)
        return np.sort(np.concatenate(got)) if got else np.empty(0, np.int64)

    cur = _compact(
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["lo", "hi"])
    )
    if cur is not None and cur.count() <= driver_edge_threshold:
        # hybrid under-threshold path (the bpe_merges precedent: an
        # iterated table that fits the driver loops locally with zero
        # per-round Ray jobs — the distributed loop was 11 aggregate
        # rounds / 34 s at sf0.1 where this is one collect).
        # Path-equivalence vs the distributed loop is pinned in tests.
        shards = [
            t
            for t in (ray.get(r) for r in cur.to_arrow_refs())
            if t.num_rows > 0
        ]
        if not shards:
            return ray.data.from_arrow(empty)
        e = pa.concat_tables(shards)
        lo = np.asarray(e["lo"], dtype=np.int64)
        hi = np.asarray(e["hi"], dtype=np.int64)
        while True:
            if len(lo) == 0:
                return ray.data.from_arrow(empty)
            ids, inv = np.unique(np.concatenate([lo, hi]),
                                 return_inverse=True)
            d = np.bincount(inv, minlength=len(ids)).astype(np.int64)
            bad = d < k
            if not bad.any():
                return ray.data.from_arrow(
                    pa.table(
                        {
                            "id": pa.array(ids, pa.int64()),
                            "d": pa.array(d, pa.int64()),
                        }
                    )
                )
            half = len(lo)
            keep = ~(bad[inv[:half]] | bad[inv[half:]])
            lo, hi = lo[keep], hi[keep]
    doomed_all = np.empty(0, dtype=np.int64)
    ref = ray.put(doomed_all)
    since_mat = 0
    for _ in range(max_rounds):
        if cur is None:
            return ray.data.from_arrow(empty)
        deg = degrees(cur, ref)
        if deg is None:
            return ray.data.from_arrow(empty)
        new_doomed = collect_bad_capped(deg, broadcast_threshold)
        if new_doomed is None:
            # corpus-scale round: keep survivors via two hash semi-joins
            good = _compact(deg.filter(expr=f"d >= {k}").select_columns(["id"]))
            if good is None:
                return ray.data.from_arrow(empty)
            filt = cur
            if len(doomed_all):
                dm = doomed_all

                @_norm(lohi_schema)
                def fold(b: pa.Table, _dm=dm) -> pa.Table:
                    lo, hi = _alive(b, _dm)
                    return pa.table(
                        {
                            "lo": pa.array(lo, pa.int64()),
                            "hi": pa.array(hi, pa.int64()),
                        }
                    )

                filt = cur.map_batches(fold, batch_format="pyarrow")
            j = filt.join(good, "inner", P, on=("lo",), right_on=("id",))
            j = _compact(j.select_columns(["lo", "hi"]))
            if j is None:
                return ray.data.from_arrow(empty)
            j = j.join(good, "inner", P, on=("hi",), right_on=("id",))
            cur = _compact(j.select_columns(["lo", "hi"]))
            doomed_all = np.empty(0, dtype=np.int64)
            ref = ray.put(doomed_all)
            since_mat = 0
            continue
        if len(new_doomed) == 0:
            return deg
        doomed_all = np.union1d(doomed_all, new_doomed)
        ref = ray.put(doomed_all)
        since_mat += 1
        if since_mat >= materialize_every:
            dm = doomed_all

            @_norm(lohi_schema)
            def fold2(b: pa.Table, _dm=dm) -> pa.Table:
                lo, hi = _alive(b, _dm)
                return pa.table(
                    {
                        "lo": pa.array(lo, pa.int64()),
                        "hi": pa.array(hi, pa.int64()),
                    }
                )

            cur = _compact(cur.map_batches(fold2, batch_format="pyarrow"))
            doomed_all = np.empty(0, dtype=np.int64)
            ref = ray.put(doomed_all)
            since_mat = 0
    deg = degrees(cur, ref)
    return ray.data.from_arrow(empty) if deg is None else deg


def link_prediction(
    edges,
    top_k: int = 100,
    max_degree: int = 64,
    w_scale: int = 10**9,
    num_partitions: int | None = None,
):
    """Common-neighbor link prediction over an undirected graph
    (directed Dataset[(src, dst)] input; orientation, parallel edges
    and self-loops normalized away): the ``top_k`` NON-edges ranked by
    the resource-allocation index (Zhou, Lü & Zhang 2009 — the
    integer-exact sibling of Adamic-Adar; both downweight hub middles,
    RA by 1/deg) with common-neighbor counts as the tiebreaker
    diagnostic. Returns Dataset[(lo, hi, n_common, ra_micro)] ordered
    by (ra_micro desc, lo, hi) — a total order, so the cut is
    deterministic and oracle-checkable, with

        ra_micro = sum over common neighbors z of w_scale // deg(z).

    Only middles with ``deg(z) <= max_degree`` generate candidate
    pairs — the documented partitioning assumption: a hub middle
    contributes at most ``w_scale/max_degree`` per pair while costing
    deg² wedges, so the cap bounds total wedge volume at
    ``2m * max_degree`` (linear in edges, hub-skew-proof) and is
    mirrored in the SQL oracle. Entity-graph densification /
    knowledge-graph completion — the "which links are missing" stage
    after entity resolution builds the graph.

    Shape: canonical edge set (one distinct groupby), node-sized
    degree aggregate, adjacency x degree hash join, ONE middle-hash
    bucket exchange emitting triu neighbor pairs per middle run (the
    triangle_count wedge idiom — no per-node dispatch), then ONE
    pair-hash bucket exchange where wedge rows and edge-marker rows
    meet: per bucket the pair's global (count, weight) sums reduce
    locally and existing edges are dropped (the anti-join), so no
    candidate row crosses the wire twice. A candidate-sized sort +
    limit finishes.
    """
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import _compact, _join_partitions, _norm
    from ..stages.text_stats import _triu_cached

    P = num_partitions or _join_partitions()

    lohi_schema = pa.schema([("lo", pa.int64()), ("hi", pa.int64())])
    deg_schema = pa.schema([("id", pa.int64()), ("d", pa.int64())])
    adj_schema = pa.schema(
        [("z", pa.int64()), ("nbr", pa.int64())]
    )
    pair_schema = pa.schema(
        [
            ("bkt", pa.int64()),
            ("lo", pa.int64()),
            ("hi", pa.int64()),
            ("w", pa.int64()),
            ("is_edge", pa.int64()),
        ]
    )
    out_schema = pa.schema(
        [
            ("lo", pa.int64()),
            ("hi", pa.int64()),
            ("n_common", pa.int64()),
            ("ra_micro", pa.int64()),
        ]
    )

    def _empty():
        import ray.data

        return ray.data.from_arrow(out_schema.empty_table())

    def _bkt(x: np.ndarray) -> np.ndarray:
        h = x.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return ((h >> np.uint64(33)) % np.uint64(P)).astype(np.int64)

    @_norm(lohi_schema)
    def canon(b: pa.Table) -> pa.Table:
        s = np.asarray(b["src"], dtype=np.int64)
        d = np.asarray(b["dst"], dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "lo": pa.array(np.minimum(s, d), pa.int64()),
                "hi": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    from ..stages.combine import bucket_distinct, bucket_sum

    e = _compact(
        bucket_distinct(
            edges.map_batches(canon, batch_format="pyarrow"), ["lo", "hi"]
        )
    )
    if e is None:
        return _empty()

    @_norm(deg_schema)
    def deg_partial(b: pa.Table) -> pa.Table:
        lo = np.asarray(b["lo"], dtype=np.int64)
        hi = np.asarray(b["hi"], dtype=np.int64)
        u, c = np.unique(np.concatenate([lo, hi]), return_counts=True)
        return pa.table(
            {
                "id": pa.array(u, pa.int64()),
                "d": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    deg = _compact(
        bucket_sum(
            e.map_batches(deg_partial, batch_format="pyarrow"), ["id"], "d"
        )
    )

    @_norm(adj_schema)
    def both_dirs(b: pa.Table) -> pa.Table:
        lo = np.asarray(b["lo"], dtype=np.int64)
        hi = np.asarray(b["hi"], dtype=np.int64)
        return pa.table(
            {
                "z": pa.array(np.concatenate([lo, hi]), pa.int64()),
                "nbr": pa.array(np.concatenate([hi, lo]), pa.int64()),
            }
        )

    adj = e.map_batches(both_dirs, batch_format="pyarrow")
    j = adj.join(deg, "inner", P, on=("z",), right_on=("id",))

    mid_schema = pa.schema(
        [
            ("bkt", pa.int64()),
            ("z", pa.int64()),
            ("nbr", pa.int64()),
            ("d", pa.int64()),
        ]
    )

    @_norm(mid_schema)
    def capped(b: pa.Table) -> pa.Table:
        z = np.asarray(b["z"], dtype=np.int64)
        nbr = np.asarray(b["nbr"], dtype=np.int64)
        d = np.asarray(b["d"], dtype=np.int64)
        keep = d <= max_degree
        z, nbr, d = z[keep], nbr[keep], d[keep]
        return pa.table(
            {
                "bkt": pa.array(_bkt(z), pa.int64()),
                "z": pa.array(z, pa.int64()),
                "nbr": pa.array(nbr, pa.int64()),
                "d": pa.array(d, pa.int64()),
            }
        )

    mids = _compact(j.map_batches(capped, batch_format="pyarrow"))
    if mids is None:
        return _empty()

    def wedges(g: pa.Table) -> pa.Table:
        z = np.asarray(g["z"], dtype=np.int64)
        nbr = np.asarray(g["nbr"], dtype=np.int64)
        d = np.asarray(g["d"], dtype=np.int64)
        order = np.lexsort((nbr, z))
        z, nbr, d = z[order], nbr[order], d[order]
        starts = np.flatnonzero(np.r_[True, z[1:] != z[:-1]])
        ends = np.r_[starts[1:], len(z)]
        lo_, hi_, ww = [], [], []
        for s0, s1 in zip(starts, ends):
            L = s1 - s0
            if L < 2:
                continue
            i, jx = _triu_cached(L)
            # adjacency sorted by nbr inside the run, so i < jx already
            # yields lo < hi
            lo_.append(nbr[s0 + i])
            hi_.append(nbr[s0 + jx])
            ww.append(np.full(len(i), w_scale // int(d[s0]), np.int64))
        if not lo_:
            return pair_schema.empty_table()
        lo = np.concatenate(lo_)
        hi = np.concatenate(hi_)
        return pa.table(
            {
                "bkt": pa.array(_bkt(lo * np.int64(31) + hi), pa.int64()),
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "w": pa.array(np.concatenate(ww), pa.int64()),
                "is_edge": pa.array(np.zeros(len(lo), np.int64), pa.int64()),
            }
        )

    wedge_ds = mids.groupby("bkt").map_groups(wedges, batch_format="pyarrow")

    @_norm(pair_schema)
    def edge_marks(b: pa.Table) -> pa.Table:
        lo = np.asarray(b["lo"], dtype=np.int64)
        hi = np.asarray(b["hi"], dtype=np.int64)
        return pa.table(
            {
                "bkt": pa.array(_bkt(lo * np.int64(31) + hi), pa.int64()),
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "w": pa.array(np.zeros(len(lo), np.int64), pa.int64()),
                "is_edge": pa.array(np.ones(len(lo), np.int64), pa.int64()),
            }
        )

    both = wedge_ds.union(e.map_batches(edge_marks, batch_format="pyarrow"))

    def reduce_bucket(g: pa.Table) -> pa.Table:
        lo = np.asarray(g["lo"], dtype=np.int64)
        hi = np.asarray(g["hi"], dtype=np.int64)
        w = np.asarray(g["w"], dtype=np.int64)
        is_edge = np.asarray(g["is_edge"], dtype=np.int64) == 1
        keys = np.stack([lo, hi], axis=1)
        kv = keys.view([("a", "<i8"), ("b", "<i8")]).ravel()
        uniq, inv = np.unique(kv, return_inverse=True)
        nuniq = len(uniq)
        # pairs that exist as edges are dropped (the anti-join)
        edge_pair = np.zeros(nuniq, dtype=bool)
        edge_pair[inv[is_edge]] = True
        wedge = ~is_edge
        n_common = np.bincount(inv[wedge], minlength=nuniq)
        ra = np.zeros(nuniq, np.int64)
        np.add.at(ra, inv[wedge], w[wedge])
        keep = ~edge_pair & (n_common > 0)
        if not keep.any():
            return out_schema.empty_table()
        kept = uniq[keep]
        return pa.table(
            {
                "lo": pa.array(kept["a"], pa.int64()),
                "hi": pa.array(kept["b"], pa.int64()),
                "n_common": pa.array(
                    n_common[keep].astype(np.int64), pa.int64()
                ),
                "ra_micro": pa.array(ra[keep], pa.int64()),
            }
        )

    return (
        both.groupby("bkt")
        .map_groups(reduce_bucket, batch_format="pyarrow")
        .sort(["ra_micro", "lo", "hi"], descending=[True, False, False])
        .limit(top_k)
    )


def _kruskal_local(src, dst, w, n_hint=None):
    """Driver-local Kruskal over the (w, src, dst) total edge order —
    the unique minimum spanning forest under that order (ties broken
    deterministically, so it equals the distributed Borůvka result).
    Arrays are numpy int64; returns a boolean keep-mask over edges."""
    order = np.lexsort((dst, src, w))
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    keep = np.zeros(len(src), bool)
    for i in order:
        a, b = find(int(src[i])), find(int(dst[i]))
        if a != b:
            parent[max(a, b)] = min(a, b)
            keep[i] = True
    return keep


def boruvka_mst(
    edges,
    local_threshold: int = 2_000_000,
    max_rounds: int = 40,
    num_partitions: int | None = None,
):
    """Minimum spanning forest via Borůvka hook-and-contract (Borůvka
    1926; the backbone of single-linkage clustering — cut the MSF
    above a distance threshold and the components ARE the clusters).
    ``edges``: Dataset[(src, dst, w)] int64, undirected, each edge
    once. Edge comparison uses the TOTAL order (w, src, dst), so the
    forest is unique and deterministic even with duplicate weights —
    equal to Kruskal under the same order (path-equivalence-tested).
    Returns Dataset[(src, dst, w)] of forest edges sorted by
    (src, dst).

    Distributed shape, O(log n) rounds: each round (1) relabels edge
    endpoints by current component via two hash joins against the
    label table; (2) drops intra-component edges; (3) picks each
    component's minimum incident edge with ONE component-bucket
    exchange + block-local lexsort-first (per-batch pre-combine caps
    the exchange at one row per component per block); (4) contracts
    the selected hook edges with the proven star-contraction
    :func:`connected_components` (the selected graph is
    component-domain-sized — it halves every round); (5) folds the
    new labels back with one join. Under ``local_threshold`` edges
    the whole forest runs driver-local Kruskal instead (the bpe/kcore
    local-loop precedent — each distributed round costs several tiny
    jobs at toy scale).
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..stages.dedup import _compact, _join_partitions, _norm

    out_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("w", pa.int64())]
    )
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    if n_edges <= local_threshold:
        df = edges.to_pandas()
        src = df["src"].to_numpy(np.int64)
        dst = df["dst"].to_numpy(np.int64)
        w = df["w"].to_numpy(np.int64)
        keep = _kruskal_local(src, dst, w)
        order = np.lexsort((dst[keep], src[keep]))
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(src[keep][order], pa.int64()),
                    "dst": pa.array(dst[keep][order], pa.int64()),
                    "w": pa.array(w[keep][order], pa.int64()),
                }
            )
        )

    P = num_partitions or _join_partitions()
    lbl_schema = pa.schema([("id", pa.int64()), ("comp", pa.int64())])
    sel_schema = pa.schema(
        [
            ("comp", pa.int64()),
            ("w", pa.int64()),
            ("src", pa.int64()),
            ("dst", pa.int64()),
            ("osrc", pa.int64()),
            ("odst", pa.int64()),
        ]
    )

    @_norm(lbl_schema)
    def node_rows(b: pa.Table) -> pa.Table:
        ids = pc.unique(
            pa.concat_arrays(
                [
                    b["src"].combine_chunks().cast(pa.int64()),
                    b["dst"].combine_chunks().cast(pa.int64()),
                ]
            )
        )
        return pa.table({"id": ids, "comp": ids})

    from ray.data.aggregate import Count

    labels = _compact(
        edges.map_batches(node_rows, batch_format="pyarrow")
        .groupby("id")
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            _norm(lbl_schema)(
                lambda b: pa.table({"id": b["id"], "comp": b["id"]})
            ),
            batch_format="pyarrow",
        )
    )
    cur = _compact(edges)  # (src, dst, w) with original endpoints
    mst_parts = []

    for _ in range(max_rounds):
        if cur is None:
            break
        # relabel endpoints by current component
        j1 = cur.join(labels, "inner", P, on=("src",), right_on=("id",))
        j1 = _compact(
            j1.map_batches(
                lambda b: pa.table(
                    {
                        "src": b["src"],
                        "dst": b["dst"],
                        "w": b["w"],
                        "csrc": b["comp"],
                    }
                ),
                batch_format="pyarrow",
            )
        )
        if j1 is None:
            break
        j2 = j1.join(labels, "inner", P, on=("dst",), right_on=("id",))
        relabeled = _compact(
            j2.map_batches(
                lambda b: pa.table(
                    {
                        "src": b["src"],
                        "dst": b["dst"],
                        "w": b["w"],
                        "csrc": b["csrc"],
                        "cdst": b["comp"],
                    }
                ).filter(pc.not_equal(b["csrc"], b["comp"])),
                batch_format="pyarrow",
            )
        )
        if relabeled is None:
            break

        # each component's minimum incident edge by (w, src, dst)
        @_norm(sel_schema)
        def min_partial(b: pa.Table) -> pa.Table:
            w = np.asarray(b["w"], dtype=np.int64)
            s = np.asarray(b["src"], dtype=np.int64)
            d = np.asarray(b["dst"], dtype=np.int64)
            cs = np.asarray(b["csrc"], dtype=np.int64)
            cd = np.asarray(b["cdst"], dtype=np.int64)
            comp = np.concatenate([cs, cd])
            w2 = np.concatenate([w, w])
            s2 = np.concatenate([s, s])
            d2 = np.concatenate([d, d])
            os2 = np.concatenate([cs, cs])
            od2 = np.concatenate([cd, cd])
            order = np.lexsort((d2, s2, w2, comp))
            comp_o = comp[order]
            first = np.ones(len(comp_o), bool)
            first[1:] = comp_o[1:] != comp_o[:-1]
            pick = order[first]
            return pa.table(
                {
                    "comp": pa.array(comp[pick], pa.int64()),
                    "w": pa.array(w2[pick], pa.int64()),
                    "src": pa.array(s2[pick], pa.int64()),
                    "dst": pa.array(d2[pick], pa.int64()),
                    "osrc": pa.array(os2[pick], pa.int64()),
                    "odst": pa.array(od2[pick], pa.int64()),
                }
            )

        def bucket_min(b: pa.Table) -> pa.Table:
            t = min_partial(b)
            h = (
                np.asarray(t["comp"], dtype=np.int64)
                * np.int64(2654435761)
            ) % np.int64(P)
            return t.append_column("bucket", pa.array(np.abs(h), pa.int64()))

        @_norm(sel_schema)
        def min_final(g: pa.Table) -> pa.Table:
            # same min-per-comp pick, over rows already in sel layout
            comp = np.asarray(g["comp"], dtype=np.int64)
            w = np.asarray(g["w"], dtype=np.int64)
            s = np.asarray(g["src"], dtype=np.int64)
            d = np.asarray(g["dst"], dtype=np.int64)
            order = np.lexsort((d, s, w, comp))
            comp_o = comp[order]
            first = np.ones(len(comp_o), bool)
            first[1:] = comp_o[1:] != comp_o[:-1]
            pick = order[first]
            return g.drop_columns(
                [c for c in g.column_names if c == "bucket"]
            ).take(pa.array(pick, pa.int64()))

        selected = _compact(
            relabeled.map_batches(bucket_min, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(min_final, batch_format="pyarrow")
        )
        if selected is None:
            break
        # distinct selected edges join the forest (two comps may pick
        # the same edge)
        picked = _compact(
            selected.groupby(["src", "dst", "w"])
            .aggregate(Count(alias_name="_n"))
            .select_columns(["src", "dst", "w"])
        )
        if picked is not None:
            mst_parts.append(picked)

        # contract: components of the selected hook graph become the
        # new labels; untouched components keep their own
        hooks = selected.map_batches(
            _norm(pa.schema([("src", pa.int64()), ("dst", pa.int64())]))(
                lambda b: pa.table({"src": b["osrc"], "dst": b["odst"]})
            ),
            batch_format="pyarrow",
        )
        cc = connected_components(hooks, num_partitions=P)
        cmap = _compact(
            cc.map_batches(
                _norm(pa.schema([("cid", pa.int64()), ("newc", pa.int64())]))(
                    lambda b: pa.table(
                        {"cid": b["id"], "newc": b["component"]}
                    )
                ),
                batch_format="pyarrow",
            )
        )
        if cmap is None:
            break
        jl = labels.join(
            cmap, "left_outer", P, on=("comp",), right_on=("cid",)
        )
        labels = _compact(
            jl.map_batches(
                _norm(lbl_schema)(
                    lambda b: pa.table(
                        {
                            "id": b["id"],
                            "comp": pc.coalesce(
                                pc.cast(b["newc"], pa.int64()), b["comp"]
                            ),
                        }
                    )
                ),
                batch_format="pyarrow",
            )
        )
    else:
        raise RuntimeError("boruvka_mst: max_rounds exceeded")

    if not mst_parts:
        return ray.data.from_arrow(out_schema.empty_table())
    forest = mst_parts[0]
    if len(mst_parts) > 1:
        forest = forest.union(*mst_parts[1:])
    return (
        forest.groupby(["src", "dst", "w"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["src", "dst", "w"])
        .sort(["src", "dst"])
    )
