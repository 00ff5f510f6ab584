"""Distributed PageRank over the constructed knowledge graph.

Each iteration is ONE hash join (current ranks → the static
edge+outdegree table on the source id) plus one associative groupby
(incoming mass per destination) — no driver-side O(nodes) structure
anywhere: the rank table lives as a materialized Dataset in the object
store between iterations (the standard checkpoint pattern for iterative
dataflow — without it the lazy lineage re-executes every prior round).
The only values that reach the driver are two scalars per round (total
rank mass and linked mass for the dangling-node correction; linked mass
falls out of the per-edge contribution sum, since a source of out-degree
k contributes k × rank/k = rank).

The edges⋈outdeg join is loop-invariant and hoisted: it runs once and
the joined table is reused every round.  Join fan-out defaults to
``dedup._join_partitions()`` — a hash partition that receives zero keys
materializes a schema-less block and Arrow's join then fails on the key
FieldRef (the same pitfall documented there), so gate-scale runs keep
the partition count small; production callers size it to data volume.

Dangling nodes (no outgoing edges) redistribute their mass uniformly,
the textbook formulation:

    r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + dangling/N)

Determinism: pure float64 arithmetic over a fixed edge set; the NumPy
twin in ``pagerank_reference`` reproduces the result to fp-sum-order
tolerance (tests/test_pagerank.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ie_ray.stages.dedup import _join_partitions


def _rename(cols):
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns(cols)
    return fn


def pagerank(edges, iters: int = 10, damping: float = 0.85,
             num_partitions=None):
    """edges: Dataset with string columns subj_id, obj_id (one row per
    edge; extra columns ignored).  Returns a Dataset (node, rank)."""
    parts = _join_partitions(num_partitions)

    def side(col):
        return (edges.select_columns([col])
                .map_batches(_rename(["node"]), batch_format="pyarrow"))

    from ie_ray.stages.relational import bucketed_aggregate
    # node/out-degree key domains are graph-sized — reduce through the
    # bucketed path (Ray's sort groupby pays per-group Python cost there)
    nodes = (bucketed_aggregate(side("subj_id").union(side("obj_id")),
                                "node", [("node", "count")])
             .map_batches(lambda t: t.select(["node"]),
                          batch_format="pyarrow")).materialize()
    n = nodes.count()

    outdeg = (bucketed_aggregate(edges.select_columns(["subj_id"]),
                                 "subj_id", [("subj_id", "count")])
              .map_batches(_rename(["subj_id", "outdeg"]),
                           batch_format="pyarrow"))

    # loop-invariant: every edge row tagged with its source's out-degree
    edges_w = (edges.select_columns(["subj_id", "obj_id"])
               .join(outdeg, "inner", num_partitions=parts,
                     on=("subj_id",))).materialize()

    def init_rank(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank", pa.array([1.0 / n] * t.num_rows, type=pa.float64()))

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "node": t.column("obj_id"),
            "c": pc.divide(t.column("rank"),
                           pc.cast(t.column("outdeg"), pa.float64()))})

    def zero(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node"),
            "c": pa.array([0.0] * t.num_rows, type=pa.float64())})

    zeros = nodes.map_batches(zero, batch_format="pyarrow")

    for _ in range(iters):
        contribs = (edges_w
                    .join(ranks.map_batches(_rename(["subj_id", "rank"]),
                                            batch_format="pyarrow"),
                          "inner", num_partitions=parts, on=("subj_id",))
                    .map_batches(contrib,
                                 batch_format="pyarrow")).materialize()
        total = ranks.sum("rank")
        linked = contribs.sum("c") or 0.0   # == sum of linked-node ranks
        dangling = total - linked

        base = (1.0 - damping) / n + damping * dangling / n

        def finish(t: pa.Table, base=base) -> pa.Table:
            import pyarrow.compute as pc
            r = pc.add(pc.multiply(t.column("c_sum"), damping), base)
            return pa.table({"node": t.column("node"), "rank": r})

        ranks = (bucketed_aggregate(contribs.union(zeros), "node",
                                    [("c", "sum")])
                 .map_batches(finish, batch_format="pyarrow")).materialize()

    return ranks


def pagerank_weighted(edges, iters: int = 10, damping: float = 0.85,
                      num_partitions=None):
    """Weighted PageRank: edges (subj_id, obj_id, w) with one row per
    aggregated edge; a source's mass splits across targets ∝ w.  Same
    loop shape as :func:`pagerank` (one join + one groupby per round);
    the input stays at O(|distinct edges|), never per-link rows."""
    parts = _join_partitions(num_partitions)

    def side(col):
        return (edges.select_columns([col])
                .map_batches(_rename(["node"]), batch_format="pyarrow"))

    from ie_ray.stages.relational import bucketed_aggregate
    # node/out-degree key domains are graph-sized — reduce through the
    # bucketed path (Ray's sort groupby pays per-group Python cost there)
    nodes = (bucketed_aggregate(side("subj_id").union(side("obj_id")),
                                "node", [("node", "count")])
             .map_batches(lambda t: t.select(["node"]),
                          batch_format="pyarrow")).materialize()
    n = nodes.count()

    outw = (bucketed_aggregate(edges.select_columns(["subj_id", "w"]),
                               "subj_id", [("w", "sum")])
            .map_batches(_rename(["subj_id", "outw"]),
                         batch_format="pyarrow"))
    edges_w = (edges.select_columns(["subj_id", "obj_id", "w"])
               .join(outw, "inner", num_partitions=parts,
                     on=("subj_id",))).materialize()

    def init_rank(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank", pa.array([1.0 / n] * t.num_rows, type=pa.float64()))

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        share = pc.divide(pc.cast(t.column("w"), pa.float64()),
                          pc.cast(t.column("outw"), pa.float64()))
        return pa.table({
            "node": t.column("obj_id"),
            "c": pc.multiply(t.column("rank"), share)})

    def zero(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node"),
            "c": pa.array([0.0] * t.num_rows, type=pa.float64())})

    zeros = nodes.map_batches(zero, batch_format="pyarrow")

    for _ in range(iters):
        contribs = (edges_w
                    .join(ranks.map_batches(_rename(["subj_id", "rank"]),
                                            batch_format="pyarrow"),
                          "inner", num_partitions=parts, on=("subj_id",))
                    .map_batches(contrib,
                                 batch_format="pyarrow")).materialize()
        total = ranks.sum("rank")
        linked = contribs.sum("c") or 0.0
        dangling = total - linked
        base = (1.0 - damping) / n + damping * dangling / n

        def finish(t: pa.Table, base=base) -> pa.Table:
            import pyarrow.compute as pc
            r = pc.add(pc.multiply(t.column("c_sum"), damping), base)
            return pa.table({"node": t.column("node"), "rank": r})

        ranks = (bucketed_aggregate(contribs.union(zeros), "node",
                                    [("c", "sum")])
                 .map_batches(finish, batch_format="pyarrow")).materialize()

    return ranks


def pagerank_weighted_reference(src, dst, w, iters: int = 10,
                                damping: float = 0.85) -> dict:
    """Single-process NumPy twin of :func:`pagerank_weighted`."""
    nodes = sorted(set(src) | set(dst))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    s = np.array([idx[v] for v in src])
    d = np.array([idx[v] for v in dst])
    w = np.asarray(w, dtype=np.float64)
    outw = np.bincount(s, weights=w, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[outw == 0].sum()
        inc = np.bincount(d, weights=r[s] * w / outw[s], minlength=n)
        r = (1.0 - damping) / n + damping * (inc + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def pagerank_reference(src, dst, iters: int = 10,
                       damping: float = 0.85) -> dict:
    """Single-process NumPy twin for verification; returns {node: rank}."""
    nodes = sorted(set(src) | set(dst))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    s = np.array([idx[v] for v in src])
    d = np.array([idx[v] for v in dst])
    outdeg = np.bincount(s, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[outdeg == 0].sum()
        inc = np.bincount(d, weights=r[s] / outdeg[s], minlength=n)
        r = (1.0 - damping) / n + damping * (inc + dangling / n)
    return {v: r[idx[v]] for v in nodes}
