"""Word co-occurrence graph + distributed triangle counting.

Co-occurrence edges are the cheapest useful KG proxy over raw text: two
words adjacent in a document form an undirected edge, weighted by the
number of documents containing that bigram (document frequency).  The
reference's entity co-mention stage (`ie_ray/stages/comention.py`) is the
entity-level analogue; this word-level variant is fully SQL-expressible so
the DuckDB oracle verifies it value-for-value.

Triangle counting uses the Suri–Vassilvitskii MapReduce orientation
(WWW 2011, "Counting triangles and the curse of the last reducer"): orient
every edge from its lower-(degree, name) endpoint to the higher one, build
wedges by self-joining oriented edges on their source, then probe the
wedge's closing pair against the edge set.  Orientation bounds wedge
fan-out by the graph's degeneracy (hub nodes never *source* wedges), which
is exactly the skew defense a web-scale entity graph needs — a naive
self-join on shared neighbor explodes on the highest-degree node.

Everything below is Dataset joins/groupbys: no driver materialization, no
broadcast of the edge set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ie_ray.stages.dedup import _join_partitions


def bigram_rows_batch(batch: pa.Table) -> pa.Table:
    """Distinct unordered adjacent-word pairs per document, pre-combined
    to (w1, w2, n_docs-in-block) partials inside the block.  Vectorized
    in polars: explode + shift-within-doc builds the adjacency, a
    per-(doc, pair) unique dedups, one group_by counts."""
    import polars as pl
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    e = (df.with_columns(pl.col("text").str.split(" ").alias("w"))
           .drop("text").explode("w")
           .with_columns(pl.col("w").shift(-1).over("doc_id")
                         .alias("nxt"))
           .drop_nulls("nxt")
           .filter((pl.col("w") != "") & (pl.col("nxt") != "")
                   & (pl.col("w") != pl.col("nxt"))))
    pairs = (e.with_columns(
        pl.min_horizontal("w", "nxt").alias("w1"),
        pl.max_horizontal("w", "nxt").alias("w2"))
        .unique(subset=["doc_id", "w1", "w2"])
        .group_by(["w1", "w2"]).len())
    out = pairs.to_arrow()
    return pa.table({
        "w1": out.column("w1").cast(pa.string()),
        "w2": out.column("w2").cast(pa.string()),
        "df": out.column("len").cast(pa.int64())})


def cooccur_edges(docs, df_min: int = 60):
    """Undirected co-occurrence edges (w1 < w2, document frequency >=
    df_min).  Block partials pre-combine per block; the global sum runs
    through relational.bucketed_aggregate because the pair key space is
    vocab²-sized — rows-sized key domains hit Ray sort-aggregate's
    per-group Python overhead."""
    from ie_ray.stages.relational import bucketed_aggregate

    partials = docs.map_batches(bigram_rows_batch, batch_format="pyarrow")
    agg = bucketed_aggregate(partials, ["w1", "w2"], [("df", "sum")],
                             parts=16)

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("df_sum"), df_min))
        return pa.table({"w1": t.column("w1"), "w2": t.column("w2"),
                         "df": t.column("df_sum").cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def k_core(edges, k: int, max_rounds: int = 100):
    """Edges of the k-core: iteratively peel nodes with degree < k until
    fixpoint (the standard distributed decomposition loop — each round is
    one degree groupby + one survivor semi-filter, and the edge set only
    shrinks).  The per-round survivor set is a node table; it broadcasts
    while small and hash-joins beyond (adaptive_join), exactly like
    PageRank's rank table in stages/pagerank.py.  Returns the surviving
    edge Dataset (w1 < w2)."""
    from ie_ray.stages.relational import adaptive_join

    cur = edges.materialize()
    n_edges = cur.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break

        def endpoints(t: pa.Table) -> pa.Table:
            return pa.table({"node": pa.array(
                t.column("w1").to_pylist() + t.column("w2").to_pylist(),
                type=pa.string())})

        deg = cur.map_batches(endpoints, batch_format="pyarrow") \
            .groupby("node").count()
        keep = deg.map_batches(
            lambda t, k=k: pa.table({"node": t.column("node").filter(
                pc.greater_equal(t.column("count()"), k))}),
            batch_format="pyarrow")
        nxt = adaptive_join(
            cur.map_batches(lambda t: pa.table({
                "w1": t.column("w1"), "w2": t.column("w2"),
                "node": t.column("w1")}), batch_format="pyarrow"),
            keep, on="node")
        nxt = adaptive_join(
            nxt.map_batches(lambda t: pa.table({
                "w1": t.column("w1"), "w2": t.column("w2"),
                "node": t.column("w2")}), batch_format="pyarrow"),
            keep, on="node").map_batches(
            lambda t: pa.table({"w1": t.column("w1"),
                                "w2": t.column("w2")}),
            batch_format="pyarrow").materialize()
        n_next = nxt.count()
        if n_next == n_edges:
            break
        cur, n_edges = nxt, n_next
    return cur


def core_numbers(edges, k_max: int = 64):
    """Core number per node: the largest k for which the node survives
    the k-core.  Runs the peeling loop with increasing k, reusing the
    (k-1)-core as the start of round k — total work is the sum of the
    shrinking cores, not k × edges.  Returns Dataset (node, core)."""
    import ray.data

    out = None
    cur = edges.materialize()
    for k in range(1, k_max + 1):
        nxt = k_core(cur, k)
        if nxt.count() == 0:
            break

        def endpoints(t: pa.Table, kk=k) -> pa.Table:
            nodes = sorted(set(t.column("w1").to_pylist()) |
                           set(t.column("w2").to_pylist()))
            return pa.table({
                "node": pa.array(nodes, type=pa.string()),
                "core": pa.array([kk] * len(nodes), type=pa.int64())})

        lvl = nxt.map_batches(endpoints, batch_format="pyarrow") \
            .groupby("node").max("core").map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "core": t.column("max(core)")}),
            batch_format="pyarrow")
        out = lvl if out is None else out.union(lvl) \
            .groupby("node").max("core").map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "core": t.column("max(core)")}),
            batch_format="pyarrow")
        out = out.materialize()
        cur = nxt
    if out is None:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], type=pa.string()),
            "core": pa.array([], type=pa.int64())}))
    return out


def triangles(edges, num_partitions=None):
    """All triangles {a,b,c} in an undirected edge Dataset (w1 < w2
    lexicographically, one row per edge).  Returns Dataset (w1, w2, w3)
    name-sorted within each row, each triangle exactly once.

    Suri–Vassilvitskii: wedges are generated only at each triangle's
    lowest-(degree, name) vertex, so per-vertex fan-out is bounded by
    oriented out-degree (<= graph degeneracy), not raw degree."""
    from ie_ray.stages.relational import adaptive_join

    nparts = _join_partitions(num_partitions)
    # the edge table feeds degree counts, orientation AND the closure
    # probe — materialize once (it is the SMALL side by construction:
    # vocab²/entity-graph-bounded, ~100× under the doc scan that built
    # it) or every adaptive_join count() re-executes the corpus scan
    edges = edges.materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        # edge tables are vocab²-bounded — list concat is fine here
        return pa.table({"node": pa.array(
            t.column("w1").to_pylist() + t.column("w2").to_pylist(),
            type=pa.string())})

    deg = edges.map_batches(endpoints, batch_format="pyarrow") \
        .groupby("node").count()

    # degree decoration + closure probe are key-unique dimension joins —
    # adaptive_join broadcasts them while they fit, hash-exchanges beyond
    e1 = adaptive_join(edges, deg.map_batches(
        lambda t: pa.table({"w1": t.column("node"),
                            "d1": t.column("count()")}),
        batch_format="pyarrow"), on="w1", num_partitions=nparts)
    e2 = adaptive_join(e1, deg.map_batches(
        lambda t: pa.table({"w2": t.column("node"),
                            "d2": t.column("count()")}),
        batch_format="pyarrow"), on="w2", num_partitions=nparts)

    def orient(t: pa.Table) -> pa.Table:
        w1 = np.asarray(t.column("w1").cast(pa.string()), dtype=object)
        w2 = np.asarray(t.column("w2").cast(pa.string()), dtype=object)
        d1 = np.asarray(t.column("d1"), dtype=np.int64)
        d2 = np.asarray(t.column("d2"), dtype=np.int64)
        # lo = lower (degree, name); name is the tiebreak
        lo_first = (d1 < d2) | ((d1 == d2) & (w1 < w2))
        lo = np.where(lo_first, w1, w2)
        hi = np.where(lo_first, w2, w1)
        return pa.table({"lo": pa.array(lo, type=pa.string()),
                         "hi": pa.array(hi, type=pa.string())})

    oriented = e2.map_batches(orient, batch_format="pyarrow")
    right = oriented.map_batches(
        lambda t: pa.table({"lo": t.column("lo"), "hi2": t.column("hi")}),
        batch_format="pyarrow")
    wedged = oriented.join(right, "inner", num_partitions=nparts,
                           on=("lo",))

    def wedge_keys(t: pa.Table) -> pa.Table:
        hi = np.asarray(t.column("hi").cast(pa.string()), dtype=object)
        hi2 = np.asarray(t.column("hi2").cast(pa.string()), dtype=object)
        keep = hi < hi2  # one of the two join orderings, drops self-pairs
        lo = np.asarray(t.column("lo").cast(pa.string()), dtype=object)[keep]
        a, b = hi[keep], hi2[keep]
        key = np.array([x + "|" + y for x, y in zip(a, b)], dtype=object)
        return pa.table({"lo": pa.array(lo, type=pa.string()),
                         "key": pa.array(key, type=pa.string())})

    def edge_keys(t: pa.Table) -> pa.Table:
        w1 = t.column("w1").cast(pa.string()).to_pylist()
        w2 = t.column("w2").cast(pa.string()).to_pylist()
        return pa.table({"key": pa.array(
            [a + "|" + b for a, b in zip(w1, w2)], type=pa.string())})

    closed = adaptive_join(
        wedged.map_batches(wedge_keys, batch_format="pyarrow"),
        edges.map_batches(edge_keys, batch_format="pyarrow"),
        on="key", num_partitions=nparts)

    def emit(t: pa.Table) -> pa.Table:
        lo = t.column("lo").cast(pa.string()).to_pylist()
        key = t.column("key").cast(pa.string()).to_pylist()
        tri = [sorted([l0] + k.split("|")) for l0, k in zip(lo, key)]
        return pa.table({
            "w1": pa.array([x[0] for x in tri], type=pa.string()),
            "w2": pa.array([x[1] for x in tri], type=pa.string()),
            "w3": pa.array([x[2] for x in tri], type=pa.string())})

    return closed.map_batches(emit, batch_format="pyarrow")
