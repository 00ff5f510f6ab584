"""Distributed minimum spanning forest (Borůvka) over an edge Dataset.

Borůvka 1926 is THE shared-nothing MST algorithm (each round every
component selects its cheapest outgoing edge; selected edges merge
components; O(log n) rounds) — unlike Prim/Kruskal it needs no global
priority queue or sorted edge stream, so every step maps onto the
primitives this repo already has:

* labels live as a ``(node, comp)`` Dataset (never on the driver);
* "cheapest outgoing edge per component" is one EXPLODE (each
  cross-edge charged to both endpoint components) + the bucketed
  per-key argmin (rows-sized component domain);
* "merge components" is the existing hash-min
  :func:`ie_ray.stages.link.connected_components` run on the SELECTED
  edge set (≤ one edge per component), composed back onto the full
  label table with one hash join per round.

Determinism: ties break on (weight, w1, w2) total order, so the forest
is unique even with equal weights.  Rounds are capped at 20 = log₂ of
a 10⁶-node largest COMPONENT (each round at least halves the number
of components inside every connected region — the bound is component
SIZE, not count); the loop exits early on convergence, and when the
cap is exhausted one final cross-edge check sets the truthful
convergence flag.  Each round also REPLACES the working edge set with
the surviving cross edges — intra-component edges can never become
cross edges again, so join work shrinks with the merge progress.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _labels_identity(edges):
    """(node, comp=node) for every endpoint."""
    def ends(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([
            t.column("w1").combine_chunks().cast(pa.string()),
            t.column("w2").combine_chunks().cast(pa.string())])
        u = both.unique()
        return pa.table({"node": u, "comp": u})

    def dedup(t: pa.Table) -> pa.Table:
        import polars as pl
        return pl.from_arrow(t).unique("node").to_arrow()

    from ie_ray.stages.relational import bucketed_map_groups
    return bucketed_map_groups(
        edges.map_batches(ends, batch_format="pyarrow"), "node",
        dedup)


def minimum_spanning_forest(edges, rounds: int = 20):
    """Edges ``(w1: string, w2: string, weight: int64)`` →
    (forest Dataset with the same schema, converged: bool).

    The forest has one row per chosen edge (each exactly once,
    w1 < w2 preserved from the input contract)."""
    import polars as pl
    import pyarrow.compute as pc

    from ie_ray.stages.link import connected_components
    from ie_ray.stages.relational import (adaptive_join,
                                          bucketed_map_groups)

    edges = edges.materialize()
    labels = _labels_identity(edges).materialize()
    chosen = None
    converged = False

    for _ in range(rounds):
        # decorate both endpoints with their component
        lab1 = labels.map_batches(
            lambda t: pa.table({"w1": t.column("node"),
                                "c1": t.column("comp")}),
            batch_format="pyarrow").materialize()
        lab2 = labels.map_batches(
            lambda t: pa.table({"w2": t.column("node"),
                                "c2": t.column("comp")}),
            batch_format="pyarrow").materialize()
        dec = adaptive_join(adaptive_join(edges, lab1, on="w1"),
                            lab2, on="w2")
        cross = dec.filter(
            expr="c1 != c2").materialize()
        if cross.count() == 0:
            converged = True
            break

        # charge each cross edge to BOTH its components, then the
        # cheapest (weight, w1, w2) edge per component
        def explode(t: pa.Table) -> pa.Table:
            base = {c: pa.concat_arrays(
                [t.column(c).combine_chunks(),
                 t.column(c).combine_chunks()])
                for c in ("w1", "w2", "weight")}
            base["comp"] = pa.concat_arrays([
                t.column("c1").combine_chunks().cast(pa.string()),
                t.column("c2").combine_chunks().cast(pa.string())])
            return pa.table(base)

        def per_comp_min(g: pa.Table) -> pa.Table:
            df = pl.from_arrow(g)
            return (df.sort(["comp", "weight", "w1", "w2"])
                    .group_by("comp", maintain_order=True)
                    .first()).drop("comp").to_arrow()

        sel = bucketed_map_groups(
            cross.map_batches(explode, batch_format="pyarrow"),
            "comp", per_comp_min)

        # a selected edge may be chosen by both endpoints — dedup
        def dedup_edges(t: pa.Table) -> pa.Table:
            return pl.from_arrow(t).unique(
                ["w1", "w2", "weight"]).to_arrow()

        sel = bucketed_map_groups(sel, ["w1", "w2"], dedup_edges) \
            .materialize()
        chosen = sel if chosen is None else chosen.union(sel)
        # intra-component edges never come back: iterate on the
        # surviving cross set only (review finding r5s4)
        edges = cross.select_columns(["w1", "w2", "weight"]) \
            .materialize()

        # merge: CC over the selection graph ON COMPONENT IDS, then
        # compose onto the node labels with one hash join
        comp_edges = adaptive_join(
            adaptive_join(sel, lab1, on="w1"), lab2, on="w2") \
            .map_batches(lambda t: pa.table({
                "a": t.column("c1").cast(pa.string()),
                "b": t.column("c2").cast(pa.string())}),
                batch_format="pyarrow")
        cc_rows = connected_components(comp_edges).map_batches(
            lambda t: pa.table({
                "comp": t.column("node").cast(pa.string()),
                "new_comp": t.column("component").cast(pa.string()),
                "pri": pa.array(np.zeros(t.num_rows,
                                         dtype=np.int64))}),
            batch_format="pyarrow")
        # make the map TOTAL: identity rows for every component, CC
        # rows winning on priority (string comp keys rule out the
        # int-keyed anti_join here)
        ident = labels.map_batches(
            lambda t: (lambda u: pa.table({
                "comp": u, "new_comp": u,
                "pri": pa.array(np.ones(len(u), dtype=np.int64))}))(
                t.column("comp").combine_chunks().unique()),
            batch_format="pyarrow")

        def pick(g: pa.Table) -> pa.Table:
            df = pl.from_arrow(g)
            return (df.sort(["comp", "pri"])
                    .group_by("comp", maintain_order=True)
                    .first()).drop("pri").to_arrow()

        total_map = bucketed_map_groups(cc_rows.union(ident), "comp",
                                        pick).materialize()
        relabeled = adaptive_join(labels, total_map, on="comp")
        labels = relabeled.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "comp": t.column("new_comp").cast(pa.string())}),
            batch_format="pyarrow").materialize()

    if not converged:
        # cap exhausted: one final check so the flag is truthful even
        # when the last round completed the forest (review finding)
        lab1 = labels.map_batches(
            lambda t: pa.table({"w1": t.column("node"),
                                "c1": t.column("comp")}),
            batch_format="pyarrow").materialize()
        lab2 = labels.map_batches(
            lambda t: pa.table({"w2": t.column("node"),
                                "c2": t.column("comp")}),
            batch_format="pyarrow").materialize()
        converged = adaptive_join(
            adaptive_join(edges, lab1, on="w1"), lab2,
            on="w2").filter(expr="c1 != c2").count() == 0

    if chosen is None:
        chosen = edges.limit(0)

    # final global dedup — canonicalizes block layout for
    # deterministic output
    def final_dedup(t: pa.Table) -> pa.Table:
        return pl.from_arrow(t).unique(["w1", "w2", "weight"]) \
            .to_arrow()

    return bucketed_map_groups(chosen, ["w1", "w2"],
                               final_dedup), converged
