"""Borůvka minimum spanning forest vs a Kruskal twin."""

import numpy as np
import pyarrow as pa


def _kruskal(rows):
    """(w1, w2, weight) rows → frozenset of chosen edges."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    chosen = set()
    for w1, w2, w in sorted(rows, key=lambda r: (r[2], r[0], r[1])):
        a, b = find(w1), find(w2)
        if a != b:
            parent[a] = b
            chosen.add((w1, w2, w))
    return chosen


def _ds(rows, parts=5):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "w1": pa.array([r[0] for r in rows]),
        "w2": pa.array([r[1] for r in rows]),
        "weight": pa.array([r[2] for r in rows], type=pa.int64()),
    })).repartition(parts)


def test_msf_matches_kruskal_random(ray_session):
    from ie_ray.stages.msf import minimum_spanning_forest

    rng = np.random.RandomState(71)
    nodes = ["n%02d" % i for i in range(40)]
    rows = sorted({(nodes[a], nodes[b], int(w))
                   for a, b, w in zip(rng.randint(0, 40, 300),
                                      rng.randint(0, 40, 300),
                                      rng.randint(1, 50, 300))
                   if a < b})
    forest, converged = minimum_spanning_forest(_ds(rows))
    got = {(r["w1"], r["w2"], r["weight"])
           for r in forest.take_all()}
    want = _kruskal(rows)
    # unique-by-tie-break forest: same edge SET, not just same weight
    assert got == want and converged


def test_msf_multi_component_and_ties(ray_session):
    from ie_ray.stages.msf import minimum_spanning_forest

    # two disconnected components + heavy equal-weight ties
    rows = [("a", "b", 1), ("b", "c", 1), ("a", "c", 1),
            ("x", "y", 2), ("y", "z", 2), ("x", "z", 2)]
    forest, converged = minimum_spanning_forest(_ds(rows, parts=3))
    got = {(r["w1"], r["w2"], r["weight"])
           for r in forest.take_all()}
    assert got == _kruskal(rows) and converged
    assert len(got) == 4   # (3-1) + (3-1) edges


def test_msf_block_layout_invariant(ray_session):
    from ie_ray.stages.msf import minimum_spanning_forest

    rng = np.random.RandomState(73)
    nodes = ["m%02d" % i for i in range(20)]
    rows = sorted({(nodes[a], nodes[b], int(w))
                   for a, b, w in zip(rng.randint(0, 20, 120),
                                      rng.randint(0, 20, 120),
                                      rng.randint(1, 9, 120))
                   if a < b})
    outs = []
    for parts in (1, 7):
        forest, _ = minimum_spanning_forest(_ds(rows, parts))
        outs.append(sorted((r["w1"], r["w2"], r["weight"])
                           for r in forest.take_all()))
    assert outs[0] == outs[1]
