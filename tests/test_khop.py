"""K-hop subgraph extraction (stages/graph.py::khop_subgraph)."""

import numpy as np
import pyarrow as pa


def _edges_tbl(rows):
    return pa.table({
        "subj_id": pa.array([r[0] for r in rows]),
        "pred": pa.array([r[1] for r in rows]),
        "obj_id": pa.array([r[2] for r in rows]),
        "n": pa.array([1] * len(rows), type=pa.int64())})


def _brute_khop(rows, seeds, hops):
    visited, frontier = set(seeds), set(seeds)
    touched = set()
    for _ in range(hops):
        hop = {i for i, r in enumerate(rows)
               if r[0] in frontier or r[2] in frontier}
        touched |= hop
        reached = {r[j] for i in hop for j in (0, 2)
                   for r in [rows[i]]}
        frontier = reached - visited
        visited |= reached
    return {rows[i] for i in touched}


def test_khop_matches_bruteforce(ray_session):
    import ray.data

    from ie_ray.stages.graph import khop_subgraph

    rng = np.random.RandomState(41)
    nodes = ["e%d" % i for i in range(60)]
    rows = sorted({(nodes[rng.randint(60)], "p%d" % rng.randint(3),
                    nodes[rng.randint(60)]) for _ in range(300)})
    ds = ray.data.from_arrow(_edges_tbl(rows)).repartition(5)
    for seeds, hops in ([["e0"], 1], [["e0", "e7"], 2], [["e3"], 3]):
        got = {(r["subj_id"], r["pred"], r["obj_id"])
               for r in khop_subgraph(ds, seeds, hops=hops).take_all()}
        assert got == _brute_khop(rows, set(seeds), hops), (seeds, hops)


def test_khop_isolated_seed(ray_session):
    import ray.data

    from ie_ray.stages.graph import khop_subgraph

    ds = ray.data.from_arrow(_edges_tbl([("a", "p", "b")]))
    assert khop_subgraph(ds, ["zzz"], hops=2).count() == 0
