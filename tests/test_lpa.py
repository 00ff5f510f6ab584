"""Deterministic label-propagation communities (stages/community.py):
brute-force twin vs the distributed rounds, DuckDB parity via the
unrolled SQL, and the semantic gate that separates LPA from connected
components (bridge-joined cliques keep distinct labels)."""

import duckdb
import pyarrow as pa
import ray

from ie_ray.stages.community import (lpa_bruteforce, lpa_labels,
                                     lpa_oracle_sql)

# two 4-cliques joined by the single bridge d-e
CLIQUES = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
           ("c", "d"), ("e", "f"), ("e", "g"), ("e", "h"), ("f", "g"),
           ("f", "h"), ("g", "h"), ("d", "e")]


def _dist(edge_list, rounds=5):
    t = pa.table({"w1": pa.array([a for a, _ in edge_list],
                                 type=pa.string()),
                  "w2": pa.array([b for _, b in edge_list],
                                 type=pa.string())})
    ds = ray.data.from_arrow(t).repartition(3)
    out = {}
    for blk in lpa_labels(ds, rounds=rounds) \
            .iter_batches(batch_format="pyarrow"):
        if blk.num_rows and "node" in blk.column_names:
            out.update(zip(blk.column("node").to_pylist(),
                           blk.column("community").to_pylist()))
    return dict(sorted(out.items()))


def test_distributed_matches_bruteforce_cliques(ray_session):
    assert _dist(CLIQUES) == lpa_bruteforce(CLIQUES)


def test_lpa_splits_bridge_joined_cliques(ray_session):
    """The reason LPA ≠ CC: the bridge label is outvoted."""
    got = _dist(CLIQUES)
    left = {got[n] for n in "abcd"}
    right = {got[n] for n in "efgh"}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_matches_duckdb_unrolled_oracle(ray_session):
    vals = ", ".join("('%s', '%s')" % e for e in CLIQUES)
    sql = lpa_oracle_sql(
        "e(w1, w2) AS (SELECT * FROM (VALUES %s) AS t(w1, w2))" % vals,
        rounds=5)
    con = duckdb.connect()
    want = dict(con.sql(sql).fetchall())
    assert _dist(CLIQUES) == dict(sorted(want.items()))


def test_random_graph_matches_bruteforce(ray_session):
    import random
    rng = random.Random(23)
    nodes = ["n%02d" % i for i in range(40)]
    edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                    for _ in range(120)})
    assert _dist(edges, rounds=4) == lpa_bruteforce(edges, rounds=4)
