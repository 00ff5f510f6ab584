"""Exact heavy hitters via mergeable MG summaries vs DuckDB, including
an adversarial split where a true heavy hitter is minority in EVERY
block (the case a naive per-block top-k loses)."""

import duckdb
import pyarrow as pa
import pytest

from ie_ray.stages.sketches import heavy_hitters, heavy_hitters_oracle_sql


def _check(docs: pa.Table, phi: float, k: int, n_blocks: int):
    import ray.data
    ds = ray.data.from_arrow(docs).repartition(n_blocks)
    got = [(r["word"], r["n"])
           for r in heavy_hitters(ds, phi=phi, k=k).take_all()]
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(heavy_hitters_oracle_sql(phi)).fetchall()
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_matches_duckdb_exactly():
    docs = pa.table({"text": pa.array(
        ["alpha beta alpha", "beta gamma delta beta", "alpha beta",
         "epsilon zeta eta theta iota kappa"])})
    _check(docs, phi=0.1, k=16, n_blocks=3)


@pytest.mark.usefixtures("ray_session")
def test_hitter_spread_thin_across_blocks():
    # 'rare' is the 4th-most-common word in every block but a global
    # heavy hitter; per-block top-3 would drop it — MG with k ≥ 1/phi
    # must not.
    blocks = []
    for i in range(8):
        fill = " ".join("f%d_%d" % (i, j) for j in range(30))
        blocks.append("a a a a b b b b c c c c rare rare rare " + fill)
    docs = pa.table({"text": pa.array(blocks)})
    _check(docs, phi=0.05, k=64, n_blocks=8)
    con = duckdb.connect()
    con.register("documents", docs)
    want = dict(con.sql(heavy_hitters_oracle_sql(0.05)).fetchall())
    assert "rare" in want
