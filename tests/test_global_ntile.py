"""Global ntile via bin-rank vs DuckDB, including heavy ties and
n not divisible by k."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from ie_ray.stages.relational import global_ntile


def _check(vals, k, bins):
    import ray.data
    t = pa.table({"id": pa.array(range(len(vals)), type=pa.int64()),
                  "v": pa.array(np.asarray(vals, dtype=np.float64))})
    ds = ray.data.from_arrow(t).repartition(5)
    got = sorted((r["id"], r["tile"])
                 for r in global_ntile(ds, "v", "id", k=k,
                                       bins=bins).take_all())
    con = duckdb.connect()
    con.register("t", t)
    want = sorted(con.sql(
        "SELECT id, ntile(%d) OVER (ORDER BY v, id) FROM t" % k)
        .fetchall())
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_matches_duckdb_uneven_split():
    rng = np.random.RandomState(11)
    _check(rng.lognormal(0, 2, 1003), k=4, bins=64)   # 1003 % 4 != 0


@pytest.mark.usefixtures("ray_session")
def test_heavy_ties_one_bin():
    # 90% identical values concentrate in one bin — ranks must still
    # be exact (id tie-break) and match DuckDB
    vals = [5.0] * 900 + list(np.linspace(0, 10, 100))
    _check(vals, k=7, bins=16)
