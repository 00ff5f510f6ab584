"""Salted two-stage map_groups equals the direct reduction on a
Zipf-skewed key distribution (one key owns 85% of rows)."""

import numpy as np
import pyarrow as pa
import pytest

from ie_ray.stages.relational import salted_map_groups


@pytest.mark.usefixtures("ray_session")
def test_salted_equals_direct_on_hot_key():
    import ray.data

    def merge_agg(g: pa.Table) -> pa.Table:
        # mergeable: works on raw rows (k, v) AND on partials (k, n, s)
        import pyarrow.compute as pc
        raw = "v" in g.column_names
        n = (g.num_rows if raw
             else int(pc.sum(g.column("n")).as_py()))
        s = float(pc.sum(g.column("v" if raw else "s")).as_py())
        return pa.table({
            "k": g.slice(0, 1).column("k"),
            "n": pa.array([n], type=pa.int64()),
            "s": pa.array([s], type=pa.float64())})

    rng = np.random.RandomState(0)
    hot = 34_000
    ks = ["hot"] * hot + ["k%d" % i for i in rng.randint(0, 100, 6000)]
    vs = rng.rand(len(ks))
    ds = ray.data.from_arrow(pa.table({"k": ks, "v": vs})).repartition(8)
    got = {r["k"]: (r["n"], r["s"])
           for r in salted_map_groups(ds, "k", merge_agg,
                                      salts=8).take_all()}
    want = {}
    for k, v in zip(ks, vs):
        n, s = want.get(k, (0, 0.0))
        want[k] = (n + 1, s + v)
    assert got["hot"][0] == hot
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-5
