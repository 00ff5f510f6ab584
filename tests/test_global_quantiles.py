"""Exact distributed quantile selection vs NumPy linear interpolation."""

import numpy as np
import pyarrow as pa
import pytest

from ie_ray.stages.relational import global_quantiles


@pytest.mark.usefixtures("ray_session")
def test_refinement_matches_numpy():
    import ray.data
    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.lognormal(3, 1.5, 5000),
                           np.full(2000, 42.0),      # heavy duplicate mass
                           rng.uniform(-10, 0, 500)])
    ds = ray.data.from_arrow(pa.table({"value": vals})).repartition(8)
    # max_pull=64 forces several histogram-refinement rounds
    got = global_quantiles(ds, "value", [0.0, 0.25, 0.5, 0.9, 0.99, 1.0],
                           bins=16, max_pull=64)
    for q, v in got.items():
        want = float(np.percentile(vals, q * 100, method="linear"))
        assert abs(v - want) <= max(abs(want), 1.0) * 1e-9, (q, v, want)


@pytest.mark.usefixtures("ray_session")
def test_all_equal_column():
    import ray.data
    ds = ray.data.from_arrow(pa.table({"value": np.full(1000, 5.5)}))
    got = global_quantiles(ds, "value", [0.5, 0.99], bins=8, max_pull=10)
    assert got[0.5] == 5.5 and got[0.99] == 5.5
