"""Mergeable quantile digest: rank-error gate vs exact, determinism."""

import numpy as np
import pyarrow as pa
import pytest

from ie_ray.stages.sketches import quantile_digest


@pytest.mark.usefixtures("ray_session")
def test_rank_error_within_gate():
    import ray.data
    rng = np.random.RandomState(3)
    gs, vs = [], []
    data = {}
    for g in ("a", "b", "c"):
        v = rng.lognormal(2 + ord(g) % 3, 1.0, 20000)
        data[g] = np.sort(v)
        gs += [g] * len(v)
        vs.append(v)
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(gs), "v": pa.array(np.concatenate(vs))
    })).repartition(8)
    rows = {r["g"]: r for r in quantile_digest(
        ds, "v", "g", [0.5, 0.95], k=128).take_all()}
    for g, sorted_v in data.items():
        n = len(sorted_v)
        for q in (0.5, 0.95):
            est = rows[g]["q_%g" % q]
            rank = np.searchsorted(sorted_v, est) / n
            assert abs(rank - q) <= 0.03, (g, q, est, rank)


@pytest.mark.usefixtures("ray_session")
def test_deterministic_and_small_groups_exact():
    import ray.data
    t = pa.table({"g": pa.array(["x"] * 5),
                  "v": pa.array([1.0, 2.0, 3.0, 4.0, 100.0])})
    ds = ray.data.from_arrow(t)
    r1 = quantile_digest(ds, "v", "g", [0.5], k=16).take_all()
    r2 = quantile_digest(ds, "v", "g", [0.5], k=16).take_all()
    assert r1 == r2
    # 5 points < k ⇒ digest is lossless; median interpolates exactly
    assert r1[0]["q_0.5"] == 3.0
