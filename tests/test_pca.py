"""NumPy twins for the distributed PCA moment pass and projection."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ie_ray.stages.pca import covariance_rows, fit_pca, project


def _emb_ds(m, blocks=4):
    t = pa.table({
        "vec_id": pa.array(range(m.shape[0]), type=pa.int64()),
        "embedding": pa.array([row.tolist() for row in m],
                              type=pa.list_(pa.float32()))})
    return ray.data.from_arrow(t).repartition(blocks)


def test_fit_matches_numpy():
    rng = np.random.RandomState(11)
    base = rng.randn(200, 6) @ np.diag([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    m = base.astype(np.float32)
    comps, ev, mean = fit_pca(_emb_ds(m), k=3)

    x = m.astype(np.float64)
    cov = np.cov(x, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    ref = vecs[:, order].T
    flip = np.sign(ref[np.arange(3), np.abs(ref).argmax(axis=1)])
    ref = ref * flip[:, None]

    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    assert np.allclose(ev, vals[order], atol=1e-9)
    assert np.allclose(comps, ref, atol=1e-7)


def test_project_orthogonal_variance_order():
    rng = np.random.RandomState(5)
    m = (rng.randn(300, 8) * np.linspace(4, 0.1, 8)).astype(np.float32)
    ds = _emb_ds(m)
    comps, ev, mean = fit_pca(ds, k=2)
    rows = project(ds, comps, mean).to_pandas().sort_values("vec_id")
    p1, p2 = rows["pc1"].to_numpy(), rows["pc2"].to_numpy()
    assert p1.var() > p2.var()                      # variance ordering
    assert abs(np.mean(p1 * p2)) < 1e-3             # decorrelated
    assert p1.var() == pytest.approx(ev[0], rel=1e-3)


def test_covariance_rows_match_numpy():
    rng = np.random.RandomState(2)
    m = rng.randn(150, 5).astype(np.float32)
    got = {(r["i"], r["j"]): r["cov"]
           for r in covariance_rows(_emb_ds(m), dims=4).take_all()}
    cov = np.cov(m.astype(np.float64), rowvar=False, bias=True)
    for i in range(4):
        for j in range(i, 4):
            assert got[(i + 1, j + 1)] == pytest.approx(
                round(cov[i, j], 6), abs=2e-6)
