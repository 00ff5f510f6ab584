"""Distributed PCA over an embedding column.

The classic one-pass recipe: every block reduces to the sufficient
statistics (n, Σx, Σxxᵀ) — O(d²) doubles per block regardless of block
size — the driver combines them (blocks × d² is tiny), eigendecomposes
the d×d covariance, and the top-k components broadcast back for a
streaming projection.  This is how PCA is run at any scale where the
data can't be materialized: only the d×d moment matrix is ever
centralized.

Sign convention: each eigenvector is flipped so its
largest-absolute-value entry is positive (eigenvectors are only defined
up to sign).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mat(batch: pa.Table) -> np.ndarray:
    return np.asarray(batch.column("embedding").to_pylist(),
                      dtype=np.float64)


def moment_partials(batch: pa.Table) -> pa.Table:
    """(n, Σx, flattened Σxxᵀ) as one row per block."""
    m = _mat(batch)
    return pa.table({
        "n": pa.array([m.shape[0]], type=pa.int64()),
        "sx": pa.array([m.sum(axis=0).tolist()],
                       type=pa.list_(pa.float64())),
        "sxx": pa.array([(m.T @ m).ravel().tolist()],
                        type=pa.list_(pa.float64()))})


def fit_pca(emb_ds, k: int = 2):
    """Returns (components [k×d], explained_variance [k], mean [d]).

    The only driver-side data is the per-block moment rows (O(blocks·d²)
    doubles); `take_all` here is the bounded-summary pull, not a corpus
    materialization."""
    rows = emb_ds.map_batches(moment_partials,
                              batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    sx = np.sum([np.asarray(r["sx"]) for r in rows], axis=0)
    d = sx.shape[0]
    sxx = np.sum([np.asarray(r["sxx"]).reshape(d, d) for r in rows],
                 axis=0)
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return comps, vals[order], mean


def project(emb_ds, components: np.ndarray, mean: np.ndarray,
            id_col: str = "vec_id", ndigits: int = 6):
    """Streaming projection onto the (broadcast-in-closure) components."""
    import ray as _ray
    ref = _ray.put((components, mean))

    def proj(batch: pa.Table) -> pa.Table:
        comps, mu = _ray.get(ref)
        m = _mat(batch) - mu
        p = np.round(m @ comps.T, ndigits)
        cols = {id_col: batch.column(id_col)}
        for i in range(comps.shape[0]):
            cols["pc%d" % (i + 1)] = pa.array(p[:, i], type=pa.float64())
        return pa.table(cols)

    return emb_ds.map_batches(proj, batch_format="pyarrow")


def covariance_rows(emb_ds, dims: int, ndigits: int = 6):
    """Population covariance entries cov(i, j) for the first ``dims``
    dimensions (i <= j, 1-based) as rows — the SQL-verifiable face of the
    moment-matrix pass above."""
    def partials(batch: pa.Table) -> pa.Table:
        m = _mat(batch)[:, :dims]
        sxx = m.T @ m
        sx = m.sum(axis=0)
        ii, jj = np.triu_indices(dims)
        return pa.table({
            "i": pa.array(ii + 1, type=pa.int64()),
            "j": pa.array(jj + 1, type=pa.int64()),
            "sxy": pa.array(sxx[ii, jj], type=pa.float64()),
            "sxi": pa.array(sx[ii], type=pa.float64()),
            "sxj": pa.array(sx[jj], type=pa.float64()),
            "n": pa.array(np.full(len(ii), m.shape[0]),
                          type=pa.int64())})

    agg = emb_ds.map_batches(partials, batch_format="pyarrow") \
        .groupby(["i", "j"]).sum(["sxy", "sxi", "sxj", "n"])

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = np.asarray(t.column("sum(n)"), dtype=np.float64)
        cov = np.asarray(t.column("sum(sxy)")) / n - \
            (np.asarray(t.column("sum(sxi)")) / n) * \
            (np.asarray(t.column("sum(sxj)")) / n)
        return pa.table({
            "i": t.column("i"), "j": t.column("j"),
            "cov": pc.round(pa.array(cov, type=pa.float64()), ndigits,
                            round_mode="half_towards_infinity")})

    return agg.map_batches(finish, batch_format="pyarrow")
