"""Numerically robust distributed moments (mean / variance / covariance).

Naive sufficient statistics (n, Σx, Σx²) cancel catastrophically when
the data sit far from zero: with values offset by 1e9, Σx² ≈ n·1e18
holds ~16 significant digits, so the variance term Σx² − (Σx)²/n loses
ALL of them long before 10⁷ rows.  The standard fix (Chan, Golub &
LeVeque 1983, "Algorithms for computing the sample variance") keeps
per-partition CENTERED moments — (n, mean, M2 = Σ(x−mean)²) — and
merges partitions with the pairwise update

    δ = mean_b − mean_a
    M2 = M2_a + M2_b + δ² · n_a·n_b/(n_a+n_b)

which is exact in exact arithmetic and stable in floating point at any
offset.  The bivariate form carries (n, mean_x, mean_y, M2x, M2y, Cxy)
and yields covariance / Pearson correlation the same way.

Scale contract: each block contributes ONE moment row per group (the
key domains here are bounded — event types, labels), so the exchange
moves O(blocks × groups) tiny rows and the driver merge holds
O(groups) floats.  Used by the z-score / correlation queries in
``__ray_entry__.py`` (round-4 fp-hygiene sweep, VERDICT r3 next #8).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pyarrow as pa


def merge_moments(a: Tuple[float, float, float],
                  b: Tuple[float, float, float]) -> Tuple[float, float, float]:
    """Chan pairwise merge of (n, mean, M2) partials."""
    na, ma, m2a = a
    nb, mb, m2b = b
    if na == 0:
        return b
    if nb == 0:
        return a
    n = na + nb
    d = mb - ma
    mean = ma + d * nb / n
    m2 = m2a + m2b + d * d * na * nb / n
    return (n, mean, m2)


def merge_comoments(a, b):
    """Chan pairwise merge of bivariate (n, mx, my, M2x, M2y, Cxy)."""
    na, mxa, mya, m2xa, m2ya, ca = a
    nb, mxb, myb, m2xb, m2yb, cb = b
    if na == 0:
        return b
    if nb == 0:
        return a
    n = na + nb
    dx = mxb - mxa
    dy = myb - mya
    f = na * nb / n
    return (n,
            mxa + dx * nb / n,
            mya + dy * nb / n,
            m2xa + m2xb + dx * dx * f,
            m2ya + m2yb + dy * dy * f,
            ca + cb + dx * dy * f)


def block_moments_by(t: pa.Table, key: str, col: str) -> pa.Table:
    """One (key, n, mean, M2) row per group present in the block —
    vectorized with np.bincount over factorized keys."""
    v = np.asarray(t.column(col), dtype=np.float64)
    keys = t.column(key).to_pylist()
    uk, inv = np.unique(np.asarray(keys, dtype=object), return_inverse=True)
    n = np.bincount(inv, minlength=len(uk)).astype(np.float64)
    s = np.bincount(inv, weights=v, minlength=len(uk))
    mean = s / n
    dev = v - mean[inv]
    m2 = np.bincount(inv, weights=dev * dev, minlength=len(uk))
    return pa.table({
        key: pa.array(list(uk), type=t.column(key).type),
        "n": pa.array(n, type=pa.float64()),
        "mean": pa.array(mean, type=pa.float64()),
        "m2": pa.array(m2, type=pa.float64())})


def block_comoments_by(t: pa.Table, key: str, xcol_vals: np.ndarray,
                       ycol_vals: np.ndarray) -> pa.Table:
    """One (key, n, mx, my, m2x, m2y, cxy) row per group in the block."""
    keys = t.column(key).to_pylist()
    uk, inv = np.unique(np.asarray(keys, dtype=object), return_inverse=True)
    n = np.bincount(inv, minlength=len(uk)).astype(np.float64)
    mx = np.bincount(inv, weights=xcol_vals, minlength=len(uk)) / n
    my = np.bincount(inv, weights=ycol_vals, minlength=len(uk)) / n
    dx = xcol_vals - mx[inv]
    dy = ycol_vals - my[inv]
    return pa.table({
        key: pa.array(list(uk), type=t.column(key).type),
        "n": pa.array(n, type=pa.float64()),
        "mx": pa.array(mx, type=pa.float64()),
        "my": pa.array(my, type=pa.float64()),
        "m2x": pa.array(np.bincount(inv, weights=dx * dx,
                                    minlength=len(uk)), type=pa.float64()),
        "m2y": pa.array(np.bincount(inv, weights=dy * dy,
                                    minlength=len(uk)), type=pa.float64()),
        "cxy": pa.array(np.bincount(inv, weights=dx * dy,
                                    minlength=len(uk)), type=pa.float64())})


def reduce_grouped_moments(moment_rows) -> Dict:
    """Driver-side fold of (key, n, mean, m2) rows → key → (n, mean, m2).
    O(groups) driver state — callers guarantee a bounded key domain."""
    agg: Dict = {}
    for r in moment_rows:
        k = r[0]
        cur = agg.get(k, (0.0, 0.0, 0.0))
        agg[k] = merge_moments(cur, tuple(r[1:]))
    return agg


def reduce_grouped_comoments(rows) -> Dict:
    agg: Dict = {}
    for r in rows:
        k = r[0]
        cur = agg.get(k, (0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
        agg[k] = merge_comoments(cur, tuple(r[1:]))
    return agg
