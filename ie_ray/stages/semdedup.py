"""SemDeDup — semantic deduplication over an embedding column.

Public recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540):
k-means clusters the corpus in embedding space, then near-duplicate
pruning runs only WITHIN each cluster — the quadratic all-pairs
problem becomes k independent O(c²) blocks, which is what makes
embedding-level dedup tractable at web scale.

Ray shape (scale notes):
* centroids come from :func:`ie_ray.stages.clustering.kmeans_fit`
  (broadcast-refine Lloyd rounds; the driver only ever holds the
  O(k × dim) centroid matrix and O(k × blocks) partials);
* assignment is one stateless ``map_batches`` against the broadcast
  centroid matrix (one matmul per batch, embeddings carried along);
* the per-cluster greedy prune is one vectorized NumPy kernel per
  COMPLETE key-hash bucket (``bucketed_map_groups`` on the cluster
  id), so a cluster never spans tasks and no row reaches the driver.

Determinism (pinned by the NumPy twin in tests/test_semdedup.py):
greedy order within a cluster is (distance-to-centroid DESC, vec_id
ASC) — the paper's keep-the-example-farthest-from-the-centroid rule
made a total order — and a row is dropped iff its cosine similarity
to an already-KEPT row of the same cluster is ≥ ``tau``.

Skew: per-cluster time is O(c · kept · dim) with O(c · dim) memory —
the greedy compares each candidate only against the kept-so-far
matrix, never materializing a c×c similarity matrix.  Pick
``k ≈ n / target_c`` so the expected cluster size keeps that budget
inside one task (the paper runs ~100k clusters for ~100M points); a
pathological mega-cluster is truncated to its first ``cluster_cap``
rows in greedy order and every overflow row is KEPT and flagged
``capped`` — dedup degrades to a no-op there rather than a time
blow-up, and the flag makes the truncation visible instead of silent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .clustering import _assign, _embeddings_matrix, kmeans_fit
from .relational import bucketed_map_groups


class _AssignCarry:
    """(vec_id, cluster, dist, embedding) — assignment plus the
    payload the per-cluster kernel needs, one matmul per batch."""

    def __init__(self, cref):
        self._cref = cref
        self._c = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray
        if self._c is None:
            self._c = ray.get(self._cref)
        m = _embeddings_matrix(batch)
        a = _assign(m, self._c)
        d = np.linalg.norm(m - self._c[a], axis=1)
        return pa.table({
            "vec_id": batch.column("vec_id").cast(pa.int64()),
            "cluster": pa.array(a, type=pa.int64()),
            "dist": pa.array(d, type=pa.float64()),
            "embedding": batch.column("embedding")})


def _prune_cluster(ids, dist, emb, tau, cluster_cap):
    """Greedy within-cluster prune; returns (keep, capped) bools in
    input order.

    Memory: the candidate's similarities are computed INCREMENTALLY
    against the kept-so-far matrix (one vector × kept-matrix product
    per row), never as a full c×c similarity matrix — a 50k-row
    cluster would otherwise allocate ~20 GB before the cap could
    help.  Peak extra memory is O(c · dim); worst-case time stays
    O(c · kept · dim) and ``cluster_cap`` bounds it."""
    order = np.lexsort((ids, -dist))
    n = len(ids)
    keep = np.ones(n, dtype=bool)
    capped = np.zeros(n, dtype=bool)
    head, tail = order[:cluster_cap], order[cluster_cap:]
    capped[tail] = True  # kept but not deduped (documented degradation)
    x = emb[head]
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0.0] = 1.0
    xn = x / norms[:, None]
    kept = np.empty_like(xn)
    n_kept = 0
    for i in range(len(head)):
        if n_kept and (kept[:n_kept] @ xn[i]).max() >= tau:
            keep[head[i]] = False
        else:
            kept[n_kept] = xn[i]
            n_kept += 1
    return keep, capped


def semdedup(ds, k: int = 8, iters: int = 5, tau: float = 0.95,
             cluster_cap: int = 65536, parts: int = 64):
    """(vec_id, cluster, keep, capped) for every input row.

    ``ds`` needs columns ``vec_id`` and ``embedding``; downstream an
    anti-join of ``keep == False`` ids against the document table
    applies the prune (same join shape as ``minhash_dedup_keep``)."""
    import ray

    centroids = kmeans_fit(ds, k=k, iters=iters)
    assigned = ds.map_batches(_AssignCarry(ray.put(centroids)),
                              batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        out_ids: list[np.ndarray] = []
        out_cl: list[np.ndarray] = []
        out_keep: list[np.ndarray] = []
        out_cap: list[np.ndarray] = []
        if g.num_rows:
            ids = np.asarray(g.column("vec_id"))
            cl = np.asarray(g.column("cluster"))
            dist = np.asarray(g.column("dist"))
            emb = np.asarray(g.column("embedding").to_pylist(),
                             dtype=np.float64)
            for c in np.unique(cl):
                sel = cl == c
                keep, capped = _prune_cluster(
                    ids[sel], dist[sel], emb[sel], tau, cluster_cap)
                out_ids.append(ids[sel])
                out_cl.append(np.full(int(sel.sum()), c,
                                      dtype=np.int64))
                out_keep.append(keep)
                out_cap.append(capped)
        cat = (lambda xs, ty: pa.array(
            np.concatenate(xs) if xs else np.array([], dtype=ty)))
        return pa.table({
            "vec_id": cat(out_ids, np.int64),
            "cluster": cat(out_cl, np.int64),
            "keep": cat(out_keep, bool),
            "capped": cat(out_cap, bool)})

    return bucketed_map_groups(assigned, "cluster", per_bucket,
                               parts=parts)


def semdedup_reference(vec_ids, m, k: int = 8, iters: int = 5,
                       tau: float = 0.95, cluster_cap: int = 65536):
    """Single-process NumPy twin (same seeding, same Lloyd loop, same
    greedy order as the distributed path).  Agreement caveat: the
    distributed fit merges per-block partial sums while this twin
    takes one `.mean()` — identical math, different float association
    — so on an adversarial input with a point equidistant between
    centroids (or a cosine exactly at τ) a last-ulp centroid
    difference can flip a discrete keep/cluster decision.  The test
    corpora (random gaussians, planted dups at cos≈1) sit far from
    such ties, which is what the identity gate in
    tests/test_semdedup.py actually certifies."""
    vec_ids = np.asarray(vec_ids, dtype=np.int64)
    m = np.asarray(m, dtype=np.float64)
    order = np.argsort(vec_ids)
    centroids = m[order[:k]].copy()
    for _ in range(iters):
        a = _assign(m, centroids)
        new = centroids.copy()
        for c in range(k):
            if (a == c).any():
                new[c] = m[a == c].mean(axis=0)
        centroids = new
    a = _assign(m, centroids)
    dist = np.linalg.norm(m - centroids[a], axis=1)
    keep = np.ones(len(vec_ids), dtype=bool)
    capped = np.zeros(len(vec_ids), dtype=bool)
    for c in np.unique(a):
        sel = np.flatnonzero(a == c)
        kp, cp = _prune_cluster(vec_ids[sel], dist[sel], m[sel],
                                tau, cluster_cap)
        keep[sel], capped[sel] = kp, cp
    return a, keep, capped
