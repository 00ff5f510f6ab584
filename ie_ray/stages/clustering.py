"""Distributed k-means over an embedding column (Lloyd's algorithm).

The iterative broadcast-refine shape that scales: each round broadcasts
the k×dim centroid matrix once (``ray.put``), every batch computes its
assignments with one vectorized distance matmul and emits at most k
partial rows (per-cluster vector sum + count), and the driver reduces
O(k × num_blocks) partials — never O(n) — into the next centroids.
Assignment of the full corpus is a plain stateless ``map_batches``
against the final broadcast centroids, so it streams.

Determinism: centroids are seeded from the k smallest ``vec_id`` rows
(found via per-block local min-k + a bounded global merge, the same
top-k pattern as ``similarity.knn_brute``), and ties in the distance
argmin resolve to the lowest cluster index — so a pure-NumPy reference
run reproduces the distributed result bit-for-bit
(tests/test_clustering.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _embeddings_matrix(batch: pa.Table) -> np.ndarray:
    return np.asarray(batch.column("embedding").to_pylist(),
                      dtype=np.float64)


def _assign(m: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    # squared euclidean via the expansion trick: one matmul per batch;
    # argmin breaks ties toward the lowest cluster index (determinism)
    d = (np.sum(m * m, axis=1)[:, None]
         - 2.0 * (m @ centroids.T)
         + np.sum(centroids * centroids, axis=1)[None, :])
    return np.argmin(d, axis=1)


class _PartialSums:
    """Per-batch combiner: k rows of (cluster, vector sum, count)."""

    def __init__(self, centroids_ref):
        import ray
        self.centroids = (ray.get(centroids_ref)
                          if isinstance(centroids_ref, ray.ObjectRef)
                          else np.asarray(centroids_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _embeddings_matrix(batch)
        a = _assign(m, self.centroids)
        clusters, sums, counts = [], [], []
        for c in np.unique(a):
            clusters.append(int(c))
            sums.append(m[a == c].sum(axis=0).tolist())
            counts.append(int((a == c).sum()))
        return pa.table({
            "cluster": pa.array(clusters, type=pa.int64()),
            "vsum": pa.array(sums, type=pa.list_(pa.float64())),
            "n": pa.array(counts, type=pa.int64()),
        })


class _AssignBatch:
    """Final streaming assignment against broadcast centroids."""

    def __init__(self, centroids_ref):
        import ray
        self.centroids = (ray.get(centroids_ref)
                          if isinstance(centroids_ref, ray.ObjectRef)
                          else np.asarray(centroids_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _embeddings_matrix(batch)
        a = _assign(m, self.centroids)
        d = np.linalg.norm(m - self.centroids[a], axis=1)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "cluster": pa.array(a, type=pa.int64()),
            "dist": pa.array(np.round(d, 6), type=pa.float64()),
        })


def _seed_centroids(ds, k: int) -> np.ndarray:
    """Embeddings of the k smallest vec_ids, without a global sort:
    per-block local min-k, then a bounded merge of k × num_blocks rows."""
    def local_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        idx = pc.sort_indices(batch.column("vec_id"))
        return batch.select(["vec_id", "embedding"]).take(idx[:k])

    cand = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: r["vec_id"])
    return np.asarray([r["embedding"] for r in cand[:k]], dtype=np.float64)


def kmeans_fit(ds, k: int = 8, iters: int = 5) -> np.ndarray:
    """Run `iters` Lloyd rounds; returns the final k×dim centroid matrix.

    Each round executes the (lazy) dataset once; the only data that ever
    reaches the driver is the O(k × num_blocks) partial-sum table."""
    import ray

    centroids = _seed_centroids(ds, k)
    for _ in range(iters):
        cref = ray.put(centroids)
        parts = ds.map_batches(_PartialSums(cref),
                               batch_format="pyarrow").take_all()
        sums = np.zeros_like(centroids)
        counts = np.zeros(k, dtype=np.int64)
        for row in parts:
            sums[row["cluster"]] += np.asarray(row["vsum"])
            counts[row["cluster"]] += row["n"]
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


def kmeans_assign(ds, centroids: np.ndarray):
    """Streaming (vec_id, cluster, dist) assignment — no materialization."""
    import ray
    return ds.map_batches(_AssignBatch(ray.put(np.asarray(centroids))),
                          batch_format="pyarrow")


def kmeans_reference(vec_ids: np.ndarray, m: np.ndarray, k: int = 8,
                     iters: int = 5) -> np.ndarray:
    """Single-process NumPy twin of fit+assign, for exact verification."""
    order = np.argsort(vec_ids)
    centroids = m[order[:k]].astype(np.float64)
    m = m.astype(np.float64)
    for _ in range(iters):
        a = _assign(m, centroids)
        new = centroids.copy()
        for c in range(k):
            if (a == c).any():
                new[c] = m[a == c].mean(axis=0)
        centroids = new
    return _assign(m, centroids)
