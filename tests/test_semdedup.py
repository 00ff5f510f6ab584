"""SemDeDup (Abbas et al. 2023 recipe): distributed-vs-NumPy-twin
identity, planted near-duplicate behavior, and the mega-cluster cap."""

import numpy as np
import pyarrow as pa
import pytest

from ie_ray.stages.semdedup import (_prune_cluster, semdedup,
                                    semdedup_reference)


def _planted(n=240, dim=16, n_dup_groups=12, seed=7):
    """Random unit-ish vectors plus planted duplicate groups: each
    group is one base vector repeated with tiny noise (cos ≈ 1)."""
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    groups = []
    for g in range(n_dup_groups):
        base = 3 * g
        for j in (1, 2):
            m[base + j] = m[base] + rng.normal(scale=1e-4, size=dim)
        groups.append((base, base + 1, base + 2))
    ids = np.arange(1000, 1000 + n, dtype=np.int64)
    return ids, m, groups


def test_prune_cluster_greedy_semantics():
    # three exact dups + one distinct: exactly one dup survives, the
    # one FARTHEST from the centroid (greedy order: dist desc, id asc)
    emb = np.array([[1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    ids = np.array([10, 11, 12, 13], dtype=np.int64)
    dist = np.array([0.5, 0.9, 0.7, 0.2])
    keep, capped = _prune_cluster(ids, dist, emb, tau=0.99,
                                  cluster_cap=1000)
    assert keep.tolist() == [False, True, False, True]
    assert not capped.any()
    # tie on dist → lowest vec_id wins
    dist2 = np.array([0.5, 0.5, 0.5, 0.2])
    keep2, _ = _prune_cluster(ids, dist2, emb, tau=0.99,
                              cluster_cap=1000)
    assert keep2.tolist() == [True, False, False, True]


def test_cluster_cap_degrades_to_keep_and_flags():
    emb = np.tile(np.array([[1.0, 0.0]]), (6, 1))
    ids = np.arange(6, dtype=np.int64)
    dist = np.zeros(6)
    keep, capped = _prune_cluster(ids, dist, emb, tau=0.99,
                                  cluster_cap=3)
    # inside the cap: 1 survivor of 3; overflow rows all kept + flagged
    assert int(keep[:0].sum()) == 0
    assert int(keep.sum()) == 1 + 3
    assert int(capped.sum()) == 3
    assert bool(np.all(keep[capped]))


def test_reference_planted_duplicates():
    ids, m, groups = _planted()
    _, keep, capped = semdedup_reference(ids, m, k=6, iters=3,
                                         tau=0.999)
    assert not capped.any()
    for g in groups:
        # dup triplets co-cluster (cos ≈ 1 ⇒ same centroid) and
        # exactly one of each survives
        assert sum(bool(keep[i]) for i in g) == 1
    # non-planted rows (random gaussians, pairwise cos ≪ 0.999) survive
    planted = {i for g in groups for i in g}
    others = [i for i in range(len(ids)) if i not in planted]
    assert all(bool(keep[i]) for i in others)


def test_distributed_matches_reference(ray_session):
    import ray.data

    ids, m, _ = _planted(n=300, dim=12, n_dup_groups=20, seed=11)
    tbl = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl).repartition(8)
    # float32 storage: the twin must see the same rounded values
    m32 = np.asarray(tbl.column("embedding").to_pylist(),
                     dtype=np.float64)
    a_ref, keep_ref, cap_ref = semdedup_reference(
        ids, m32, k=6, iters=3, tau=0.999)
    got = {r["vec_id"]: (r["cluster"], r["keep"], r["capped"])
           for r in semdedup(ds, k=6, iters=3, tau=0.999).take_all()}
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert got[vid] == (int(a_ref[i]), bool(keep_ref[i]),
                            bool(cap_ref[i])), vid


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
