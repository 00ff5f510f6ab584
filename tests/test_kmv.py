"""KMV overlap sketch accuracy and merge invariance."""

import numpy as np
import pyarrow as pa


def _planted(overlap_frac):
    """Two groups of 20k ids with a known overlap fraction."""
    n = 20_000
    shared = int(n * overlap_frac)
    a = np.arange(0, n, dtype=np.int64)
    b = np.concatenate([np.arange(0, shared, dtype=np.int64),
                        np.arange(n, 2 * n - shared, dtype=np.int64)])
    rows_g = ["A"] * len(a) + ["B"] * len(b)
    rows_v = np.concatenate([a, b])
    return pa.table({"g": pa.array(rows_g), "v": pa.array(rows_v)})


def test_kmv_overlap_accuracy(ray_session):
    import ray.data

    from ie_ray.stages.sketches import kmv_overlap

    for frac in (0.5, 0.1):
        t = _planted(frac)
        ds = ray.data.from_arrow(t).repartition(6)
        rows = kmv_overlap(ds, "v", "g", k=512).take_all()
        assert len(rows) == 1
        r = rows[0]
        n = 20_000
        true_inter = int(n * frac)
        true_union = 2 * n - true_inter
        assert abs(r["union_est"] - true_union) / true_union < 0.15
        assert abs(r["overlap_est"] - true_inter) / true_inter < 0.25, r
        true_j = true_inter / true_union
        assert abs(r["jaccard_est"] - true_j) / true_j < 0.25


def test_kmv_block_layout_invariant(ray_session):
    """Sketch merge is associative/idempotent: estimates must not
    depend on how blocks split."""
    import ray.data

    from ie_ray.stages.sketches import kmv_overlap

    t = _planted(0.3)
    outs = []
    for parts in (1, 4, 9):
        ds = ray.data.from_arrow(t).repartition(parts)
        outs.append(kmv_overlap(ds, "v", "g", k=256).take_all()[0])
    assert outs[0] == outs[1] == outs[2]


def test_kmv_disjoint_groups(ray_session):
    import ray.data

    from ie_ray.stages.sketches import kmv_overlap

    t = pa.table({
        "g": pa.array(["A"] * 500 + ["B"] * 500),
        "v": pa.array(np.concatenate([
            np.arange(500, dtype=np.int64),
            np.arange(10_000, 10_500, dtype=np.int64)]))})
    r = kmv_overlap(ray.data.from_arrow(t).repartition(3),
                    "v", "g", k=128).take_all()[0]
    assert r["jaccard_est"] == 0.0 and r["overlap_est"] == 0.0


def test_kmv_small_groups_exact(ray_session):
    """Untruncated sketches ARE the sets — tiny audiences must get
    exact union/intersection, not estimator noise (review r5s4)."""
    import ray.data

    from ie_ray.stages.sketches import kmv_overlap

    t = pa.table({
        "g": pa.array(["A"] * 3 + ["B"] * 3),
        "v": pa.array([1, 2, 3, 2, 3, 4], type=pa.int64())})
    r = kmv_overlap(ray.data.from_arrow(t).repartition(2),
                    "v", "g", k=256).take_all()[0]
    assert r["union_est"] == 4.0 and r["overlap_est"] == 2.0
    assert r["jaccard_est"] == 0.5
