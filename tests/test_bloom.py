"""Bloom prefilter: no false negatives, bounded FPR, exact semi-join."""

import numpy as np
import pyarrow as pa


def _ds(table, parts=4):
    import ray.data
    return ray.data.from_arrow(table).repartition(parts)


def test_bloom_no_false_negatives_and_fpr():
    from ie_ray.stages.bloom import bloom_contains, local_bitmap

    rng = np.random.RandomState(7)
    members = rng.choice(np.arange(10_000_000, dtype=np.int64),
                         size=50_000, replace=False)
    n_bits, k = 1 << 20, 4   # m/n = 20.97 bits/key -> FPR ~ 2.4e-3
    words = local_bitmap(members, n_bits, k)
    assert bloom_contains(words, members, k).all()   # never miss

    non = np.setdiff1d(
        rng.choice(np.arange(10_000_000, 20_000_000, dtype=np.int64),
                   size=100_000, replace=False), members)
    fpr = bloom_contains(words, non, k).mean()
    # theory: (1 - e^{-kn/m})^k = 2.4e-3 at these parameters; allow 3x
    assert fpr < 3 * 2.4e-3, fpr


def test_bloom_negative_keys():
    """int64 keys below zero must hash, not crash or alias."""
    from ie_ray.stages.bloom import bloom_contains, local_bitmap

    keys = np.array([-1, -2**63, 0, 2**62], dtype=np.int64)
    words = local_bitmap(keys, 1 << 16, 4)
    assert bloom_contains(words, keys, 4).all()
    assert not bloom_contains(
        words, np.arange(100, 200, dtype=np.int64), 4).all()


def test_bloom_semi_join_exact(ray_session):
    """Composed operator is EXACT: equals the brute-force semi-join
    even though the bloom itself false-positives."""
    from ie_ray.stages.bloom import bloom_semi_join

    rng = np.random.RandomState(13)
    left = pa.table({
        "k": pa.array(rng.randint(0, 5_000, 20_000), type=pa.int64()),
        "row": pa.array(np.arange(20_000), type=pa.int64())})
    right = pa.table({
        "k": pa.array(rng.randint(0, 5_000, 300), type=pa.int64())})
    # tiny filter to force a real false-positive tail through verify
    out = bloom_semi_join(_ds(left), _ds(right, parts=3), "k",
                          n_bits=1 << 10, k=2)
    got = sorted(r["row"] for r in out.take_all())
    members = set(right.column("k").to_pylist())
    want = [r for k_, r in zip(left.column("k").to_pylist(),
                               left.column("row").to_pylist())
            if k_ in members]
    assert got == sorted(want) and len(want) > 0


def test_bloom_semi_join_empty_right(ray_session):
    from ie_ray.stages.bloom import bloom_semi_join

    left = pa.table({"k": pa.array([1, 2], type=pa.int64())})
    right = pa.table({"k": pa.array([], type=pa.int64())})
    out = bloom_semi_join(_ds(left, 1), _ds(right, 1), "k")
    assert out.count() == 0
