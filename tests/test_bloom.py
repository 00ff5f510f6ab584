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


def test_bloom_new_rows_exact(ray_session):
    import ray.data
    from ie_ray.stages.bloom import bloom_new_rows

    rng = np.random.RandomState(3)
    seen_keys = rng.randint(0, 1 << 31, 5000).astype(np.int64)
    # probe: half overlapping, half fresh (disjoint range)
    fresh = (rng.randint(0, 1 << 30, 5000) + (1 << 32)).astype(np.int64)
    probe_keys = np.concatenate([seen_keys[:5000:2], fresh])
    seen = ray.data.from_arrow(pa.table({"k": seen_keys}))
    probe = ray.data.from_arrow(pa.table(
        {"k": probe_keys, "row": np.arange(len(probe_keys))}))
    got = sorted(r["k"] for r in bloom_new_rows(probe, seen, "k",
                                                m_bits=1 << 16).take_all())
    expect = sorted(int(k) for k in probe_keys
                    if k not in set(seen_keys.tolist()))
    # EXACT despite the deliberately small filter (high FP rate): the
    # bloom only prefilters, the anti-join decides
    assert got == expect


def test_bloom_filter_saves_exchange_volume(ray_session):
    import ray.data
    from ie_ray.stages.bloom import bloom_contains, build_bloom

    keys = np.arange(1000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys}))
    words = build_bloom(ds, "k", n_bits=1 << 20)
    # every seen key hits...
    assert bloom_contains(words, keys, 4).all()
    # ...and fresh keys rarely do (the rows a broadcast filter keeps
    # out of the exchange)
    fresh = np.arange(10_000_000, 10_010_000, dtype=np.int64)
    fp = bloom_contains(words, fresh, 4).mean()
    assert fp < 0.01, fp


def test_bloom_unaligned_n_bits(ray_session):
    """n_bits not a multiple of 64 rounds UP word-aligned on every
    entry point — build and probe agree on the modulus, so the
    no-false-negative contract holds."""
    import ray.data
    from ie_ray.stages.bloom import (bloom_contains, bloom_semi_join,
                                     build_bloom, local_bitmap)

    keys = np.arange(500, dtype=np.int64)
    words = local_bitmap(keys, 1000, 4)
    assert len(words) * 64 == 1024
    assert bloom_contains(words, keys, 4).all()

    ds = ray.data.from_arrow(pa.table({"k": keys}))
    words2 = build_bloom(ds, "k", n_bits=1000)
    assert (words2 == words).all()

    left = pa.table({"k": pa.array([0, 1, 9_999], type=pa.int64())})
    got = sorted(r["k"] for r in bloom_semi_join(
        ray.data.from_arrow(left), ds, "k", n_bits=1000).take_all())
    assert got == [0, 1]
