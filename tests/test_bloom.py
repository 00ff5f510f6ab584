"""Bloom-prefiltered exact membership (stages/bloom.py)."""
import numpy as np
import pyarrow as pa


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
    from ie_ray.stages.bloom import _positions, build_bloom

    keys = np.arange(1000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys}))
    packed = build_bloom(ds, "k", m_bits=1 << 20)
    bits = np.unpackbits(packed).view(bool)
    # every seen key hits...
    assert bits[_positions(keys, 1 << 20, 4)].all(axis=1).all()
    # ...and fresh keys rarely do (the rows a broadcast filter keeps
    # out of the exchange)
    fresh = np.arange(10_000_000, 10_010_000, dtype=np.int64)
    fp = bits[_positions(fresh, 1 << 20, 4)].all(axis=1).mean()
    assert fp < 0.01, fp
