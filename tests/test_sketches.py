"""HyperLogLog distinct sketches vs exact cardinalities."""
import numpy as np
import pyarrow as pa


def test_hll_global(ray_session):
    import ray.data
    from ie_ray.stages.sketches import hll_distinct
    n = 50_000
    keys = (np.arange(n, dtype=np.int64) * 2654435761) % (1 << 62)
    # heavy duplication across blocks must not inflate the estimate
    dup = np.concatenate([keys, keys[: n // 2], keys[: n // 4]])
    ds = ray.data.from_arrow(pa.table({"v": dup})).repartition(8)
    est = hll_distinct(ds, "v").take_all()[0]["approx_distinct"]
    assert abs(est - n) / n < 0.03, est


def test_hll_grouped(ray_session):
    import ray.data
    from ie_ray.stages.sketches import hll_distinct
    rng = np.random.RandomState(11)
    groups, vals = [], []
    exact = {"a": 1000, "b": 15000, "c": 3}
    for g, n in exact.items():
        ks = rng.randint(0, 1 << 60, 3 * n) % (1 << 59)
        ks = np.unique(ks)[:n]
        assert len(ks) == n
        groups += [g] * (2 * n)           # every value appears twice
        vals += list(ks) + list(ks)
    ds = ray.data.from_arrow(pa.table(
        {"g": groups, "v": np.asarray(vals, dtype=np.int64)})) \
        .random_shuffle(seed=5).repartition(6)
    got = {r["g"]: r["approx_distinct"]
           for r in hll_distinct(ds, "v", group_col="g").take_all()}
    for g, n in exact.items():
        assert abs(got[g] - n) / n < 0.03, (g, got[g], n)
