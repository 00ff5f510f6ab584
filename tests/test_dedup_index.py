"""The online dedup index must be idempotent across lazy plan re-executions
(Ray Datasets re-run their lineage on every consumption)."""

import pyarrow as pa


def test_dedup_filter_idempotent_across_executions(ray_session):
    import ray.data
    from ie_ray.stages.dedup_index import DedupFilter, create_dedup_index
    shards = create_dedup_index(num_shards=2)
    t = pa.table({
        "page_hash": pa.array(["aa11", "aa11", "bb22", "cc33"],
                              type=pa.string()),
        "url": pa.array(["u1", "u2", "u3", "u4"], type=pa.string()),
    })
    ds = ray.data.from_arrow(t).map_batches(
        DedupFilter, fn_constructor_kwargs={"shards": shards},
        batch_format="pyarrow", concurrency=(1, 1), num_cpus=0.5)
    first = sorted(r["url"] for r in ds.take_all())
    assert len(first) == 3                      # one duplicate dropped
    second = sorted(r["url"] for r in ds.take_all())   # re-execution
    assert second == first                      # identical survivors


def test_dedup_shard_owner_semantics(ray_session):
    import ray
    from ie_ray.stages.dedup_index import create_dedup_index
    (shard,) = create_dedup_index(num_shards=1)
    assert ray.get(shard.check_and_add.remote(["k1", "k2"], ["a", "b"])) == \
        [True, True]
    # same owner keeps winning; other owners lose
    assert ray.get(shard.check_and_add.remote(["k1", "k1"], ["a", "z"])) == \
        [True, False]
    assert ray.get(shard.size.remote()) == 2
