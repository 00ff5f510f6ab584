"""adaptive_join: broadcast and hash paths produce identical results."""

import pyarrow as pa
import pytest

from ie_ray.stages.relational import adaptive_join

LEFT = pa.table({
    "k": pa.array([1, 2, 2, 3, 5], type=pa.int64()),
    "lv": pa.array(["a", "b", "c", "d", "e"]),
})
RIGHT = pa.table({
    "k": pa.array([1, 2, 3, 4], type=pa.int64()),
    "rv": pa.array([10, 20, 30, 40], type=pa.int64()),
})
WANT = sorted([(1, "a", 10), (2, "b", 20), (2, "c", 20), (3, "d", 30)])


def _run(broadcast_max_rows):
    import ray.data
    out = adaptive_join(ray.data.from_arrow(LEFT).repartition(3),
                        ray.data.from_arrow(RIGHT), "k",
                        broadcast_max_rows=broadcast_max_rows)
    return sorted((r["k"], r["lv"], r["rv"]) for r in out.take_all())


@pytest.mark.usefixtures("ray_session")
def test_broadcast_path():
    assert _run(broadcast_max_rows=100) == WANT


@pytest.mark.usefixtures("ray_session")
def test_hash_path_same_result():
    assert _run(broadcast_max_rows=1) == WANT


@pytest.mark.usefixtures("ray_session")
def test_broadcast_rejects_dup_keys():
    import ray.data
    dup = pa.table({"k": pa.array([1, 1], type=pa.int64()),
                    "rv": pa.array([9, 9], type=pa.int64())})
    with pytest.raises(Exception):
        adaptive_join(ray.data.from_arrow(LEFT),
                      ray.data.from_arrow(dup), "k",
                      broadcast_max_rows=10).take_all()
