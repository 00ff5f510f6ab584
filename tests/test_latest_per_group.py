"""Associative keep-latest argmax across block boundaries."""

import pyarrow as pa
import pytest

from ie_ray.stages.relational import latest_per_group


@pytest.mark.usefixtures("ray_session")
def test_latest_survives_block_splits():
    import ray.data
    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
        "o": pa.array([5, 9, 9, 1, 2, 7], type=pa.int64()),
        "tb": pa.array([10, 11, 12, 20, 21, 30], type=pa.int64()),
        "payload": pa.array(["a", "b", "c", "d", "e", "f"]),
    })
    # repartition so each key's rows straddle blocks — the per-block
    # partial argmax must still compose to the global argmax
    ds = ray.data.from_arrow(t).repartition(4)
    got = {r["k"]: (r["o"], r["tb"], r["payload"])
           for r in latest_per_group(ds, "k", "o", "tb").take_all()}
    # k=1: two rows tie on o=9 → tiebreak tb=12 wins
    assert got == {1: (9, 12, "c"), 2: (2, 21, "e"), 3: (7, 30, "f")}
