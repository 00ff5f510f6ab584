"""Skew-salted join (relational.py::salted_join)."""

import numpy as np
import pyarrow as pa


def _ds(table, parts=4):
    import ray.data
    return ray.data.from_arrow(table).repartition(parts)


def test_salted_join_matches_duckdb_under_skew(ray_session):
    """Planted hot key (80% of probe rows) — result must equal the
    plain inner join exactly; salt only routes."""
    import duckdb

    from ie_ray.stages.relational import salted_join

    rng = np.random.RandomState(7)
    n = 20_000
    keys = np.where(rng.rand(n) < 0.8, 7,
                    rng.randint(0, 100, n)).astype(np.int64)
    left = pa.table({
        "k": pa.array(keys),
        "row": pa.array(np.arange(n, dtype=np.int64))})
    right = pa.table({
        "k": pa.array(np.arange(100, dtype=np.int64)),
        "payload": pa.array(["p%d" % i for i in range(100)])})
    out = salted_join(_ds(left, 6), _ds(right, 2), "k", salt=8)
    got = sorted((r["row"], r["payload"]) for r in out.take_all())
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = sorted(map(tuple, con.execute(
        "SELECT l.row, r.payload FROM l JOIN r USING (k)").fetchall()))
    assert got == want and len(want) == n


def test_salt_spreads_hot_key_over_partitions():
    """The routing property itself: the hot key's (key, salt) pairs
    land in multiple hash partitions, not one."""
    import ray
    import ray.data

    from ie_ray.stages.relational import _make_add_part

    add_part = _make_add_part(["k", "__salt"], 64, "__part")
    t = pa.table({
        "k": pa.array(np.full(8, 7, dtype=np.int64)),
        "__salt": pa.array(np.arange(8, dtype=np.int64))})
    parts = set(np.asarray(add_part(t).column("__part")).tolist())
    assert len(parts) >= 4   # 8 salts over 64 partitions


def test_salted_join_duplicate_build_rows(ray_session):
    """Multiplicity: duplicate right rows multiply matches exactly
    as an unsalted join would."""
    from ie_ray.stages.relational import salted_join

    left = pa.table({"k": pa.array([1, 1, 2], type=pa.int64()),
                     "row": pa.array([10, 11, 12], type=pa.int64())})
    right = pa.table({"k": pa.array([1, 1], type=pa.int64()),
                      "v": pa.array(["a", "b"])})
    out = sorted((r["row"], r["v"]) for r in salted_join(
        _ds(left, 2), _ds(right, 1), "k", salt=4).take_all())
    assert out == [(10, "a"), (10, "b"), (11, "a"), (11, "b")]


def test_salted_join_salt_exceeds_parts(ray_session):
    """salt > parts co-buckets salt replicas of the same key; the
    (key, salt) join condition must not duplicate matches (review
    finding r5s4: bare-key join returned 2x rows)."""
    from ie_ray.stages.relational import salted_join

    left = pa.table({
        "k": pa.array(np.full(10, 7, dtype=np.int64)),
        "row": pa.array(np.arange(10, dtype=np.int64))})
    right = pa.table({"k": pa.array([7], type=pa.int64()),
                      "v": pa.array(["x"])})
    out = salted_join(_ds(left, 3), _ds(right, 1), "k",
                      salt=8, parts=4).take_all()
    assert sorted(r["row"] for r in out) == list(range(10))
