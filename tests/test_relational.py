"""Semi/anti join and exact distinct-count operator tests."""

import numpy as np
import pyarrow as pa


def _ds(table, blocks=1):
    import ray.data
    ds = ray.data.from_arrow(table)
    return ds.repartition(blocks) if blocks > 1 else ds


def _rand_tables(seed):
    rng = np.random.RandomState(seed)
    left = pa.table({
        "k": pa.array(rng.randint(0, 40, 300), type=pa.int64()),
        "payload": pa.array([f"p{i}" for i in range(300)]),
        "v": pa.array(rng.rand(300)),
    })
    right = pa.table({
        "rk": pa.array(rng.randint(20, 60, 500), type=pa.int64()),
    })
    return left, right


def test_semi_anti_join_vs_duckdb(ray_session):
    import duckdb
    from ie_ray.stages.relational import anti_join, semi_join
    left, right = _rand_tables(7)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)

    semi = semi_join(_ds(left, 4), _ds(right, 4), "k", "rk").take_all()
    anti = anti_join(_ds(left, 4), _ds(right, 4), "k", "rk").take_all()
    want_semi = set(con.execute(
        "SELECT payload FROM l WHERE EXISTS "
        "(SELECT 1 FROM r WHERE r.rk = l.k)").df().payload)
    want_anti = set(con.execute(
        "SELECT payload FROM l WHERE NOT EXISTS "
        "(SELECT 1 FROM r WHERE r.rk = l.k)").df().payload)
    assert {r["payload"] for r in semi} == want_semi
    assert {r["payload"] for r in anti} == want_anti
    # all left columns survive, tags dropped
    assert set(semi[0]) == {"k", "payload", "v"}
    assert len(semi) + len(anti) == left.num_rows
    assert len(want_semi) > 0 and len(want_anti) > 0


def test_distinct_count_multiblock(ray_session):
    from ie_ray.stages.relational import distinct_count
    rng = np.random.RandomState(9)
    t = pa.table({
        "g": pa.array([f"g{x}" for x in rng.randint(0, 4, 1000)]),
        "x": pa.array(rng.randint(0, 30, 1000), type=pa.int64()),
    })
    out = {r["g"]: r["n_distinct"]
           for r in distinct_count(_ds(t, 6), "g", "x").take_all()}
    df = t.to_pandas()
    want = df.groupby("g").x.nunique().to_dict()
    assert out == want


def test_lowcard_combine_tree_bounds_task_input(ray_session):
    """With combine_fn, no single reduce task may receive more than
    ~max(blocks/fanin, fanin) x |keys| rows even at an artificially
    high block count (the events_hourly_window hazard: a time-growing
    key domain x many blocks overwhelming the final single task).
    The bound is enforced INSIDE the reduce tasks (they run in worker
    processes) — any violation raises and fails the run."""
    from ie_ray.stages.relational import lowcard_combine
    rng = np.random.RandomState(3)
    n, keys, blocks, fanin = 20_000, 200, 64, 8
    cap = max(-(-blocks // fanin), fanin) * keys
    t = pa.table({
        "k": pa.array(rng.randint(0, keys, n), type=pa.int64()),
        "v": pa.array(rng.rand(n)),
    })

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("k").aggregate([("v", "sum"), ([], "count_all")])
        return g.rename_columns(["k", "v", "n"])

    def combine(b: pa.Table) -> pa.Table:
        if b.num_rows > cap:
            raise AssertionError(
                "reduce task received %d rows > cap %d" % (b.num_rows, cap))
        g = b.group_by("k").aggregate([("v", "sum"), ("n", "sum")])
        return g.rename_columns(["k", "v", "n"])

    out = lowcard_combine(_ds(t, blocks), partial, combine,
                          combine_fn=combine, tree_fanin=fanin).take_all()
    got = {r["k"]: (round(r["v"], 9), r["n"]) for r in out}
    df = t.to_pandas().groupby("k").v.agg(["sum", "count"])
    want = {int(k): (round(row["sum"], 9), int(row["count"]))
            for k, row in df.iterrows()}
    assert got == want
    # sanity: without the tree level the final task WOULD exceed the cap
    assert blocks * keys > cap
