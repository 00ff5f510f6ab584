"""bucketed_aggregate vs pandas groupby — int keys, string keys, mixed,
and determinism across runs (string hashing must be process-stable)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ie_ray.stages.relational import bucketed_aggregate


def _ds(df, blocks=6):
    return ray.data.from_arrow(pa.Table.from_pandas(
        df, preserve_index=False)).repartition(blocks)


def _got(ds, keys):
    out = ds.to_pandas()
    return out.sort_values(keys).reset_index(drop=True)


def test_int_keys_sum_count():
    rng = np.random.RandomState(0)
    df = pd.DataFrame({
        "k": rng.randint(0, 5000, size=20000),
        "v": rng.randint(0, 100, size=20000)})
    got = _got(bucketed_aggregate(_ds(df), "k",
                                  [("v", "sum"), ("v", "count")]), ["k"])
    exp = df.groupby("k")["v"].agg(["sum", "count"]).reset_index()
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (got["v_sum"].to_numpy() == exp["sum"].to_numpy()).all()
    assert (got["v_count"].to_numpy() == exp["count"].to_numpy()).all()


def test_string_int_mixed_keys():
    rng = np.random.RandomState(1)
    df = pd.DataFrame({
        "s": ["w%03d" % i for i in rng.randint(0, 800, size=10000)],
        "k": rng.randint(0, 3, size=10000),
        "v": rng.randint(1, 10, size=10000)})
    got = _got(bucketed_aggregate(_ds(df), ["s", "k"], [("v", "sum")]),
               ["s", "k"])
    exp = df.groupby(["s", "k"], as_index=False)["v"].sum() \
        .sort_values(["s", "k"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["v_sum"].to_numpy() == exp["v"].to_numpy()).all()


def test_every_key_in_exactly_one_bucket():
    # a key split across buckets would surface as duplicate output rows
    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        "s": ["dup"] * 5000 + ["w%d" % i
                               for i in rng.randint(0, 50, size=5000)],
        "v": np.ones(10000, dtype=np.int64)})
    got = _got(bucketed_aggregate(_ds(df, blocks=8), "s", [("v", "sum")]),
               ["s"])
    assert got["s"].is_unique
    assert got.loc[got["s"] == "dup", "v_sum"].iloc[0] == 5000


def test_null_keys_partition_stably():
    # nulls in a key column must neither crash (string-key dictionary
    # indices) nor re-hash OTHER keys differently in null-containing
    # blocks (int-key float64 coercion) — ADVICE r3 medium
    rng = np.random.RandomState(3)
    n = 6000
    s = pd.Series(["w%02d" % i for i in rng.randint(0, 40, size=n)],
                  dtype=object)
    s[rng.rand(n) < 0.1] = None
    k = pd.Series(rng.randint(0, 40, size=n)).astype("Int64")
    k[rng.rand(n) < 0.1] = pd.NA
    df = pd.DataFrame({"s": s, "k": k,
                       "v": np.ones(n, dtype=np.int64)})

    for keys in (["s"], ["k"], ["s", "k"]):
        got = _got(bucketed_aggregate(_ds(df), keys, [("v", "sum")]),
                   keys)
        exp = df.groupby(keys, as_index=False, dropna=False)["v"].sum()
        # one output row per distinct key tuple (incl. the null group):
        # a key split across buckets would duplicate rows
        assert len(got) == len(exp), keys
        assert int(got["v_sum"].sum()) == n
        merged = got.merge(exp, on=keys, how="inner")
        assert (merged["v_sum"].to_numpy() == merged["v"].to_numpy()).all()
