"""Numerical stability of the distributed moment kernels (round-4
fp-hygiene sweep, VERDICT r3 next #8).

The adversarial shape: values offset by 1e9 with unit-scale variance.
Raw sufficient statistics (Σx², Σxy) hold ~16 significant digits, so
Σx² − (Σx)²/n loses every digit of the variance at that offset — the
Chan centered-moment merge (ie_ray/stages/moments.py) must stay within
float64 roundoff of numpy's exact two-pass answer instead.
"""

import numpy as np
import pyarrow as pa
import pytest

from ie_ray.stages.moments import (block_comoments_by, block_moments_by,
                                   merge_comoments, merge_moments,
                                   reduce_grouped_comoments,
                                   reduce_grouped_moments)

OFFSET = 1e9
N = 1_000_000          # 10⁶ rows × 1000-row blocks ≈ the 10⁷-row failure
BLOCK = 1000           # mode scaled to pytest time; cancellation already
                       # total at this size (see test_naive_sums_cancel)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    v = OFFSET + rng.randn(N)
    types = np.array(["a", "b", "c", "d"])[rng.randint(0, 4, N)]
    return v, types


def test_naive_sums_cancel_but_chan_does_not(data):
    v, _ = data
    # naive: variance from (n, Σx, Σx²)
    n, s1, s2 = float(N), v.sum(), (v * v).sum()
    naive_var = (s2 - s1 * s1 / n) / n
    exact_var = v.var()
    assert abs(naive_var - exact_var) > 0.01 * exact_var  # catastrophic
    # Chan merge over blocks
    agg = (0.0, 0.0, 0.0)
    for i in range(0, N, BLOCK):
        b = v[i:i + BLOCK]
        m = b.mean()
        agg = merge_moments(agg, (float(len(b)), m,
                                  float(((b - m) ** 2).sum())))
    chan_var = agg[2] / agg[0]
    assert abs(chan_var - exact_var) < 1e-5 * exact_var
    assert abs(agg[1] - v.mean()) < 1e-6


def test_grouped_moments_match_numpy(data):
    v, types = data
    rows = []
    for i in range(0, N, BLOCK):
        t = pa.table({"k": pa.array(list(types[i:i + BLOCK])),
                      "v": pa.array(v[i:i + BLOCK])})
        m = block_moments_by(t, "k", "v")
        rows.extend(zip(m.column("k").to_pylist(),
                        np.asarray(m.column("n")),
                        np.asarray(m.column("mean")),
                        np.asarray(m.column("m2"))))
    agg = reduce_grouped_moments(rows)
    for k in "abcd":
        sel = v[types == k]
        n, mean, m2 = agg[k]
        assert n == len(sel)
        assert abs(mean - sel.mean()) < 1e-6
        assert abs(m2 / n - sel.var()) < 1e-5 * sel.var()


def test_grouped_comoments_correlation(data):
    v, types = data
    rng = np.random.RandomState(8)
    # y correlated with x at ~0.6, both offset by 1e9
    x = v
    y = OFFSET + 0.6 * (x - OFFSET) + 0.8 * rng.randn(N)
    rows = []
    for i in range(0, N, BLOCK):
        t = pa.table({"k": pa.array(list(types[i:i + BLOCK]))})
        m = block_comoments_by(t, "k", x[i:i + BLOCK], y[i:i + BLOCK])
        rows.extend(zip(m.column("k").to_pylist(),
                        *(np.asarray(m.column(c)) for c in
                          ("n", "mx", "my", "m2x", "m2y", "cxy"))))
    agg = reduce_grouped_comoments(rows)
    for k in "abcd":
        sel = types == k
        exact = np.corrcoef(x[sel], y[sel])[0, 1]
        n, mx, my, m2x, m2y, cxy = agg[k]
        got = cxy / np.sqrt(m2x * m2y)
        assert abs(got - exact) < 1e-5, (k, got, exact)


def test_zscore_queries_stable_at_offset(ray_session, tmp_path):
    """End-to-end: the events z-score/corr queries give exact answers on
    a 1e9-offset events table (the oracle comparison can then never
    flip on conditioning)."""
    import pyarrow.parquet as pq
    import __ray_entry__ as e

    rng = np.random.RandomState(9)
    n = 50_000
    ts = pa.array((1_700_000_000_000_000 +
                   rng.randint(0, 10**9, n)).astype("datetime64[us]"))
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "event_type": pa.array(
            np.array(["x", "y", "z"])[rng.randint(0, 3, n)]),
        "user_id": pa.array(rng.randint(0, 50, n).astype(np.int64)),
        "ts": ts,
        "value": pa.array(OFFSET + rng.randn(n)),
    })
    d = tmp_path / "sf_adv"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))

    got = {r["event_id"]: r["z"]
           for r in e.queries()["events_value_zscore"](str(d)).iter_rows()}
    v = np.asarray(tbl.column("value"))
    exact = np.round((v - v.mean()) / v.std(), 4)
    diffs = sum(1 for i in range(n) if abs(got[i] - exact[i]) > 1.5e-4)
    assert diffs == 0, diffs

    got_t = {r["event_id"]: r["z"]
             for r in e.queries()["events_zscore_by_type"](
                 str(d)).iter_rows()}
    types = np.asarray(tbl.column("event_type"))
    for k in "xyz":
        sel = types == k
        ze = np.round((v[sel] - v[sel].mean()) / v[sel].std(), 4)
        ids = np.arange(n)[sel]
        diffs = sum(1 for i, zz in zip(ids, ze)
                    if abs(got_t[i] - zz) > 1.5e-4)
        assert diffs == 0, (k, diffs)

    corr = {r["event_type"]: r["corr_vt"]
            for r in e.queries()["events_corr_value_time"](
                str(d)).iter_rows()}
    x = np.asarray(tbl.column("ts").cast(pa.timestamp("us"))
                   .cast(pa.int64()), dtype=np.float64) / 1e6
    for k in "xyz":
        sel = types == k
        exact_r = np.corrcoef(x[sel], v[sel])[0, 1]
        assert abs(corr[k] - round(exact_r, 4)) <= 2e-4, (k, corr[k], exact_r)
