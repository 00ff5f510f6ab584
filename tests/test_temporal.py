"""AS-OF join, top-k-per-group, and decontamination operator tests."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(table):
    import ray.data
    return ray.data.from_arrow(table)


def test_asof_join_prior_basic(ray_session):
    from ie_ray.stages.temporal import asof_join_prior
    left = pa.table({
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "user_id": pa.array([7, 7, 7, 9], type=pa.int64()),
        "ts": pa.array([100, 205, 50, 400], type=pa.int64()),
    })
    right = pa.table({
        "event_id": pa.array([10, 11, 12], type=pa.int64()),
        "user_id": pa.array([7, 7, 8], type=pa.int64()),
        "ts": pa.array([100, 200, 1], type=pa.int64()),
    })
    out = asof_join_prior(_ds(left), _ds(right)).take_all()
    got = {r["event_id"]: (r["on_us"], r["prior_on_us"]) for r in out}
    # event 1: ts=100 matches right ts=100 (<= is inclusive)
    # event 2: ts=205 -> latest prior right is 200
    # event 3: ts=50 -> no prior right row, dropped (inner semantics)
    # event 4: user 9 has no right rows at all, dropped
    assert got == {1: (100, 100), 2: (205, 200)}


def test_asof_join_matches_duckdb(ray_session):
    import duckdb
    from ie_ray.stages.temporal import asof_join_prior
    rng = np.random.RandomState(3)
    n = 400
    ev = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(rng.randint(0, 12, n), type=pa.int64()),
        "ts": pa.array(rng.randint(0, 10_000, n), type=pa.int64()),
        "kind": pa.array(["l" if x else "r" for x in rng.randint(0, 2, n)]),
    })
    import pyarrow.compute as pc
    left = ev.filter(pc.equal(ev.column("kind"), "l"))
    right = ev.filter(pc.equal(ev.column("kind"), "r"))
    got = {(r["event_id"], r["prior_on_us"])
           for r in asof_join_prior(_ds(left), _ds(right)).take_all()}
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = set(con.execute(
        "SELECT l.event_id, r.ts FROM l ASOF JOIN r "
        "ON l.user_id = r.user_id AND l.ts >= r.ts").fetchall())
    assert got == want


def test_range_join_forward_basic(ray_session):
    from ie_ray.stages.temporal import range_join_forward
    left = pa.table({
        "event_id": pa.array([1, 2, 3], type=pa.int64()),
        "user_id": pa.array([7, 7, 9], type=pa.int64()),
        "ts": pa.array([100, 300, 100], type=pa.int64()),
    })
    right = pa.table({
        "event_id": pa.array([10, 11, 12, 13], type=pa.int64()),
        "user_id": pa.array([7, 7, 7, 8], type=pa.int64()),
        "ts": pa.array([100, 150, 350, 120], type=pa.int64()),
    })
    out = range_join_forward(_ds(left), _ds(right), window_us=100).take_all()
    got = {(r["event_id"], r["right_event_id"]) for r in out}
    # left 1 (t=100): right (100] excluded (strict >), 150 in (100,200] -> 11
    # left 2 (t=300): 350 in (300,400] -> 12
    # left 3: user 9 has no right rows
    assert got == {(1, 11), (2, 12)}


def test_range_join_forward_matches_duckdb(ray_session):
    import duckdb
    import pyarrow.compute as pc
    from ie_ray.stages.temporal import range_join_forward
    rng = np.random.RandomState(11)
    n = 600
    ev = pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "user_id": pa.array(rng.randint(0, 10, n), type=pa.int64()),
        "ts": pa.array(rng.randint(0, 5_000, n), type=pa.int64()),
        "kind": pa.array(["l" if x else "r" for x in rng.randint(0, 2, n)]),
    })
    left = ev.filter(pc.equal(ev.column("kind"), "l"))
    right = ev.filter(pc.equal(ev.column("kind"), "r"))
    got = {(r["event_id"], r["right_event_id"])
           for r in range_join_forward(
               _ds(left).repartition(4), _ds(right).repartition(4),
               window_us=200).take_all()}
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = set(con.execute(
        "SELECT l.event_id, r.event_id FROM l JOIN r "
        "ON l.user_id = r.user_id AND r.ts > l.ts "
        "AND r.ts <= l.ts + 200").fetchall())
    assert got == want and len(want) > 50


def test_top_k_per_group_multiblock(ray_session):
    from ie_ray.stages.temporal import top_k_per_group
    rng = np.random.RandomState(5)
    n = 500
    t = pa.table({
        "user_id": pa.array(rng.randint(0, 9, n), type=pa.int64()),
        "event_id": pa.array(range(n), type=pa.int64()),
        # few distinct values force cross-block ties -> tie_col ordering
        "value": pa.array(rng.randint(0, 5, n).astype("float64")),
    })
    ds = _ds(t).repartition(8)   # exercise the per-block partial path
    out = top_k_per_group(ds, "user_id", "value", k=3).take_all()
    df = t.to_pandas()
    for r in out:
        grp = df[df.user_id == r["user_id"]].sort_values(
            ["value", "event_id"], ascending=[False, True]).reset_index()
        want = grp.iloc[r["rn"] - 1]
        assert (r["event_id"], r["value"]) == (want.event_id, want.value)
    assert len(out) == sum(min(3, (df.user_id == u).sum())
                           for u in df.user_id.unique())


def test_decontaminate_planted(ray_session):
    from ie_ray.stages.decontam import decontaminate
    shared = "alpha beta gamma delta epsilon zeta eta theta"   # 8 words
    train = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "clean words only here nothing shared at all ok",
            "prefix %s suffix" % shared,       # exactly one shared 8-gram
            shared,                            # the same single 8-gram
        ]),
    })
    eval_t = pa.table({
        "doc_id": pa.array([100], type=pa.int64()),
        "text": pa.array(["intro %s outro" % shared]),
    })
    out = {r["doc_id"]: r["n_overlap"]
           for r in decontaminate(_ds(train), _ds(eval_t)).take_all()}
    assert out == {2: 1, 3: 1}


def test_ohlc_bars_planted(ray_session):
    """Open/close must come from (ts, id)-ordered endpoints, not
    arbitrary block order — feed the rows REVERSED across many tiny
    blocks so a naive first/last would pick the wrong endpoint."""
    import ray.data

    from ie_ray.stages.temporal import ohlc_bars

    hour = 3_600_000_000
    # hour 0: events at t=5,10,20 with values 3.00, 9.50, 1.25
    # hour 1: single event value 7.00
    # tie case, hour 2: two events at the same ts, ids 40 < 41 —
    # open must take id 40, close id 41.
    rows = [
        (1, 5, 3.00), (2, 10, 9.50), (3, 20, 1.25),
        (9, hour + 1, 7.00),
        (41, 2 * hour + 7, 2.00), (40, 2 * hour + 7, 5.00),
    ]
    rows = rows[::-1]  # adversarial arrival order
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.int64()),
        "value": pa.array([r[2] for r in rows], type=pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(6)  # ~1 row per block
    out = {r["h"]: r for r in ohlc_bars(ds).take_all()}
    assert len(out) == 3
    h0 = out[min(out)]
    assert h0["open_c"] == 300 and h0["close_c"] == 125
    assert h0["high_c"] == 950 and h0["low_c"] == 125 and h0["n"] == 3
    hs = sorted(out)
    h1, h2 = out[hs[1]], out[hs[2]]
    assert (h1["open_c"], h1["close_c"], h1["n"]) == (700, 700, 1)
    assert h2["open_c"] == 500 and h2["close_c"] == 200  # tie by id
    assert h2["high_c"] == 500 and h2["low_c"] == 200 and h2["n"] == 2


def test_islands_per_key_planted(ray_session):
    """Duplicates collapse, gaps split runs, single-day users count."""
    import ray.data

    from ie_ray.stages.temporal import islands_per_key

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2, 2], type=pa.int64()),
        # user 1: days 3,4,4,7,8 -> runs [3-4], [7-8]; user 2: 5,5,5
        "day": pa.array([3, 4, 4, 7, 8, 5, 5, 5], type=pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    out = {r["user_id"]: r for r in
           islands_per_key(ds, "user_id", "day").take_all()}
    assert out[1]["n_seq"] == 4 and out[1]["n_islands"] == 2
    assert out[1]["max_island_len"] == 2
    assert out[2] == {"user_id": 2, "n_seq": 1, "n_islands": 1,
                      "max_island_len": 1}


def test_run_length_intervals_planted(ray_session):
    """Consecutive same-state rows merge; a revisit after a different
    state opens a NEW interval (SCD2, not a distinct-collapse)."""
    import ray.data

    from ie_ray.stages.temporal import run_length_intervals

    t = pa.table({
        "user_id": pa.array([1] * 5 + [2], type=pa.int64()),
        "ts": pa.array([10, 20, 30, 40, 50, 5], type=pa.int64()),
        "event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "event_type": pa.array(["a", "a", "b", "a", "a", "c"]),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    out = run_length_intervals(ds, "user_id", "ts", "event_id",
                               "event_type").take_all()
    u1 = sorted([r for r in out if r["user_id"] == 1],
                key=lambda r: r["start_us"])
    assert [(r["state"], r["n_events"], r["start_us"], r["end_us"])
            for r in u1] == [("a", 2, 10, 20), ("b", 1, 30, 30),
                             ("a", 2, 40, 50)]
    u2 = [r for r in out if r["user_id"] == 2]
    assert u2 == [{"user_id": 2, "state": "c", "n_events": 1,
                   "start_us": 5, "end_us": 5}]


def test_run_length_intervals_null_state(ray_session):
    """Consecutive NULL states merge into ONE interval (IS DISTINCT
    FROM semantics), matching the SQL oracle."""
    import ray.data

    from ie_ray.stages.temporal import run_length_intervals

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1], type=pa.int64()),
        "ts": pa.array([10, 20, 30, 40], type=pa.int64()),
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "event_type": pa.array(["a", None, None, "a"]),
    })
    out = sorted(run_length_intervals(
        ray.data.from_arrow(t), "user_id", "ts", "event_id",
        "event_type").take_all(), key=lambda r: r["start_us"])
    assert [(r["state"], r["n_events"]) for r in out] == \
        [("a", 1), (None, 2), ("a", 1)]


def test_new_temporal_ops_fuzz_vs_duckdb(ray_session):
    """Randomized parity fuzz: OHLC, islands and run-length collapse
    must be invariant to block splits and match the window-SQL
    semantics on arbitrary data (ties, duplicates, singletons)."""
    import duckdb
    import ray.data

    from ie_ray.stages.temporal import (islands_per_key, ohlc_bars,
                                        run_length_intervals)

    rng = np.random.RandomState(97)
    for trial, parts in ((0, 3), (1, 7), (2, 1)):
        n = 400
        hour = 3_600_000_000
        t = pa.table({
            "event_id": pa.array(rng.permutation(n).astype("int64")),
            # coarse grid forces (ts, id) ties across blocks
            "ts": pa.array((rng.randint(0, 48, n) * (hour // 4))
                           .astype("int64")),
            "user_id": pa.array(rng.randint(0, 9, n).astype("int64")),
            "state": pa.array(np.array(["a", "b", "c"])[
                rng.randint(0, 3, n)]),
            "value": pa.array(np.round(
                rng.uniform(0.01, 50.0, n), 2)),
        })
        ds = ray.data.from_arrow(t).repartition(parts)
        con = duckdb.connect()
        con.register("t", t)

        from datetime import datetime

        def h_us(v):   # operator emits timestamp[us]; SQL int64 µs
            return int((v - datetime(1970, 1, 1)).total_seconds()
                       * 1e6)

        got = {(h_us(r["h"]), r["open_c"], r["high_c"], r["low_c"],
                r["close_c"], r["n"]) for r in ohlc_bars(
            ds, ts_col="ts", value_col="value",
            id_col="event_id").take_all()}
        want = set(map(tuple, con.execute("""
            WITH c AS (SELECT ts - ts % 3600000000 AS h, ts, event_id,
                              CAST(round(value*100) AS BIGINT) AS cents
                       FROM t),
            w AS (SELECT h, cents,
                  row_number() OVER (PARTITION BY h ORDER BY ts, event_id) ra,
                  row_number() OVER (PARTITION BY h ORDER BY ts DESC,
                                     event_id DESC) rd FROM c)
            SELECT h, max(CASE WHEN ra=1 THEN cents END),
                   max(cents), min(cents),
                   max(CASE WHEN rd=1 THEN cents END),
                   count(*) FROM w GROUP BY h""").fetchall()))
        assert got == want, ("ohlc", trial)

        day = pa.table({"user_id": t.column("user_id"),
                        "day": pa.array((np.asarray(t.column("ts"))
                                         // hour).astype("int64"))})
        got = {(r["user_id"], r["n_seq"], r["n_islands"],
                r["max_island_len"]) for r in islands_per_key(
            ray.data.from_arrow(day).repartition(parts),
            "user_id", "day").take_all()}
        con.register("d", day)
        want = set(map(tuple, con.execute("""
            WITH dd AS (SELECT DISTINCT user_id, day FROM d),
            r AS (SELECT user_id, day, day - row_number() OVER
                  (PARTITION BY user_id ORDER BY day) isl FROM dd),
            i AS (SELECT user_id, count(*) run FROM r
                  GROUP BY user_id, isl)
            SELECT user_id, sum(run), count(*), max(run)
            FROM i GROUP BY user_id""").fetchall()))
        assert got == want, ("islands", trial)

        got = {(r["user_id"], r["state"], r["n_events"], r["start_us"],
                r["end_us"]) for r in run_length_intervals(
            ds, "user_id", "ts", "event_id", "state").take_all()}
        want = set(map(tuple, con.execute("""
            WITH b AS (SELECT user_id, state, ts, event_id,
                  CASE WHEN lag(state) OVER w IS DISTINCT FROM state
                       THEN 1 ELSE 0 END brk FROM t
                  WINDOW w AS (PARTITION BY user_id
                               ORDER BY ts, event_id)),
            g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) grp
                  FROM b)
            SELECT user_id, min(state), count(*), min(ts), max(ts)
            FROM g GROUP BY user_id, grp""").fetchall()))
        assert got == want, ("runs", trial)
