"""ε-band self-join count vs brute force (bucket-boundary ties)."""

import numpy as np
import pyarrow as pa


def test_band_pairs_matches_bruteforce(ray_session):
    import os
    import tempfile

    import pyarrow.parquet as pq
    import __ray_entry__ as entry

    rng = np.random.RandomState(61)
    n = 3_000
    # values concentrated on a coarse grid: many exact bucket-boundary
    # ties and duplicates — the adversarial case for the ghost logic
    cents = rng.randint(0, 40, n) * 5 + rng.randint(0, 3, n)
    types = np.array(["a", "b"])[rng.randint(0, 2, n)]
    d = tempfile.mkdtemp(prefix="band_", dir="/tmp")
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.arange(n, dtype=np.int64))
        .cast(pa.timestamp("us")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64)),
        "event_type": pa.array(types),
        "value": pa.array(cents / 100.0),
        "props": pa.array(["{}"] * n),
    }), os.path.join(d, "events.parquet"))

    try:
        got = {r["event_type"]: r["n_pairs"] for r in
               entry.queries()["events_value_band_pairs"](d)
               .take_all()}
    finally:
        import shutil
        shutil.rmtree(d, ignore_errors=True)
    want = {}
    for ty in ("a", "b"):
        c = np.sort(cents[types == ty]).astype(np.int64)
        diff = np.abs(c[:, None] - c[None, :]) <= 5
        want[ty] = int((diff.sum() - len(c)) // 2)
    assert got == want
