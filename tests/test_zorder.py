"""Morton interleave: roundtrip, aligned-square theorem, layout win."""

import numpy as np
import pyarrow as pa


def test_morton_roundtrip_random():
    from ie_ray.stages.zorder import morton2, morton2_decode

    rng = np.random.RandomState(17)
    x = rng.randint(0, 1 << 21, 10_000).astype(np.int64)
    y = rng.randint(0, 1 << 21, 10_000).astype(np.int64)
    gx, gy = morton2_decode(morton2(x, y))
    assert (gx == x).all() and (gy == y).all()
    # masking: out-of-range inputs fold onto their low 21 bits
    assert morton2(np.array([1 << 21]), np.array([0]))[0] == 0


def test_morton_aligned_range_is_square():
    """THE z-order pruning theorem: on a full 2^n x 2^n grid, every
    aligned key range [q*4^m, (q+1)*4^m) is exactly one 2^m x 2^m
    axis-aligned square — so file-level min/max prune BOTH columns."""
    from ie_ray.stages.zorder import morton2_decode

    n, m = 5, 3   # 32x32 grid, 8x8 buckets
    keys = np.arange(1 << (2 * n), dtype=np.int64)
    x, y = morton2_decode(keys)
    for q in range(1 << (2 * (n - m))):
        lo, hi = q * (1 << (2 * m)), (q + 1) * (1 << (2 * m))
        bx, by = x[lo:hi], y[lo:hi]
        side = 1 << m
        assert bx.max() - bx.min() == side - 1
        assert by.max() - by.min() == side - 1
        assert len(set(zip(bx.tolist(), by.tolist()))) == side * side


def test_morton_sql_parity():
    """The generated SQL reproduces the numpy key bit-for-bit."""
    import duckdb

    from ie_ray.stages.zorder import morton2, morton2_sql

    rng = np.random.RandomState(23)
    x = rng.randint(0, 1 << 21, 3000).astype(np.int64)
    y = rng.randint(0, 1 << 21, 3000).astype(np.int64)
    want = morton2(x, y)
    con = duckdb.connect()
    con.register("t", pa.table({"x": x, "y": y}))
    got = con.sql("SELECT %s AS z FROM t"
                  % morton2_sql("x", "y")).df()["z"].values
    assert (got == want).all()


def test_cluster_by_zorder_layout(ray_session):
    """Z-sorted blocks have bounded 2-D footprints: the mean block
    bbox area is far below the full-extent stripes an x-only or
    arrival-order layout produces for the non-sorted column."""
    import ray.data

    from ie_ray.stages.zorder import cluster_by_zorder

    rng = np.random.RandomState(31)
    n = 1 << 14
    t = pa.table({
        "x": pa.array(rng.randint(0, 256, n), type=pa.int64()),
        "y": pa.array(rng.randint(0, 256, n), type=pa.int64()),
    })
    out = cluster_by_zorder(ray.data.from_arrow(t).repartition(8),
                            "x", "y").repartition(16)

    areas = []
    for b in out.iter_batches(batch_format="pyarrow",
                              batch_size=n // 16):
        bx, by = np.asarray(b.column("x")), np.asarray(b.column("y"))
        areas.append((int(bx.max()) - int(bx.min()) + 1)
                     * (int(by.max()) - int(by.min()) + 1))
    mean_area = float(np.mean(areas))
    # arrival order: every block spans ~the whole 256x256 = 65536 square
    assert mean_area < 65536 / 4, mean_area
    # keys survive the exchange: decode returns the original columns
    zk = np.concatenate([np.asarray(b.column("zkey")) for b in
                         out.iter_batches(batch_format="pyarrow")])
    assert len(zk) == n and (np.diff(np.sort(zk)) >= 0).all()
