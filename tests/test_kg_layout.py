"""KG edge layout integration: z-order clustering on the write path.

North-rule tie-in: graph materialization writes partitioned Parquet;
z-clustering the edge files by (subj-hash, obj-hash) bounds every
file's 2-D key footprint so a reader filtering on EITTHER endpoint
prunes files from min/max stats alone.
"""

import glob
import os
import shutil
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_edges_zorder_roundtrip_and_pruning(ray_session):
    import ray.data

    from ie_ray.stages.zorder import cluster_by_zorder

    rng = np.random.RandomState(53)
    n = 20_000
    edges = pa.table({
        "subj_id": pa.array(["e%d" % i for i in
                             rng.randint(0, 400, n)]),
        "pred": pa.array(["p%d" % i for i in rng.randint(0, 5, n)]),
        "obj_id": pa.array(["e%d" % i for i in
                            rng.randint(0, 400, n)]),
        "n": pa.array(np.ones(n, dtype=np.int64)),
    })

    def add_hashes(t: pa.Table) -> pa.Table:
        hs = [zlib.crc32(s.encode()) & 0xFFFFF
              for s in t.column("subj_id").to_pylist()]
        ho = [zlib.crc32(s.encode()) & 0xFFFFF
              for s in t.column("obj_id").to_pylist()]
        return (t.append_column("hs", pa.array(hs, type=pa.int64()))
                .append_column("ho", pa.array(ho, type=pa.int64())))

    ds = ray.data.from_arrow(edges).repartition(8) \
        .map_batches(add_hashes, batch_format="pyarrow")
    clustered = cluster_by_zorder(ds, "hs", "ho").repartition(16)

    out = "/tmp/ie_ray_test_zorder_edges"
    shutil.rmtree(out, ignore_errors=True)
    clustered.write_parquet(out)

    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert len(files) >= 2

    # 1) lossless: the edge multiset survives layout + write + read
    back = pa.concat_tables([pq.read_table(f) for f in files])
    key = lambda t: sorted(zip(t.column("subj_id").to_pylist(),  # noqa
                               t.column("pred").to_pylist(),
                               t.column("obj_id").to_pylist()))
    assert key(back) == key(edges)

    # 2) pruning: per-file (hs, ho) bbox area far below full extent
    areas = []
    for f in files:
        t = pq.read_table(f, columns=["hs", "ho"])
        hs = np.asarray(t.column("hs"))
        ho = np.asarray(t.column("ho"))
        areas.append((int(hs.max()) - int(hs.min()) + 1)
                     * (int(ho.max()) - int(ho.min()) + 1))
    full = (1 << 20) ** 2
    assert float(np.mean(areas)) < full / 4, np.mean(areas)
    shutil.rmtree(out, ignore_errors=True)
