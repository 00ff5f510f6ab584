"""Distributed k-means matches its single-process NumPy twin exactly.

The distributed fit differs from the reference only in summation order
(per-block partial sums), so centroids agree to fp tolerance and the
final assignments — computed from those centroids with a deterministic
lowest-index argmin — agree exactly on clustered data.
"""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_table():
    return pq.read_table(SF + "/embeddings.parquet")


def test_kmeans_matches_numpy_reference(ray_session, emb_table):
    import ray.data
    from ie_ray.stages import clustering

    ds = ray.data.read_parquet(SF + "/embeddings.parquet",
                               override_num_blocks=8)
    centroids = clustering.kmeans_fit(ds, k=8, iters=5)
    got = (clustering.kmeans_assign(ds, centroids)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    vec_ids = np.asarray(emb_table.column("vec_id").to_pylist())
    m = np.asarray(emb_table.column("embedding").to_pylist())
    order = np.argsort(vec_ids)
    want = clustering.kmeans_reference(vec_ids, m, k=8, iters=5)

    assert len(got) == len(vec_ids)
    # `want` follows the table's row order; reindex to ascending vec_id
    # to line up with `got`
    want_by_vecid = want[order]
    assert (got.cluster.to_numpy() == want_by_vecid).all()


def test_label_centroids_vs_duckdb(ray_session, emb_table):
    """Per-label vector means (block partial sums + associative groupby)
    match DuckDB's unnest-and-avg oracle to fp tolerance."""
    import duckdb
    import __ray_entry__ as entrymod

    res = (entrymod.queries()["label_centroids"](SF)
           .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("embeddings", emb_table)
    orc = (con.execute(entrymod.oracle_sql()["label_centroids"]).df()
           .sort_values(["label", "dim"]).reset_index(drop=True))
    assert len(res) == len(orc) and len(res) > 0
    assert (res.label.to_numpy() == orc.label.to_numpy()).all()
    assert (res.dim.to_numpy() == orc.dim.to_numpy()).all()
    assert np.allclose(res.mean_v, orc.mean_v)


def test_embedding_outliers_vs_duckdb(ray_session, emb_table):
    """Distance-to-centroid outlier filter matches the SQL oracle: same
    vec_ids kept, fp-tolerant distances, and the filter is
    discriminating (neither empty nor everything)."""
    import duckdb
    import __ray_entry__ as entrymod

    res = (entrymod.queries()["embedding_outliers"](SF)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("embeddings", emb_table)
    orc = (con.execute(entrymod.oracle_sql()["embedding_outliers"]).df()
           .sort_values("vec_id").reset_index(drop=True))
    assert 0 < len(res) < emb_table.num_rows
    assert len(res) == len(orc)
    assert (res.vec_id == orc.vec_id).all()
    assert (res.label.to_numpy() == orc.label.to_numpy()).all()
    assert np.allclose(res.dist, orc.dist)


def test_kmeans_clusters_are_nontrivial(ray_session):
    import ray.data
    from ie_ray.stages import clustering

    ds = ray.data.read_parquet(SF + "/embeddings.parquet",
                               override_num_blocks=8)
    centroids = clustering.kmeans_fit(ds, k=8, iters=5)
    got = clustering.kmeans_assign(ds, centroids).to_pandas()
    # more than one cluster in use, and no cluster swallowed everything
    sizes = got.cluster.value_counts()
    assert len(sizes) >= 2
    assert sizes.max() < len(got)
