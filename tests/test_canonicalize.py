"""Distributed connected components + canonical-id propagation."""

import pyarrow as pa
import pytest


def test_connected_components(ray_session):
    import ray.data
    from ie_ray.stages.link import connected_components
    # two components: {a,b,c,d} via chain, {x,y}
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array(["b", "c", "d", "y"], type=pa.string()),
        "b": pa.array(["a", "b", "c", "x"], type=pa.string()),
    }))
    comp = {r["node"]: r["component"]
            for r in connected_components(edges).take_all()}
    assert comp["a"] == comp["b"] == comp["c"] == comp["d"] == "a"
    assert comp["x"] == comp["y"] == "x"


def test_canonicalize_pipeline(ray_session, tmp_path):
    import ray
    import ray.data
    from ie_ray.sources.pages import write_fixture_tables
    from ie_ray.pipelines.kg import kg_triples
    from ie_ray.stages.link import (alias_edges_from_triples,
                                    canonicalize_ids, connected_components)
    d = str(tmp_path / "fx")
    write_fixture_tables(d, n_pages=80, pool_size=300)
    triples = kg_triples(d, concurrency=2).materialize()
    edges = alias_edges_from_triples(triples)
    assert edges.count() > 0  # appositive sentences produce _AKA edges
    comp = {r["node"]: r["component"]
            for r in connected_components(edges).take_all()}
    ref = ray.put(comp)
    canon = canonicalize_ids(triples, ref)
    rows = canon.take_all()
    # every aka pair now shares a canonical id
    for r in rows:
        if r["kind"] == "aka" and r["subj_id"] and r["obj_id"]:
            assert r["subj_id"] == r["obj_id"], r
