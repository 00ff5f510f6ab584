"""End-to-end Ray pipeline tests at small fixture scale."""

import collections
import os

import pytest


@pytest.fixture(scope="module")
def fixture_dir(ray_session, tmp_path_factory):
    from ie_ray.sources.pages import write_fixture_tables
    d = str(tmp_path_factory.mktemp("fixtures"))
    write_fixture_tables(d, n_pages=60, pool_size=300)
    return d


def test_extraction_byte_identity(ray_session, fixture_dir):
    import ray.data
    from ie_ray.stages.extract import verify_extraction_batch
    ds = ray.data.read_parquet(os.path.join(fixture_dir, "pages"))
    res = ds.map_batches(verify_extraction_batch, batch_format="pyarrow")
    rows = res.take_all()
    assert rows and all(r["identical"] for r in rows)


def test_multidomain_extraction_unit():
    """Byte-identity per container contract (S2: reuters/nyt/wapo/fox
    + generic <article> fallback); boilerplate <p> must be dropped."""
    from ie_ray.sources.html import extract_text
    from ie_ray.sources.pages import _LAYOUTS, _page_html
    paras = ["First paragraph here.", "Second one, with <b>markup</b>."]
    want = "First paragraph here.\nSecond one, with markup."
    for layout in _LAYOUTS:
        html = _page_html("Title", paras, layout)
        assert extract_text(html.encode("utf-8")) == want, layout
    generic = ("<html><body><p>nav junk</p><article><p>First paragraph "
               "here.</p><p>Second one.</p></article></body></html>")
    assert extract_text(generic) == "First paragraph here.\nSecond one."
    assert extract_text("<html><body><p>no container</p></body></html>") == ""


def test_exact_dedup(ray_session, fixture_dir):
    import ray.data
    from ie_ray.stages.extract import add_page_hash, exact_dedup
    ds = ray.data.read_parquet(os.path.join(fixture_dir, "pages"))
    ds = ds.map_batches(add_page_hash, batch_format="pyarrow")
    total = ds.count()
    deduped = exact_dedup(ds).count()
    assert deduped < total  # the synthesizer plants syndicated duplicates
    hashes = [r["page_hash"] for r in
              exact_dedup(ds).select_columns(["page_hash"]).take_all()]
    assert len(hashes) == len(set(hashes))


def test_kg_triples_and_pr(ray_session, fixture_dir):
    from ie_ray.pipelines.kg import kg_triples
    from ie_ray.pipelines.metrics import triple_pr
    ds = kg_triples(fixture_dir, concurrency=2)
    rows = ds.take_all()
    kinds = collections.Counter(r["kind"] for r in rows)
    assert kinds["arg"] > 0
    pr = triple_pr(kg_triples(fixture_dir, concurrency=2), fixture_dir)
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr


def test_quarantine_rows_present(ray_session, fixture_dir):
    # the synthesizer plants an over-long sentence; it must surface as a
    # quarantine row, not an exception
    from ie_ray.pipelines.kg import kg_triples
    ds = kg_triples(fixture_dir, concurrency=2, dedup=False, link=False)
    errs = [r["error"] for r in ds.take_all() if r["kind"] == "quarantine"]
    assert any(e == "too_long" for e in errs)


def test_graph_write_and_resume(ray_session, fixture_dir, tmp_path):
    from ie_ray.pipelines.kg import kg_full
    out = str(tmp_path / "graph")
    res = kg_full(fixture_dir, out_dir=out, concurrency=2)
    assert res["nodes"] > 0 and res["edges"] > 0
    assert os.path.isdir(os.path.join(out, "manifests"))
    import json
    mans = [m for m in os.listdir(os.path.join(out, "manifests"))
            if m.endswith(".json")]
    assert len(mans) == res["node_partitions"] + res["edge_partitions"]
    m = json.load(open(os.path.join(out, "manifests", mans[0])))
    assert m["rows"] >= 0 and "partition" in m
    # resume: a second run must not duplicate output
    res2 = kg_full(fixture_dir, out_dir=out, concurrency=2)
    assert res2["nodes"] == res["nodes"] and res2["edges"] == res["edges"]
