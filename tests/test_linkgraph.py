"""Host link-graph extraction + weighted PageRank.

Golden on planted HTML; the distributed weighted PageRank must agree
with its single-process NumPy twin; synthetic pages must yield a
deterministic non-empty host graph.
"""

import pyarrow as pa
import pytest

from ie_ray.stages.linkgraph import host_pagerank, page_link_edges
from ie_ray.stages.pagerank import pagerank_weighted_reference

PAGES = pa.table({
    "url": pa.array(["https://a.com/x", "https://a.com/y",
                     "https://b.com/z"]),
    "html": pa.array([
        b'<nav><a href="https://b.com/1">x</a>'
        b'<a href="https://b.com/2">y</a>'
        b'<a href="https://c.com/1">z</a></nav><article><p>t</p></article>',
        b'<a href="https://b.com/3">w</a><p>no links in text</p>',
        b'<a href="https://a.com/1">back</a><a href="relative/skip">r</a>',
    ], type=pa.binary()),
})


@pytest.mark.usefixtures("ray_session")
def test_link_edges_golden():
    import ray.data
    got = sorted((r["src_host"], r["dst_host"], r["n"])
                 for r in page_link_edges(
                     ray.data.from_arrow(PAGES)).take_all())
    assert got == [("a.com", "b.com", 3), ("a.com", "c.com", 1),
                   ("b.com", "a.com", 1)]


@pytest.mark.usefixtures("ray_session")
def test_host_pagerank_matches_numpy_twin():
    import ray.data
    got = {r["node"]: r["rank"]
           for r in host_pagerank(ray.data.from_arrow(PAGES),
                                  iters=8).take_all()}
    want = pagerank_weighted_reference(
        ["a.com", "a.com", "b.com"], ["b.com", "c.com", "a.com"],
        [3, 1, 1], iters=8)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
    # weights matter: b.com gets 3/4 of a.com's mass, c.com only 1/4
    assert got["b.com"] > got["c.com"]


@pytest.mark.usefixtures("ray_session")
def test_synthetic_pages_have_link_graph():
    import ray.data
    from ie_ray.sources.pages import DOMAINS, _LINK_HOSTS, _pages_table
    from ie_ray.sources.pages import synthesize_pages
    rows = synthesize_pages(120)
    ds = ray.data.from_arrow(_pages_table(rows).select(["url", "html"]))
    edges = page_link_edges(ds).take_all()
    srcs = {r["src_host"] for r in edges}
    dsts = {r["dst_host"] for r in edges}
    assert srcs <= set(DOMAINS) and srcs
    assert dsts <= set(DOMAINS) | set(_LINK_HOSTS)
    assert any(d in _LINK_HOSTS for d in dsts)
    # determinism: a second synthesis yields the identical edge table
    edges2 = page_link_edges(
        ray.data.from_arrow(_pages_table(synthesize_pages(120))
                            .select(["url", "html"]))).take_all()
    key = lambda r: (r["src_host"], r["dst_host"], r["n"])  # noqa: E731
    assert sorted(map(key, edges)) == sorted(map(key, edges2))
