"""The flagship pipeline: pages → triples → linked graph.

Stage graph (all streaming, no mid-pipeline materialization):

    read_parquet(pages, columns=[url, html, lang])
      → extract_text (stateless map_batches, Arrow)
      → filter lang == 'en'
      → add_page_hash → online dedup (sharded owner-index actors)
      → segment (flat explode page → sentence rows)
      → ReplayParserActor (actor pool, broadcast derivation dict)
      → ComposeActor (actor pool, per-actor Composer state + LRU)
      → LinkActor (broadcast alias dict)
      → [canonicalize → build_nodes/build_edges groupbys
         → hash-partitioned parquet + lineage manifests]

Parity with the reference's daemon chain: SURVEY.md §3.2; re-architecture
rationale §4.
"""

from __future__ import annotations

import os
from typing import Optional

import ray
import ray.data

from ..sources.pages import write_fixture_tables
from ..stages.compose_stage import ComposeActor
from ..stages.extract import add_page_hash, extract_text_batch, filter_lang
from ..stages.link import LinkActor, load_alias_map
from ..stages.parse import ReplayParserActor
from ..stages.segment import segment_batch

_FIXTURE_CACHE = {}


def default_fixture_dir(n_pages: int = 200, pool_size: int = 1200) -> str:
    """Deterministic fixture tables under /tmp, generated once per size."""
    d = "/tmp/ie_ray_fixtures/p%d_s%d" % (n_pages, pool_size)
    marker = os.path.join(d, "alias_table.parquet")
    if not os.path.exists(marker):
        write_fixture_tables(d, n_pages=n_pages, pool_size=pool_size)
    return d


def _load_derivation_map(fixture_dir: str) -> dict:
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(fixture_dir, "derivations.parquet"))
    return dict(zip(t.column("sent_hash").to_pylist(),
                    t.column("ccgbank").to_pylist()))


def kg_triples(fixture_dir: Optional[str] = None,
               pages_ds: Optional["ray.data.Dataset"] = None,
               concurrency=None,
               dedup: bool = True,
               link: bool = True) -> "ray.data.Dataset":
    """pages → linked triples Dataset (lazy; caller consumes/writes)."""
    fixture_dir = fixture_dir or default_fixture_dir()
    if concurrency is None:
        # elastic pools: each heavy stage may grow to a third of the cluster
        # (three heavy stages — parse, compose, link); a moderate prestart
        # minimum cuts the ramp-up time that otherwise dominates short runs
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        cap = max(2, ncpu // 3)
        # prestart minimum only when there's headroom — on tiny clusters the
        # reserved actors would starve the stateless task operators
        concurrency = (min(4, cap), cap) if ncpu >= 16 else (1, cap)
    elif isinstance(concurrency, int):
        concurrency = (1, concurrency)
    ncpu_total = int(ray.cluster_resources().get("CPU", 4))
    # on tiny clusters, full-CPU actor reservations deadlock the task ops
    # (3 pools × 1 CPU + dedup leaves nothing for reads) — use half-CPU slots
    actor_cpus = 1 if ncpu_total >= 16 else 0.5
    if pages_ds is None:
        pages_ds = ray.data.read_parquet(
            os.path.join(fixture_dir, "pages"),
            columns=["url", "html", "lang"],
            override_num_blocks=max(ncpu_total * 2, 8))

    ds = pages_ds.map_batches(extract_text_batch, batch_format="pyarrow")
    ds = filter_lang(ds, "en")
    if dedup:
        # online sharded hash index (reference semantics: probe-and-insert,
        # aws/__init__.py:115-136) — no all-to-all shuffle on the hot path
        from ..stages.dedup_index import DedupFilter, create_dedup_index
        shards = create_dedup_index(num_shards=max(4, ncpu_total // 4))
        ds = ds.map_batches(add_page_hash, batch_format="pyarrow")
        ds = ds.map_batches(DedupFilter,
                            fn_constructor_kwargs={"shards": shards},
                            batch_format="pyarrow", batch_size=8192,
                            concurrency=concurrency
                            if isinstance(concurrency, tuple) else (1, 4),
                            num_cpus=min(0.5, actor_cpus))
    ds = ds.map_batches(segment_batch, batch_format="pyarrow")

    # batch sizes: parser input rows are PAGES (fused with segmentation —
    # ~8 sentences each), compose/link input rows are sentences/triples.
    # Sized so each stage runs a few hundred tasks per million pages —
    # enough to saturate the pools without drowning the driver's scheduling
    # loop (the dominant serial cost at small scale).
    derivations_ref = ray.put(_load_derivation_map(fixture_dir))
    ds = ds.map_batches(
        ReplayParserActor,
        fn_constructor_kwargs={"derivations": derivations_ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
        num_cpus=actor_cpus)
    # entity linking is fused into the compose actor (alias dict broadcast
    # once): one less 9M-row hop through the object store per million pages
    compose_kwargs = {}
    if link:
        compose_kwargs["alias_map"] = ray.put(load_alias_map(
            os.path.join(fixture_dir, "alias_table.parquet")))
    ds = ds.map_batches(
        ComposeActor,
        fn_constructor_kwargs=compose_kwargs,
        batch_format="pyarrow",
        batch_size=32768,
        concurrency=concurrency,
        num_cpus=actor_cpus)
    return ds


def kg_full(fixture_dir: Optional[str] = None, out_dir: str = "/tmp/ie_ray_out",
            concurrency=None, canonicalize: bool = True) -> dict:
    """Full run: triples → canonicalize → nodes/edges → partitioned parquet
    + manifests.  Returns summary counts (small driver-side values only)."""
    from ..stages.graph import build_edges, build_nodes, write_graph
    from ..stages.link import (alias_edges_from_triples, canonicalize_ids_ds,
                               connected_components)

    # materialize the (reduced) triples once — kg_full consumes them three
    # ways (quarantine sink, nodes, edges) and re-running the whole page
    # pipeline per consumer would triple the work.  Triples are ~100× smaller
    # than the page input, so this is a deliberate small-side checkpoint,
    # not a full-input materialization.
    triples = kg_triples(fixture_dir, concurrency=concurrency).materialize()
    if canonicalize:
        # labels stay a Dataset end-to-end: CC by join-based label
        # propagation, relabel by hash join — nothing O(nodes) on the driver
        labels = connected_components(alias_edges_from_triples(triples))
        triples = canonicalize_ids_ds(triples, labels).materialize()
    # quarantine rows flow to their own sink; good rows to the graph
    good = triples.filter(expr="kind != 'quarantine' and kind != 'empty'")
    quarantine = triples.filter(expr="kind == 'quarantine'")
    os.makedirs(os.path.join(out_dir, "quarantine"), exist_ok=True)
    quarantine.write_parquet(os.path.join(out_dir, "quarantine"))
    # provenance-bearing triples table (url/sent-level lineage for every edge)
    os.makedirs(os.path.join(out_dir, "triples"), exist_ok=True)
    good.write_parquet(os.path.join(out_dir, "triples"))

    nodes = build_nodes(good)
    edges = build_edges(good)
    manifests = write_graph(nodes, edges, out_dir)
    return {
        "out_dir": out_dir,
        "node_partitions": len(manifests["nodes"]),
        "edge_partitions": len(manifests["edges"]),
        "nodes": sum(m["rows"] for m in manifests["nodes"]),
        "edges": sum(m["rows"] for m in manifests["edges"]),
    }
