"""The flagship pipeline: pages → triples → linked graph.

Stage graph (all streaming, no mid-pipeline materialization):

    read_parquet(pages, columns=[url, html, lang])
      → extract_text (stateless map_batches, Arrow)
      → filter lang == 'en'
      → add_page_hash → online dedup (sharded owner-index actors)
      → segment (flat explode page → sentence rows)
      → ParseComposeActor (ONE actor pool: replay/CKY parse + compose +
        entity linking fused — derivation strings and unlinked triples,
        the two largest intermediates, never enter the object store;
        broadcast derivation + alias dicts, per-actor Composer LRU)
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
    # v3: chrome <a href> links for the link-graph operator (v2: multi-domain layouts)
    d = "/tmp/ie_ray_fixtures/v3_p%d_s%d" % (n_pages, pool_size)
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
               link: bool = True,
               alias_table_path: Optional[str] = None,
               dedup_shards=None) -> "ray.data.Dataset":
    """pages → linked triples Dataset (lazy; caller consumes/writes).

    ``alias_table_path``: external entity-KB alias table for linking —
    any parquet with columns ``alias`` (normalized surface form),
    ``entity_id``, ``prior`` (disambiguation weight, highest wins) and
    ``title`` (canonical title for the reference's prefix-score rule,
    ccg.py:1887-1917).  Swap in a real KB (e.g. a Wikipedia
    anchor-text dump reduced to that schema) without touching the
    pipeline; defaults to ``<fixture_dir>/alias_table.parquet``.  Env
    override: ``IE_RAY_ALIAS_TABLE``."""
    fixture_dir = fixture_dir or default_fixture_dir()
    alias_table_path = (alias_table_path
                        or os.environ.get("IE_RAY_ALIAS_TABLE")
                        or os.path.join(fixture_dir, "alias_table.parquet"))
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
    # Half-CPU actor slots ONLY below 6 CPUs (pytest-size clusters), where
    # full reservations would deadlock the task operators.  At ≥6 the
    # accounting must be honest — 0.5-CPU actors oversubscribe the host
    # (each busy actor burns a real core), which inflates small-cluster
    # throughput and corrupts the N-vs-4N scaling measurement.
    # IE_RAY_HONEST_ACTOR_CPUS forces full reservations at ANY cluster
    # size — the scaling harness sets it so a small leg picked below 6
    # CPUs (adaptive levels) can't silently burn 2× its nominal cores.
    actor_cpus = 1 if (ncpu_total >= 6
                       or os.environ.get("IE_RAY_HONEST_ACTOR_CPUS")) else 0.5
    if pages_ds is None:
        pages_ds = ray.data.read_parquet(
            os.path.join(fixture_dir, "pages"),
            columns=["url", "html", "lang"],
            override_num_blocks=max(ncpu_total * 2, 8))

    ds = pages_ds.map_batches(extract_text_batch, batch_format="pyarrow")
    ds = filter_lang(ds, "en")
    if dedup:
        # online sharded hash index (reference semantics: probe-and-insert,
        # aws/__init__.py:115-136) — no all-to-all shuffle on the hot path.
        # ``dedup_shards`` lets a sharded/resumable caller share ONE index
        # across per-shard pipeline runs (cross-shard duplicates must not
        # escape just because the work is checkpointed per shard).
        from ..stages.dedup_index import DedupFilter, create_dedup_index
        shards = dedup_shards if dedup_shards is not None else \
            create_dedup_index(num_shards=max(4, ncpu_total // 4))
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
    cold = os.environ.get("IE_RAY_COLD_PARSER", "").lower() \
        not in ("", "0", "false")
    # cold mode must not pay the replay-corpus load it will never use
    # (derivations.parquet is GBs at benchmark scale, and kg_resumable
    # calls this once per shard)
    derivations_ref = ray.put({}) if cold \
        else ray.put(_load_derivation_map(fixture_dir))
    # parse, compose AND entity linking run fused in ONE actor pool: the
    # per-sentence derivation strings (the largest intermediate) and the
    # 9M-row linked-triple hop never enter the object store.  The pool
    # takes 3/4 of the cluster: the feeder stages (read, extract,
    # lang-filter, segment) are vectorized Arrow kernels that keep
    # ~24 parse actors fed from ~3 task CPUs (interleaved A/B at 32
    # CPUs, 2.4M pages: cap 16 → 28.4k docs/s, cap 21 → 34.4k, cap 24
    # → 35.7k best-of-2), so reserving half the cluster for them
    # starved the parser — the actual scaling bottleneck.
    from ..stages.compose_stage import ParseComposeActor
    fused_kwargs = {"derivations": derivations_ref}
    if cold:
        # benchmark honesty mode: a REAL crawl has no replay corpus and
        # no fixture-shaped heuristic — every sentence pays the full
        # supertagger+CKY path (BASELINE.md cold-parser row)
        fused_kwargs["heuristic_fallback"] = False
    if link:
        fused_kwargs["alias_map"] = ray.put(load_alias_map(
            alias_table_path))
    fused_cap = int(os.environ.get("IE_RAY_FUSED_CAP", "0")) or \
        max(concurrency[1], int(
            ray.cluster_resources().get("CPU", 4)) * 3 // 4)
    ds = ds.map_batches(
        ParseComposeActor,
        fn_constructor_kwargs=fused_kwargs,
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(concurrency[0], fused_cap),
        num_cpus=actor_cpus)
    return ds


def _page_shards(fixture_dir: str, num_shards: int):
    """Contiguous chunks of the input parquet files — the resume unit.

    Contiguity preserves row adjacency so the online dedup filter sees
    syndicated duplicates (planted next to their source) in one shard."""
    import glob as _glob
    files = sorted(_glob.glob(os.path.join(fixture_dir, "pages", "*.parquet")))
    if not files:
        return []
    num_shards = min(num_shards, len(files))
    per = (len(files) + num_shards - 1) // num_shards
    return [files[i * per:(i + 1) * per]
            for i in range(num_shards) if files[i * per:(i + 1) * per]]


def kg_resumable(fixture_dir: Optional[str] = None,
                 out_dir: str = "/tmp/ie_ray_resumable",
                 num_shards: int = 4, concurrency=None,
                 _fail_after: Optional[int] = None) -> dict:
    """Pages-level checkpoint-resume flagship (F1, north_rule lineage):

    input parquet files are grouped into contiguous shards; each shard
    runs the full pages→triples pipeline and lands atomically (write to a
    tmp dir, ``os.rename``, then stamp a lineage manifest naming its
    input files).  A crashed run re-invoked with the same ``out_dir``
    SKIPS every shard whose manifest exists — the expensive parse/compose
    work is never recomputed — and only the cheap final graph aggregation
    re-runs over the landed triples.  ``_fail_after`` is a test hook that
    simulates a crash after N shards.
    """
    import shutil

    from ..stages.graph import (build_edges, build_nodes, manifest_path,
                                partition_done, write_graph)
    import pyarrow.parquet as pq

    fixture_dir = fixture_dir or default_fixture_dir()
    os.makedirs(os.path.join(out_dir, "manifests"), exist_ok=True)
    shards = _page_shards(fixture_dir, num_shards)

    # ONE dedup index shared across every shard of this run, so
    # cross-shard duplicate pages dedup exactly like the single-pass
    # flagship.  On resume, the index is re-SEEDED from the completed
    # shards' input files (extract+hash only — the expensive
    # parse/compose work still skips), so remaining shards see the same
    # membership a crash-free run would have.
    import pyarrow as pa

    from ..stages.dedup_index import DedupFilter, create_dedup_index
    ncpu_total = int(ray.cluster_resources().get("CPU", 4))
    dedup_shards = create_dedup_index(num_shards=max(4, ncpu_total // 4))
    done_files = [files for k, files in enumerate(shards)
                  if partition_done(out_dir, "triples-shard%03d" % k)]
    if done_files:
        seed = ray.data.read_parquet(
            [f for fl in done_files for f in fl],
            columns=["url", "html", "lang"])
        seed = filter_lang(seed.map_batches(
            extract_text_batch, batch_format="pyarrow"), "en")
        seed = seed.map_batches(add_page_hash, batch_format="pyarrow")
        flt = DedupFilter(dedup_shards)
        # consume for the insert side effect; only counts reach the driver
        seed.map_batches(
            lambda t, _f=flt: pa.table(
                {"n": pa.array([_f(t).num_rows], type=pa.int64())}),
            batch_format="pyarrow").count()

    completed_now, skipped = 0, 0
    for k, files in enumerate(shards):
        part = "triples-shard%03d" % k
        final_dir = os.path.join(out_dir, "triples", "shard=%03d" % k)
        if partition_done(out_dir, part):
            skipped += 1
            continue
        tmp_dir = final_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        pages = ray.data.read_parquet(files, columns=["url", "html", "lang"])
        triples = kg_triples(fixture_dir, pages_ds=pages,
                             concurrency=concurrency,
                             dedup_shards=dedup_shards)
        triples.write_parquet(tmp_dir)
        os.rename(tmp_dir, final_dir)
        rows = sum(pq.ParquetFile(os.path.join(final_dir, f)).metadata.num_rows
                   for f in os.listdir(final_dir) if f.endswith(".parquet"))
        import json as _json
        import time as _time
        man = {"partition": part, "table": "triples", "rows": rows,
               "inputs": files, "written_at": _time.time()}
        mp = manifest_path(out_dir, part)
        with open(mp + ".tmp", "w") as f:
            _json.dump(man, f)
        os.replace(mp + ".tmp", mp)
        completed_now += 1
        if _fail_after is not None and completed_now >= _fail_after:
            raise RuntimeError("simulated crash after %d shards"
                               % completed_now)

    # final aggregation over all landed triples (cheap relative to compose)
    triples = ray.data.read_parquet(os.path.join(out_dir, "triples"))
    good = triples.filter(expr="kind != 'quarantine' and kind != 'empty'")
    graph_dir = os.path.join(out_dir, "graph")
    shutil.rmtree(graph_dir, ignore_errors=True)
    manifests = write_graph(build_nodes(good), build_edges(good), graph_dir)
    return {
        "out_dir": out_dir,
        "shards": len(shards),
        "shards_skipped": skipped,
        "shards_computed": completed_now,
        "triples": triples.count(),
        "nodes": sum(m["rows"] for m in manifests["nodes"]),
        "edges": sum(m["rows"] for m in manifests["edges"]),
    }


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
