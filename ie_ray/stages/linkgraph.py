"""Web link-graph construction from raw page HTML.

The reference's newsfeed scrapers walk anchor tags to discover article
URLs (``ie/newsfeed/scrape.py`` RSS/link following); at CC scale the
same signal becomes the web graph itself — the canonical input to
host-level quality ranking (PageRank over hosts à la Common Crawl's
host-level webgraph releases, a public dataset/recipe).

Shape: href extraction is a block-local vectorized kernel (polars
``str.extract_all`` — no Python loop over rows), immediately reduced to
per-block ``(src_host, dst_host) → n`` partial counts, so the single
exchange is bounded by |hosts|² not by total link count.  Host
PageRank reuses ``ie_ray.stages.pagerank`` (one join + one groupby per
round) over the *weighted* host edges — each edge's contribution is
scaled by its link count, so the aggregated table feeds the loop
directly and no per-link row ever reaches the iteration.
"""

from __future__ import annotations

import pyarrow as pa

_HREF_RE = r'href="https?://([^/"]+)[^"]*"'
_HOST_RE = r"https?://([^/]+)/"


def page_link_edges(pages):
    """(src_host, dst_host, n) host-level link counts from the pages
    table (url:string, html:binary)."""

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl
        import pyarrow.compute as pc
        # zero-copy-ish binary→string cast (pages are utf-8 by contract);
        # a per-row Python .decode() loop here doubled the stage cost
        html = pc.cast(t.column("html"), pa.string())
        df = pl.DataFrame({
            "src_host": pl.from_arrow(t.column("url"))
                          .str.extract(_HOST_RE, 1),
            "html": pl.from_arrow(html),
        })
        e = (df.with_columns(
                pl.col("html").str.extract_all(_HREF_RE).alias("dst"))
               .drop("html").explode("dst")
               .filter(pl.col("dst").is_not_null())
               .with_columns(pl.col("dst").str.extract(_HREF_RE, 1)
                               .alias("dst_host"))
               .drop("dst")
               .group_by(["src_host", "dst_host"])
               .agg(pl.len().cast(pl.Int64).alias("n")))
        out = e.to_arrow()
        return out.cast(pa.schema([
            pa.field(f.name, pa.string() if f.type == pa.large_string()
                     else f.type) for f in out.schema]))

    from ie_ray.stages.relational import bucketed_aggregate
    # host-pair key domain is web-scale-large — bucketed reduce
    agg = bucketed_aggregate(
        pages.map_batches(partial, batch_format="pyarrow"),
        ["src_host", "dst_host"], [("n", "sum")])
    return agg.map_batches(
        lambda t: pa.table({
            "src_host": t.column("src_host"),
            "dst_host": t.column("dst_host"),
            "n": t.column("n_sum").cast(pa.int64())}),
        batch_format="pyarrow")


def host_pagerank(pages, iters: int = 10, damping: float = 0.85):
    """PageRank over the host graph: (node, rank) Dataset.

    Runs on the COUNT-aggregated edge table — ``pagerank`` splits each
    source's mass across edge rows by out-degree; for the host graph we
    want mass split by link count, so we pre-scale via edge weights:
    expanding back to per-link rows would be O(total links), weighting
    keeps the loop input at O(|hosts|²).
    """
    from ie_ray.stages.pagerank import pagerank_weighted
    edges = page_link_edges(pages)
    renamed = edges.map_batches(
        lambda t: t.rename_columns(["subj_id", "obj_id", "w"]),
        batch_format="pyarrow")
    return pagerank_weighted(renamed, iters=iters, damping=damping)
