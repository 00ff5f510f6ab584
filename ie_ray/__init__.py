"""ie_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the extraction semantics of the reference engine
(marbles-ai/ie: CCG derivation → DRS → (subj, pred, obj) triples) as
streaming Ray Data pipelines over Arrow batches:

    pages (url, warc_ts, html, text, lang)
      → extract_text        (html → text, byte-identical per url)
      → exact_dedup         (content-hash shuffle)
      → segment_sentences   (flat explode page → sentences)
      → parse               (actor pool: sentence → CCG derivation)
      → compose             (actor pool: derivation → DRS conditions → triples)
      → entity link         (broadcast alias join)
      → canonicalize        (MinHash-LSH blocking + hash-min union-find)
      → graph materialize   (nodes/edges parquet + per-partition manifests)

Everything here is a fresh implementation; reference files are cited in
docstrings (path:line into /root/reference) only to document parity.
"""

__version__ = "0.1.0"
