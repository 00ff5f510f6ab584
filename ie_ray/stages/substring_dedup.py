"""Exact-substring (fixed-width character n-gram) deduplication.

The public recipe this follows is the suffix-array exact-substring dedup of
Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ACL 2022): text that shares a sufficiently long verbatim character span
with another document is training-set duplication even when whole-document
hashes differ.  A distributed suffix array is overkill for a streaming
engine; the standard scalable re-expression (also used by that paper's
follow-ups) is fixed-width sliding character windows — a document pair
shares a span of length >= 2*W-1 iff they share at least one aligned
W-char window, and the per-doc *fraction* of windows seen elsewhere is a
robust contamination score.

Pipeline shape (all streaming, no driver materialization):

  docs --map_batches--> distinct (doc_id, gram) rows      [vectorized]
       --groupby(gram).count()--> gram -> n_docs           [one shuffle]
       --Dataset.join back on gram-->                      [hash join]
       --groupby(doc_id).mean(dup flag)--> dup_frac        [small shuffle]

Scale notes (100 TB):
- the gram rows are the big intermediate: ~len(text) rows/doc.  At web
  scale swap the raw W-char string key for a 128-bit hash of the window
  (collision odds ~n^2/2^128) and raise the stride: windows at stride
  s < W still catch every shared span of length >= W + s - 1 when both
  sides enumerate ALL offsets mod s — here we keep stride 1 so the DuckDB
  oracle (pure SQL substring enumeration) can verify values exactly.
- the gram groupby never builds giant groups: count() is a combining
  aggregate, so a "the "-style universal gram costs one partial row per
  block, not one group holding every doc.
- the join back is Ray's hash join (`num_partitions` sized to the
  cluster); nothing is broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ie_ray.stages.dedup import _join_partitions


def gram_rows_batch(batch: pa.Table, width: int) -> pa.Table:
    """Distinct W-char windows per document, vectorized.

    Uses a UTF-32 view so windows are *character* windows (DuckDB
    ``substring`` semantics), not byte windows — identical for ASCII,
    correct for multibyte text."""
    ids_out = []
    grams_out = []
    for did, txt in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
        n = len(txt)
        if n < width:
            continue
        cps = np.frombuffer(txt.encode("utf-32-le"), dtype=np.uint32)
        win = np.lib.stride_tricks.sliding_window_view(cps, width)
        flat = np.ascontiguousarray(win).view(
            np.dtype((np.void, width * 4))).ravel()
        uniq = np.unique(flat)
        ids_out.append(np.full(len(uniq), did, dtype=np.int64))
        grams_out.extend(
            u.tobytes().decode("utf-32-le") for u in uniq)
    if not ids_out:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "gram": pa.array([], type=pa.string())})
    return pa.table({
        "doc_id": pa.array(np.concatenate(ids_out), type=pa.int64()),
        "gram": pa.array(grams_out, type=pa.string())})


def substring_dup_frac(docs, width: int = 16, num_partitions=None):
    """Per-document fraction of distinct W-char windows that also occur in
    at least one OTHER document.  Returns Dataset (doc_id, dup_frac)
    with dup_frac rounded to 4 places (DuckDB half-away-from-zero)."""
    rows = docs.map_batches(
        lambda b, w=width: gram_rows_batch(b, w), batch_format="pyarrow")
    counts = rows.groupby("gram").count()  # rows are distinct per doc
    joined = rows.join(counts, "inner",
                       num_partitions=_join_partitions(num_partitions),
                       on=("gram",))

    def flag(t: pa.Table) -> pa.Table:
        dup = pc.cast(pc.greater_equal(t.column("count()"), 2),
                      pa.float64())
        return pa.table({"doc_id": t.column("doc_id"), "dup": dup})

    agg = joined.map_batches(flag, batch_format="pyarrow") \
        .groupby("doc_id").mean("dup")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "dup_frac": pc.round(t.column("mean(dup)"), 4,
                                 round_mode="half_towards_infinity")})

    return agg.map_batches(finish, batch_format="pyarrow")
