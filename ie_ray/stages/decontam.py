"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation set.

The standard LLM-training hygiene pass (reference has no equivalent —
this is one of the §2.8-style training-data operators added on top):
an eval benchmark is tiny (KBs–MBs), so its n-gram set is built once,
``ray.put`` into the object store, and every training batch membership-
checks against the broadcast set inside an actor pool — the canonical
small-side broadcast join.  The 100-TB-side (training corpus) streams;
nothing corpus-sized ever concentrates on the driver.

Gram extraction matches :data:`DECONTAM_SQL` byte-for-byte (ASCII fold
+ ``[0-9a-z_]+`` words, space-joined n-grams, per-doc distinct), so the
op carries an exact DuckDB oracle.
"""

from __future__ import annotations

from typing import List, Set

import pyarrow as pa

from ie_ray.stages.dedup import _words


def _doc_grams(text: str, n: int) -> Set[str]:
    w = _words(text)
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def eval_gram_set(eval_ds, n: int = 8) -> Set[str]:
    """Distinct n-grams of the (small) eval side, collected to the
    driver for broadcast.  ``take_all`` here is by design: the eval set
    is bounded by the benchmark's size, not the corpus."""
    grams: Set[str] = set()

    def emit(t: pa.Table) -> pa.Table:
        out: List[str] = []
        for txt in t.column("text").to_pylist():
            out.extend(_doc_grams(txt, n))
        return pa.table({"gram": pa.array(sorted(set(out)),
                                          type=pa.string())})

    for row in eval_ds.map_batches(emit, batch_format="pyarrow") \
                      .take_all():
        grams.add(row["gram"])
    return grams


class DecontamFilter:
    """Actor-pool stage: holds the broadcast eval gram set (fetched once
    per actor in __init__), emits (doc_id, n_overlap) for contaminated
    training docs."""

    def __init__(self, grams_ref, n: int = 8):
        import ray
        self.grams = (ray.get(grams_ref)
                      if isinstance(grams_ref, ray.ObjectRef) else grams_ref)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, overlaps = [], []
        for did, txt in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
            hit = len(_doc_grams(txt, self.n) & self.grams)
            if hit:
                ids.append(did)
                overlaps.append(hit)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_overlap": pa.array(overlaps, type=pa.int64()),
        })


def decontaminate(train_ds, eval_ds, n: int = 8, concurrency=(1, 4)):
    """(doc_id, n_overlap) for every training doc sharing ≥1 word
    n-gram with the eval side."""
    import ray
    ref = ray.put(eval_gram_set(eval_ds, n))
    return train_ds.map_batches(
        DecontamFilter, fn_constructor_kwargs={"grams_ref": ref, "n": n},
        concurrency=concurrency, batch_format="pyarrow")


def decontam_sql(eval_source: str = "src0", n: int = 8) -> str:
    """Exact DuckDB oracle for :func:`decontaminate` with the eval set
    defined as ``documents.source = eval_source``."""
    join = " || ' ' || ".join("words[i+%d]" % j for j in range(n))
    return (
        "WITH w AS (SELECT doc_id, source, regexp_extract_all(translate("
        "text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
        "'abcdefghijklmnopqrstuvwxyz'), '[0-9a-z_]+') AS words "
        "FROM documents), "
        "g AS (SELECT doc_id, source, list_distinct(list_transform("
        "range(1, len(words) - %(nm2)d), i -> %(join)s)) AS grams "
        "FROM w WHERE len(words) >= %(n)d), "
        "eg AS (SELECT DISTINCT unnest(grams) AS gr FROM g "
        "WHERE source = '%(src)s'), "
        "tg AS (SELECT doc_id, unnest(grams) AS gr FROM g "
        "WHERE source != '%(src)s') "
        "SELECT doc_id, count(*)::BIGINT AS n_overlap "
        "FROM tg JOIN eg USING (gr) GROUP BY doc_id"
        % {"nm2": n - 2, "join": join, "n": n, "src": eval_source})
