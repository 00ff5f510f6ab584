"""Compose stage: CCG derivation → DRS conditions → (subj, pred, obj) rows.

One actor-pool ``map_batches`` hosting a ``Composer`` per worker (the
reference's per-process MODEL/category caches, T2/T3 in SURVEY.md §2.3,
become per-actor state).  Emits one row per triple with full provenance;
compose failures become quarantine rows (error column), never exceptions.

Parity: process_ccg_pt (``ie/semantics/ccg.py:1998-2024``) and the triple
distillation of FIXTURES.md §5.
"""

from __future__ import annotations

import pyarrow as pa

from ..semantics.engine import Composer

TRIPLE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("para_idx", pa.int32()),
    ("sent_idx", pa.int32()),
    ("sent_hash", pa.string()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("kind", pa.string()),
    ("error", pa.string()),
])


class ComposeActor:
    """Per-actor state: the Composer plus an LRU of composed results keyed by
    the derivation string — web corpora repeat sentences heavily (titles,
    boilerplate), and composition is deterministic, so caching is exact.
    (Parity: the reference's per-process template/category caches, T2/T3.)
    """

    _CACHE_MAX = 65536

    def __init__(self, emit_drs: bool = False, alias_map=None, options=None):
        """``alias_map`` (broadcast dict or ObjectRef) fuses entity linking
        into this stage — one less 9M-row hop through the object store;
        the standalone LinkActor remains for pipelines that link later.
        ``options`` is a :class:`ie_ray.semantics.ComposeOptions` (the
        CO_* surface), broadcast verbatim into every actor."""
        from collections import OrderedDict
        self.composer = Composer(options=options)
        self.emit_drs = emit_drs
        self.linker = None
        if alias_map is not None:
            from .link import LinkActor
            self.linker = LinkActor(alias_map)
            self._link_memo = {}
        self._cache = OrderedDict()

    def _link(self, label):
        hit = self._link_memo.get(label)
        if hit is None and label not in self._link_memo:
            hit = self.linker._link_one(label)
            if len(self._link_memo) > 500_000:
                self._link_memo.clear()
            self._link_memo[label] = hit
        return hit

    def _compose(self, derivation: str):
        """Composed + linked COLUMN FRAGMENTS for one derivation.

        Web corpora repeat sentences heavily and composition/linking is
        deterministic per derivation, so the cache stores the finished
        per-triple column lists — a repeated sentence costs one dict hit
        plus C-speed ``list.extend`` per column, not len(triples) Python
        appends (the warm path is ~85%% of flagship CPU; this cut its
        row-assembly term ~4×).  Returns (k, subjs, preds, objs, kinds,
        subj_ids, obj_ids, drs_str); k == 0 ⇒ empty-parse row.
        """
        hit = self._cache.get(derivation)
        if hit is not None:
            self._cache.move_to_end(derivation)
            return hit
        sem = self.composer.compose_ccgbank(derivation)
        drs_str = sem.get_drs().show() if self.emit_drs else ""
        # quarantine-tag unknown-irregular stems (lemmatizer kept the
        # surface form; VERDICT r2 item 6) — soft tag, rows still emit
        unsure = ",".join(sorted({t.word for t in sem.tokens
                                  if getattr(t, "stem_unsure", False)}))
        err_tag = ("stem_unsure:" + unsure) if unsure else ""
        triples = sem.triples()
        subjs = [t["subj"] for t in triples]
        preds = [t["pred"] for t in triples]
        objs = [t["obj"] for t in triples]
        kinds = [t["kind"] for t in triples]
        if self.linker is not None:
            subj_ids = [self._link(s) for s in subjs]
            obj_ids = [self._link(o) for o in objs]
        else:
            subj_ids = obj_ids = None
        result = (len(triples), subjs, preds, objs, kinds,
                  subj_ids, obj_ids, drs_str, err_tag)
        self._cache[derivation] = result
        if len(self._cache) > self._CACHE_MAX:
            self._cache.popitem(last=False)
        return result

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        paras = batch.column("para_idx").to_pylist()
        sents = batch.column("sent_idx").to_pylist()
        hashes = batch.column("sent_hash").to_pylist()
        derivs = batch.column("ccgbank").to_pylist()
        perrs = batch.column("parse_error").to_pylist()

        link = self.linker is not None
        cols = {n: [] for n in TRIPLE_SCHEMA.names}
        if self.emit_drs:
            cols["drs"] = []
        if link:
            cols["subj_id"] = []
            cols["obj_id"] = []

        def emit_one(u, p, s, h, kind, err, drs=""):
            cols["url"].append(u)
            cols["para_idx"].append(p)
            cols["sent_idx"].append(s)
            cols["sent_hash"].append(h)
            cols["subj"].append(None)
            cols["pred"].append(None)
            cols["obj"].append(None)
            cols["kind"].append(kind)
            cols["error"].append(err)
            if self.emit_drs:
                cols["drs"].append(drs)
            if link:
                cols["subj_id"].append(None)
                cols["obj_id"].append(None)

        for u, p, s, h, d, perr in zip(urls, paras, sents, hashes, derivs,
                                       perrs):
            if perr:
                emit_one(u, p, s, h, "quarantine", perr)
                continue
            try:
                (k, subjs, preds, objs, kinds, subj_ids, obj_ids,
                 drs_str, err_tag) = self._compose(d)
            except Exception as e:  # row-level failure is data, not a crash
                emit_one(u, p, s, h, "quarantine",
                         "compose: %s" % type(e).__name__)
                continue
            if k == 0:
                emit_one(u, p, s, h, "empty", "", drs_str)
                continue
            cols["url"].extend([u] * k)
            cols["para_idx"].extend([p] * k)
            cols["sent_idx"].extend([s] * k)
            cols["sent_hash"].extend([h] * k)
            cols["subj"].extend(subjs)
            cols["pred"].extend(preds)
            cols["obj"].extend(objs)
            cols["kind"].extend(kinds)
            cols["error"].extend([err_tag] * k)
            if self.emit_drs:
                cols["drs"].extend([drs_str] * k)
            if link:
                cols["subj_id"].extend(subj_ids)
                cols["obj_id"].extend(obj_ids)
        schema = TRIPLE_SCHEMA
        if self.emit_drs:
            schema = schema.append(pa.field("drs", pa.string()))
        if link:
            schema = schema.append(pa.field("subj_id", pa.string()))
            schema = schema.append(pa.field("obj_id", pa.string()))
        return pa.table({n: pa.array(cols[n], type=schema.field(n).type)
                         for n in schema.names})


class ParseComposeActor:
    """Fused parse+compose actor: the per-sentence derivation strings —
    the pipeline's largest intermediate (~500 B × sentences, ≈2.4 GB per
    600k pages) — stay inside the actor instead of round-tripping the
    object store between two pools.  One pool also means one concurrency
    knob for the whole semantic phase."""

    def __init__(self, derivations, emit_drs: bool = False, alias_map=None,
                 heuristic_fallback: bool = True, cky_fallback: bool = True,
                 options=None):
        from .parse import ReplayParserActor
        self.parser = ReplayParserActor(derivations,
                                        heuristic_fallback=heuristic_fallback,
                                        cky_fallback=cky_fallback)
        self.composer_stage = ComposeActor(emit_drs=emit_drs,
                                           alias_map=alias_map,
                                           options=options)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.composer_stage(self.parser(batch))
