"""Parser stage: sentence → CCG derivation (actor pool).

The reference hosts EasySRL (a ~100s-MB Java model loaded once per daemon,
``ie/grpc/__init__.py:138-192``; serialized per-session,
``CcgServiceHandler.java:99-123``).  The rebuild keeps the actor-pool
architecture real — heavy state in ``__init__``, batched ``__call__`` — but
substitutes a deterministic **replay parser**: derivations keyed by the md5
of the preprocessed sentence, broadcast once through the object store
(``ray.put``) and shared zero-copy by every actor on a node.

Rows without a derivation (out-of-corpus or over the 250-word cap) are not
dropped: they get an ``error`` marker and flow to the quarantine sink —
parse failures are data (parity: ``# FAILED`` lines,
``scripts/make_easysrl_drs.py:84-86``).
"""

from __future__ import annotations

import hashlib
from typing import Dict

import pyarrow as pa

from .segment import MAX_SENT_WORDS


class ReplayParserActor:
    """Callable class for ``map_batches(..., concurrency=N)``.

    ``derivations`` arrives as a plain dict because Ray resolves the
    ``ray.put`` ObjectRef passed in ``fn_constructor_kwargs`` — one copy per
    node in shared memory, not one per task.
    """

    def __init__(self, derivations, heuristic_fallback: bool = True,
                 cky_fallback: bool = True):
        import ray
        if isinstance(derivations, ray.ObjectRef):
            derivations = ray.get(derivations)
        self.derivations: Dict[str, str] = derivations
        self.fallback = None
        if heuristic_fallback:
            from ..sources.heuristic_parse import synthesize_derivation
            self.fallback = synthesize_derivation
        # the real parser (supertagger + CKY, ie_ray/ccg/parser.py) — built
        # once per actor; covers arbitrary text beyond the replay corpus
        self.cky = None
        if cky_fallback:
            from ..ccg.parser import CkyParser
            self.cky = CkyParser()

    def _parse_one(self, s: str) -> str:
        d = self.derivations.get(
            hashlib.md5(s.encode("utf-8")).hexdigest())
        if d is not None:
            return d
        if self.fallback is not None:
            d = self.fallback(s)
        if d is None and self.cky is not None:
            try:
                d = self.cky.parse(s)
            except Exception:
                d = None
        return d

    def __call__(self, batch: pa.Table) -> pa.Table:
        sents = batch.column("sentence").to_pylist()
        derivs, errors, hashes = [], [], []
        for s in sents:
            key = hashlib.md5(s.encode("utf-8")).hexdigest()
            hashes.append(key)
            if s.count(" ") >= MAX_SENT_WORDS:
                derivs.append("")
                errors.append("too_long")
                continue
            d = self._parse_one(s)
            if d is not None:
                self.derivations[key] = d       # per-actor memo
            if d is None:
                derivs.append("")
                errors.append("no_parse")
            else:
                derivs.append(d)
                errors.append("")
        return batch.append_column(
            "sent_hash", pa.array(hashes, type=pa.string())).append_column(
            "ccgbank", pa.array(derivs, type=pa.string())).append_column(
            "parse_error", pa.array(errors, type=pa.string()))
