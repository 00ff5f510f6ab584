"""Ray stage for the clause-extraction path (C15): dependency-parse JSON →
clause rows ``(sent_id, ctype, subject, verb, objects)``."""

from __future__ import annotations

import json

import pyarrow as pa

from ..nlp.clause import ClauseFinder, parse_google_tokens


def extract_clauses_batch(batch: pa.Table) -> pa.Table:
    sids = batch.column("sent_id").to_pylist()
    parses = batch.column("parse_json").to_pylist()
    out = {"sent_id": [], "ctype": [], "subject": [], "verb": [], "objects": []}
    for sid, pj in zip(sids, parses):
        try:
            tokens = parse_google_tokens(json.loads(pj))
            clauses = ClauseFinder(tokens).find_clauses()
        except Exception:
            out["sent_id"].append(sid)
            out["ctype"].append("error")
            out["subject"].append(None)
            out["verb"].append(None)
            out["objects"].append(None)
            continue
        for c in clauses:
            out["sent_id"].append(sid)
            out["ctype"].append(c.ctype)
            out["subject"].append(c.subject)
            out["verb"].append(c.verb)
            out["objects"].append(" | ".join(c.objects))
    return pa.table({
        "sent_id": pa.array(out["sent_id"], type=pa.int64()),
        "ctype": pa.array(out["ctype"], type=pa.string()),
        "subject": pa.array(out["subject"], type=pa.string()),
        "verb": pa.array(out["verb"], type=pa.string()),
        "objects": pa.array(out["objects"], type=pa.string()),
    })


class CkyClauseActor:
    """Actor-pool stage: raw sentences → CKY parse → CCG-derived
    dependencies → clause rows.  The parser (lexicon + beam tables) is
    built once per actor; unparseable sentences quarantine as
    ctype='noparse' rows instead of failing the batch."""

    def __init__(self):
        from ..ccg.parser import CkyParser
        self.parser = CkyParser()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..nlp.ccgdep import clauses_from_sentence
        out = {"sent_id": [], "ctype": [], "subject": [], "verb": [],
               "objects": []}
        for sid, sent in zip(batch.column("sent_id").to_pylist(),
                             batch.column("sentence").to_pylist()):
            try:
                clauses = clauses_from_sentence(self.parser, sent)
            except Exception:
                clauses = None
            if not clauses:
                out["sent_id"].append(sid)
                out["ctype"].append("noparse")
                out["subject"].append("")
                out["verb"].append("")
                out["objects"].append("")
                continue
            for c in clauses:
                out["sent_id"].append(sid)
                out["ctype"].append(c.ctype)
                out["subject"].append(c.subject)
                out["verb"].append(c.verb)
                out["objects"].append(" | ".join(c.objects))
        return pa.table({
            "sent_id": pa.array(out["sent_id"], type=pa.int64()),
            "ctype": pa.array(out["ctype"], type=pa.string()),
            "subject": pa.array(out["subject"], type=pa.string()),
            "verb": pa.array(out["verb"], type=pa.string()),
            "objects": pa.array(out["objects"], type=pa.string()),
        })
