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
        if label[0].isupper():
            # candidate generation via the head word (surname), accepted when
            # the mention shares a prefix with the candidate's canonical
            # title at ratio >= 0.7 (parity: wiki candidate scoring,
            # ie/semantics/ccg.py:1887-1917) or the head IS the title's head
            head = m.split()[-1] if m else ""
            cand = self.alias_map.get(head)
            if cand is not None:
                title = (cand[2] or "").lower()
                if _prefix_score(m, title) >= 0.7 or \
                        (title and title.split()[-1] == head):
                    return cand[0]
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


def load_alias_map(path: str) -> Dict[str, tuple]:
    """alias → (entity_id, prior, title); highest-prior candidate wins."""
    import pyarrow.parquet as pq
    t = pq.read_table(path, columns=["alias", "entity_id", "prior", "title"])
    out: Dict[str, tuple] = {}
    for a, e, p, ti in zip(t.column("alias").to_pylist(),
                           t.column("entity_id").to_pylist(),
                           t.column("prior").to_pylist(),
                           t.column("title").to_pylist()):
        cur = out.get(a)
        if cur is None or p > cur[1]:
            out[a] = (e, p, ti)
    return out


# ---------------------------------------------------------------------------
# connected components: hash-min label propagation over edge datasets
# ---------------------------------------------------------------------------

def connected_components(edges_ds, max_iters: int = 25):
    """Union-find over an edge Dataset ``(a:string, b:string)`` computed
    entirely with groupby shuffles — no driver-side graph, no joins.

    Hash-min label propagation: each iteration unions the current label
    table with the (doubled) edge list, groups by node, takes the min label
    seen at the node, and pushes that label to every neighbour; a second
    ``groupby(node).min`` collapses the messages.  Converges in O(diameter)
    iterations and exits early when an aggregate signature of the label
    table stops changing — alias graphs with hub concepts can chain
    entity–concept–entity paths, so the cap is generous.  The label table is
    ``materialize()``d per iteration (one small row per node) so the lazy
    plan doesn't re-execute the whole chain each round.

    Skew note: min is associative, so Ray's sort shuffle pre-combines per
    block — a hot node's millions of messages reduce to one candidate per
    (block × key) before the exchange.  Returns Dataset (node, component).
    """

    def explode(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        return pa.table({
            "node": pa.array(a + b, type=pa.string()),
            "peer": pa.array(b + a, type=pa.string()),
        })

    # adjacency, both directions (static across iterations)
    adj = edges_ds.map_batches(explode, batch_format="pyarrow").materialize()

    # initial labels: min(node, min(neighbors))
    def self_label(batch: pa.Table) -> pa.Table:
        n = batch.column("node").to_pylist()
        p = batch.column("peer").to_pylist()
        return pa.table({
            "node": batch.column("node"),
            "label": pa.array([min(x, y) for x, y in zip(n, p)],
                              type=pa.string()),
        })

    labels = (adj.map_batches(self_label, batch_format="pyarrow")
              .groupby("node").min("label")
              .map_batches(lambda t: t.rename_columns(["node", "label"]),
                           batch_format="pyarrow")).materialize()

    for _ in range(max_iters - 1):
        # one round: (labels ∪ adjacency) grouped by node → push min label
        # to every neighbour, then collapse messages per node
        tagged_labels = labels.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "peer": pa.array([None] * t.num_rows, type=pa.string()),
                "label": t.column("label")}),
            batch_format="pyarrow")
        tagged_edges = adj.map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "peer": t.column("peer"),
                "label": pa.array([None] * t.num_rows, type=pa.string())}),
            batch_format="pyarrow")

        def push(group: pa.Table) -> pa.Table:
            node = group.column("node")[0].as_py()
            lab = node
            peers = []
            for p, l in zip(group.column("peer").to_pylist(),
                            group.column("label").to_pylist()):
                if l is not None and l < lab:
                    lab = l
                if p is not None:
                    peers.append(p)
            nodes = [node] + peers
            return pa.table({
                "node": pa.array(nodes, type=pa.string()),
                "label": pa.array([lab] * len(nodes), type=pa.string()),
            })

        messages = tagged_labels.union(tagged_edges) \
            .groupby("node").map_groups(push, batch_format="pyarrow")
        new_labels = (messages.groupby("node").min("label")
                      .map_batches(lambda t: t.rename_columns(
                          ["node", "label"]), batch_format="pyarrow")
                      ).materialize()
        # convergence: compare cheap aggregate signatures
        import hashlib as _h

        def sig(ds):
            tot = 0
            for row in ds.map_batches(
                    lambda t: pa.table({"h": pa.array([sum(
                        int(_h.md5((n + "|" + l).encode()).hexdigest()[:8], 16)
                        for n, l in zip(t.column("node").to_pylist(),
                                        t.column("label").to_pylist()))],
                        type=pa.int64())}),
                    batch_format="pyarrow").take_all():
                tot = (tot + row["h"]) & 0xFFFFFFFFFFFF
            return tot

        if sig(new_labels) == sig(labels):
            labels = new_labels
            break
        labels = new_labels
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]),
        batch_format="pyarrow")


def canonicalize_ids(triples_ds, components_map_ref):
    """Rewrite subj_id/obj_id to canonical component ids via a broadcast
    component map (small side; at 10^12-page scale the map itself shards —
    swap the broadcast for a partitioned lookup service like the dedup
    index)."""
    import ray

    def relabel(batch: pa.Table) -> pa.Table:
        m = ray.get(components_map_ref) \
            if not isinstance(components_map_ref, dict) else components_map_ref
        subj = [m.get(x, x) for x in batch.column("subj_id").to_pylist()]
        obj = [m.get(x, x) if x is not None else None
               for x in batch.column("obj_id").to_pylist()]
        cols = {n: batch.column(n) for n in batch.column_names
                if n not in ("subj_id", "obj_id")}
        cols["subj_id"] = pa.array(subj, type=pa.string())
        cols["obj_id"] = pa.array(obj, type=pa.string())
        return pa.table(cols)

    return triples_ds.map_batches(relabel, batch_format="pyarrow")


def alias_edges_from_triples(triples_ds):
    """(subj_id, obj_id) edges from _AKA alias triples — the input to
    cross-document canonicalization (J5/A3 in SURVEY.md)."""
    def prep(batch: pa.Table) -> pa.Table:
        a_out, b_out = [], []
        for s, o, k in zip(batch.column("subj_id").to_pylist(),
                           batch.column("obj_id").to_pylist(),
                           batch.column("kind").to_pylist()):
            if k == "aka" and s is not None and o is not None and s != o:
                a_out.append(s)
                b_out.append(o)
        return pa.table({"a": pa.array(a_out, type=pa.string()),
                         "b": pa.array(b_out, type=pa.string())})
    return triples_ds.map_batches(prep, batch_format="pyarrow")
