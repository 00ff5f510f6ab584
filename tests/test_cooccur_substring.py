"""Brute-force twins for the co-occurrence graph, distributed triangle
counting (Suri–Vassilvitskii orientation) and exact-substring dedup."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ie_ray.stages.cooccur import cooccur_edges, triangles
from ie_ray.stages.substring_dedup import substring_dup_frac


def _docs_ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))


def test_substring_dup_frac_planted():
    shared = "the quick brown fox jumps over the lazy dog"
    texts = [
        shared + " alpha beta gamma delta epsilon zeta",
        "unrelated words entirely here nothing matches at all ok",
        shared + " omega psi chi phi upsilon tau",
    ]
    out = {r["doc_id"]: r["dup_frac"]
           for r in substring_dup_frac(_docs_ds(texts), 16).take_all()}

    # brute-force twin
    w = 16
    grams = [set(t[i:i + w] for i in range(len(t) - w + 1)) for t in texts]
    for i, g in enumerate(grams):
        other = set().union(*(grams[j] for j in range(3) if j != i))
        expect = round(len(g & other) / len(g), 4)
        assert out[i] == pytest.approx(expect, abs=1e-9)
    assert out[0] > 0.3          # planted shared span detected
    assert out[1] == 0.0         # unique doc untouched


def test_substring_short_docs_excluded():
    out = substring_dup_frac(_docs_ds(["tiny", "also tiny", "x" * 40]),
                             16).take_all()
    assert {r["doc_id"] for r in out} == {2}


def test_cooccur_edges_bruteforce():
    rng = np.random.RandomState(7)
    vocab = ["w%d" % i for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(80)]
    got = {(r["w1"], r["w2"]): r["df"]
           for r in cooccur_edges(_docs_ds(texts), df_min=5).take_all()}

    counts = {}
    for t in texts:
        ws = t.split(" ")
        pairs = {tuple(sorted(p)) for p in zip(ws, ws[1:]) if p[0] != p[1]}
        for p in pairs:
            counts[p] = counts.get(p, 0) + 1
    expect = {p: c for p, c in counts.items() if c >= 5}
    assert got == expect


def test_triangles_bruteforce_with_hub():
    # random graph + a planted hub touching every node: orientation must
    # keep hub fan-out bounded and the count exact
    rng = np.random.RandomState(3)
    n = 18
    edges = {tuple(sorted((int(a), int(b))))
             for a, b in rng.randint(0, n, size=(60, 2)) if a != b}
    edges |= {(0, i) for i in range(1, n)}        # node 0 is the hub
    names = ["n%02d" % i for i in range(n)]
    et = pa.table({
        "w1": pa.array([names[a] for a, b in sorted(edges)]),
        "w2": pa.array([names[b] for a, b in sorted(edges)])})
    got = {(r["w1"], r["w2"], r["w3"])
           for r in triangles(ray.data.from_arrow(et)).take_all()}

    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect = {tuple(names[x] for x in tri)
              for tri in itertools.combinations(range(n), 3)
              if tri[1] in adj[tri[0]] and tri[2] in adj[tri[0]]
              and tri[2] in adj[tri[1]]}
    assert got == expect and len(expect) > 10


def _brute_core_numbers(edges, n):
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {i: len(adj[i]) for i in range(n)}
    core = dict(deg)
    alive = set(i for i in range(n) if deg[i] > 0)
    k = 0
    while alive:
        k = max(k, min(deg[i] for i in alive))
        peel = [i for i in alive if deg[i] <= k]
        while peel:
            v = peel.pop()
            if v not in alive:
                continue
            core[v] = k
            alive.discard(v)
            for u in adj[v]:
                if u in alive:
                    deg[u] -= 1
                    if deg[u] <= k:
                        peel.append(u)
    return {i: c for i, c in core.items() if i in adj and len(adj[i]) > 0}


def test_k_core_and_core_numbers_bruteforce():
    from ie_ray.stages.cooccur import core_numbers, k_core
    rng = np.random.RandomState(9)
    n = 24
    edges = {tuple(sorted((int(a), int(b))))
             for a, b in rng.randint(0, n, size=(90, 2)) if a != b}
    names = ["n%02d" % i for i in range(n)]
    et = pa.table({
        "w1": pa.array([names[a] for a, b in sorted(edges)]),
        "w2": pa.array([names[b] for a, b in sorted(edges)])})
    ds = ray.data.from_arrow(et)

    brute = _brute_core_numbers(edges, n)

    got = {r["node"]: r["core"] for r in core_numbers(ds).take_all()}
    expect = {names[i]: c for i, c in brute.items()}
    assert got == expect

    k = 3
    surv = k_core(ds, k).take_all()
    kept_nodes = {r["w1"] for r in surv} | {r["w2"] for r in surv}
    expect_nodes = {names[i] for i, c in brute.items() if c >= k}
    assert kept_nodes == expect_nodes
