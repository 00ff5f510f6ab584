"""Edit-distance string-similarity self-join (FastSS deletion blocking).

The reference ships SymSpell-style spell correction built on
single-character deletion neighborhoods (``ie/kb/spell.py:47-91`` —
dictionary words indexed by their deletions, queries probed against the
index).  This module generalises that same blocking idea from a
point-lookup into a distributed similarity JOIN: find every pair of
vocabulary words within Levenshtein distance ``k`` — the
typo-clustering / variant-merging primitive a web-corpus vocabulary
pipeline runs before token normalization.

Why FastSS blocking is the 100 TB shape: if ``ed(u, v) <= k`` then
deleting the substituted+deleted characters from ``u`` and the
substituted+inserted characters from ``v`` reaches a common string with
at most ``k`` deletions on each side, so the <=k-deletion neighborhoods
``D_k(u)`` and ``D_k(v)`` intersect (Bocek et al. 2007, "Fast Similarity
Search in Large Dictionaries").  Candidate generation is therefore a
hash-partitioned exchange on deletion variants — never an all-pairs
scan: each word of length L emits ``1 + L + L(L-1)/2`` variant rows
(k=2), buckets partition the variant space, and only words sharing a
variant ever meet.  The exchange is VOCABULARY-bounded, not
corpus-bounded — the corpus-scale work (word counting) happens upstream
in block-local combiners.

Candidates are verified with an exact Levenshtein DP per DISTINCT pair
(false positives exist: "ab"/"ba" share deletion variants but have
distance 2 > 1), so the emitted distances are exact, which is what lets
the ``word_edit2_pairs`` query carry a bit-exact DuckDB
``levenshtein()`` oracle.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa


def levenshtein(a: str, b: str) -> int:
    """Classic O(|a|·|b|) DP.  Called once per distinct candidate pair
    (vocabulary-bounded), never per corpus row."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def deletion_variants(word: str, k: int = 2) -> List[str]:
    """All strings reachable from ``word`` by deleting up to ``k``
    characters (including ``word`` itself), deduplicated."""
    out = {word}
    if k >= 1:
        for i in range(len(word)):
            out.add(word[:i] + word[i + 1:])
    if k >= 2:
        for i in range(len(word)):
            for j in range(i + 1, len(word)):
                out.add(word[:i] + word[i + 1:j] + word[j + 1:])
    return sorted(out)


def _bucket_pairs(g: pa.Table, max_run: int) -> pa.Table:
    """Candidate pairs within one variant-hash bucket: sort by variant,
    walk the equal-variant runs, emit each unordered word pair once per
    bucket.  Runs are vocabulary-bounded; ``max_run`` caps a
    pathological run (e.g. a 1-char variant shared by thousands of
    words) by keeping the lexicographically-first ``max_run`` words —
    deterministic, and honest about what got dropped via the
    ``truncated`` flag the caller surfaces."""
    variants = np.asarray(g.column("variant").to_pylist(), dtype=object)
    words = np.asarray(g.column("word").to_pylist(), dtype=object)
    order = np.lexsort((words, variants))
    variants, words = variants[order], words[order]
    # run boundaries over equal variants
    bounds = np.nonzero(np.concatenate(
        ([True], variants[1:] != variants[:-1], [True])))[0]
    seen: set = set()
    w1: List[str] = []
    w2: List[str] = []
    truncated = False
    for s, e in zip(bounds[:-1], bounds[1:]):
        run = words[s:e]
        # a word can reach the same variant several deletion ways only
        # pre-dedup'd by deletion_variants; across blocks duplicates of
        # (variant, word) may still meet here — unique the run
        run = np.unique(run.astype(object))
        if len(run) > max_run:
            run = run[:max_run]
            truncated = True
        for i in range(len(run)):
            for j in range(i + 1, len(run)):
                p = (run[i], run[j])
                if p not in seen:
                    seen.add(p)
                    w1.append(p[0])
                    w2.append(p[1])
    return pa.table({
        "w1": pa.array(w1, type=pa.string()),
        "w2": pa.array(w2, type=pa.string()),
        "truncated": pa.array([truncated] * len(w1), type=pa.bool_())})


def edit_pairs(vocab, k: int = 2, parts: int = 64, max_run: int = 2000):
    """All pairs of distinct words in ``vocab`` (Dataset with a string
    ``word`` column, rows distinct) within Levenshtein distance ``k``
    (1 <= d <= k), as a Dataset of ``(w1, w2, d, truncated)`` with
    ``w1 < w2``.  ``truncated`` is True on a pair that survived a
    capped variant run — and when ANY row carries it, pairs whose ONLY
    shared variant fell past the cap may be missing entirely (e.g. two
    3-char words at d=2 meet only in a 1-char variant, exactly the run
    a huge vocabulary overflows), so callers needing exactness must
    treat any True as "result is a subset" and either raise ``max_run``
    or fall back — the flag exists so that degradation is VISIBLE, not
    silent.

    Stages: variant fan-out (map) → bucketed exchange on the variant →
    per-bucket candidate pairs → global pair dedup (groupby) → exact
    DP verification (map).  Everything after the fan-out is
    vocabulary-bounded.
    """
    if k not in (1, 2):
        raise ValueError("edit_pairs supports k in {1, 2}")
    from .relational import bucketed_map_groups

    def fan_out(t: pa.Table) -> pa.Table:
        vs: List[str] = []
        ws: List[str] = []
        for w in t.column("word").to_pylist():
            for v in deletion_variants(w, k):
                vs.append(v)
                ws.append(w)
        return pa.table({"variant": pa.array(vs, type=pa.string()),
                         "word": pa.array(ws, type=pa.string())})

    candidates = bucketed_map_groups(
        vocab.map_batches(fan_out, batch_format="pyarrow"),
        "variant", lambda g: _bucket_pairs(g, max_run), parts=parts)

    # global dedup — the same pair can surface from different variants
    # landing in different buckets
    deduped = candidates.groupby(["w1", "w2"]).max("truncated")

    def verify(t: pa.Table) -> pa.Table:
        a = t.column("w1").to_pylist()
        b = t.column("w2").to_pylist()
        tr = t.column("max(truncated)").to_pylist()
        d = [levenshtein(x, y) for x, y in zip(a, b)]
        keep = [i for i, dd in enumerate(d) if 1 <= dd <= k]
        return pa.table({
            "w1": pa.array([a[i] for i in keep], type=pa.string()),
            "w2": pa.array([b[i] for i in keep], type=pa.string()),
            "d": pa.array([d[i] for i in keep], type=pa.int64()),
            "truncated": pa.array([bool(tr[i]) for i in keep],
                                  type=pa.bool_())})

    return deduped.map_batches(verify, batch_format="pyarrow")


def edit_pairs_bruteforce(words: List[str], k: int = 2) \
        -> List[Tuple[str, str, int]]:
    """O(n²) twin for tests."""
    out = []
    ws = sorted(set(words))
    for i in range(len(ws)):
        for j in range(i + 1, len(ws)):
            d = levenshtein(ws[i], ws[j])
            if 1 <= d <= k:
                out.append((ws[i], ws[j], d))
    return out
