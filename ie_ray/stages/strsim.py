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


# ---------------------------------------------------------------------------
# Jaro-Winkler similarity join
# ---------------------------------------------------------------------------

def jaro_winkler(a: str, b: str) -> float:
    """Jaro-Winkler similarity, BIT-EXACT to DuckDB's
    ``jaro_winkler_similarity`` (fuzz-gated in tests/test_strsim.py):
    standard Jaro (match window ``max//2 - 1``, transpositions halved),
    Winkler prefix boost (scale 0.1, prefix capped at 4) applied only
    when jaro > 0.7, and the DuckDB convention that ANY empty operand
    scores 0.0 (even empty-vs-empty).  Same float64 operation order as
    the C++ implementation, so thresholds and 4-digit rounding agree
    across engines."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    win = max(la, lb) // 2 - 1
    if win < 0:
        win = 0
    am = [False] * la
    bm = [False] * lb
    m = 0
    for i, ca in enumerate(a):
        lo = 0 if i < win else i - win
        hi = min(lb, i + win + 1)
        for j in range(lo, hi):
            if not bm[j] and b[j] == ca:
                am[i] = bm[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if am[i]:
            while not bm[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / la + m / lb + (m - t) / m) / 3.0
    if j > 0.7:
        p = 0
        for ca, cb in zip(a, b):
            if ca != cb or p == 4:
                break
            p += 1
        j = j + p * 0.1 * (1.0 - j)
    return j


def _char_counts(words: List[str]) -> np.ndarray:
    """n×26 lowercase-letter count matrix (the vocab filter guarantees
    ``^[a-z]+$``; any other codepoint is simply not counted, which only
    LOOSENS the upper bound — still sound)."""
    m = np.zeros((len(words), 26), dtype=np.int16)
    for i, w in enumerate(words):
        for c in w:
            o = ord(c) - 97
            if 0 <= o < 26:
                m[i, o] += 1
    return m


def jw_pairs(vocab, threshold: float = 0.75, parts: int = 16):
    """All pairs of distinct vocabulary words with Jaro-Winkler
    similarity >= ``threshold``, as a Dataset of ``(w1, w2, sim)``
    with ``w1 < w2`` and ``sim`` rounded to 4 digits (DuckDB
    half-away-from-zero convention).

    Shape: the vocabulary is BOUNDED by construction (corpus-scale
    word counting happens upstream in block combiners), so the join
    broadcasts the vocab once (``ray.put``) and fans the ROW ranges
    out across ``parts`` tasks — each task scores its slice against
    the full vocab with a vectorized BAG-OF-CHARACTERS upper bound
    before any exact scoring:

    every Jaro match pairs two equal characters, so
    ``m <= B = |bag(a) ∩ bag(b)|``; with transpositions at best 0,
    ``jaro <= (B/la + B/lb + 1)/3``, and with the best possible
    Winkler boost (prefix 4) ``jw <= j + 0.4(1-j)``.  Pairs whose
    bound misses the threshold never reach the exact O(|a|·|b|)
    scorer — completeness is a theorem, not a heuristic (gated in
    tests/test_strsim.py).  Exact scoring runs once per surviving
    DISTINCT pair.
    """
    import ray
    import pyarrow.compute as pc

    words: List[str] = []
    for blk in vocab.iter_batches(batch_format="pyarrow"):
        if blk.num_rows and "word" in blk.column_names:
            words.extend(blk.column("word").to_pylist())
    words = sorted(set(words))
    n = len(words)
    counts = _char_counts(words)
    lens = np.array([len(w) for w in words], dtype=np.float64)
    ref = ray.put((words, counts, lens))

    # best-boost inversion: jw >= th and jw <= 0.4 + 0.6*j  =>  the
    # jaro upper bound must reach (th - 0.4) / 0.6
    j_min = (threshold - 0.4) / 0.6

    class SliceJoin:
        def __init__(self):
            self.words, self.counts, self.lens = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t.column("id"), dtype=np.int64)
            W, M, L = self.words, self.counts, self.lens
            w1: List[str] = []
            w2: List[str] = []
            sims: List[float] = []
            for chunk in np.array_split(ids, max(1, len(ids) // 128)):
                if not len(chunk):
                    continue
                B = np.zeros((len(chunk), len(W)), dtype=np.float64)
                sub = M[chunk]
                for c in range(26):
                    B += np.minimum.outer(sub[:, c], M[:, c])
                ub = (B / L[chunk][:, None] + B / L[None, :] + 1.0) / 3.0
                np.minimum(ub, 1.0, out=ub)
                cand = ub >= j_min
                # strict upper triangle only: i scores against j > i
                cand &= np.arange(len(W))[None, :] > chunk[:, None]
                for r, i in enumerate(chunk):
                    for j in np.nonzero(cand[r])[0]:
                        s = jaro_winkler(W[i], W[j])
                        if s >= threshold:
                            w1.append(W[i])
                            w2.append(W[j])
                            sims.append(s)
            return pa.table({
                "w1": pa.array(w1, type=pa.string()),
                "w2": pa.array(w2, type=pa.string()),
                "sim": pc.round(pa.array(sims, type=pa.float64()), 4,
                                round_mode="half_towards_infinity")})

    ids = ray.data.range(n).repartition(max(1, min(parts, n))) \
        .map_batches(lambda t: t.rename_columns(["id"]),
                     batch_format="pyarrow")
    return ids.map_batches(SliceJoin, concurrency=(1, 8),
                           batch_format="pyarrow")


def jw_pairs_bruteforce(words: List[str], threshold: float = 0.75) \
        -> List[Tuple[str, str, float]]:
    """O(n²) twin for tests (unrounded sims)."""
    ws = sorted(set(words))
    return [(ws[i], ws[j], jaro_winkler(ws[i], ws[j]))
            for i in range(len(ws)) for j in range(i + 1, len(ws))
            if jaro_winkler(ws[i], ws[j]) >= threshold]
