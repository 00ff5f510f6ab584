"""Edit-distance similarity join (stages/strsim.py): exact-DP unit
checks, the FastSS blocking theorem on randomized pairs, and the
distributed join vs the O(n²) brute-force twin on a planted typo
vocabulary (the fixture corpus has a fixed 31-word vocabulary with no
distance-1 pairs, so the interesting cases are planted here — same
honesty pattern as tests/test_pii.py)."""

import random

import numpy as np
import pyarrow as pa
import pytest

from ie_ray.stages.strsim import (deletion_variants, edit_pairs,
                                  edit_pairs_bruteforce, levenshtein)


def test_levenshtein_known_values():
    assert levenshtein("", "") == 0
    assert levenshtein("a", "") == 1
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("flaw", "lawn") == 2
    assert levenshtein("part", "sort") == 2
    assert levenshtein("fast", "hash") == 2
    assert levenshtein("ab", "ba") == 2  # plain Levenshtein: no transposition
    assert levenshtein("table", "tale") == 1


def test_levenshtein_matches_duckdb():
    import duckdb
    rng = random.Random(7)
    words = ["".join(rng.choice("abcd") for _ in range(rng.randint(0, 8)))
             for _ in range(40)]
    con = duckdb.connect()
    for i in range(0, len(words) - 1, 2):
        a, b = words[i], words[i + 1]
        want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_deletion_variants_counts():
    # "abcd": itself, 4 single deletions, 6 double deletions (all distinct)
    assert len(deletion_variants("abcd", 2)) == 11
    assert deletion_variants("ab", 1) == ["a", "ab", "b"]
    # repeated chars collapse: "aa" -> {aa, a} plus "" at k=2
    assert deletion_variants("aa", 2) == ["", "a", "aa"]


def test_fastss_blocking_theorem_randomized():
    """ed(u, v) <= 2  ⇒  D2(u) ∩ D2(v) ≠ ∅ — the completeness guarantee
    candidate generation relies on (verification handles precision)."""
    rng = random.Random(13)
    alphabet = "abc"
    checked = 0
    for _ in range(400):
        u = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        v = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        if u == v or levenshtein(u, v) > 2:
            continue
        checked += 1
        assert set(deletion_variants(u, 2)) & set(deletion_variants(v, 2)), \
            (u, v)
    assert checked > 50  # the random stream actually exercised the theorem


def _planted_vocab():
    """Deterministic 'web vocabulary with typos': base words plus
    seeded single-char deletions/substitutions/insertions and a few
    distance-2 corruptions."""
    base = ["table", "stream", "window", "filter", "vector", "column",
            "query", "batch", "merge", "customer", "supplier", "orders",
            "shuffle", "partition", "cluster", "lineage", "manifest"]
    rng = random.Random(42)
    vocab = set(base)
    for w in base:
        i = rng.randrange(len(w))
        vocab.add(w[:i] + w[i + 1:])                      # deletion
        vocab.add(w[:i] + rng.choice("xyz") + w[i:])      # insertion
        vocab.add(w[:i] + rng.choice("qz") + w[i + 1:])   # substitution
        if len(w) > 4:
            vocab.add(w[2:])                              # distance-2 chop
    return sorted(vocab)


def test_edit_pairs_matches_bruteforce(ray_session):
    import ray.data
    vocab = _planted_vocab()
    ds = ray.data.from_arrow(
        pa.table({"word": pa.array(vocab, type=pa.string())}))
    got = sorted((r["w1"], r["w2"], r["d"])
                 for r in edit_pairs(ds, k=2, parts=8).take_all())
    want = edit_pairs_bruteforce(vocab, k=2)
    assert got == want
    assert len(want) > 40  # the planted vocabulary is non-trivial


def test_edit_pairs_k1_subset_of_k2(ray_session):
    import ray.data
    vocab = _planted_vocab()[:30]
    ds = ray.data.from_arrow(
        pa.table({"word": pa.array(vocab, type=pa.string())}))
    k1 = sorted((r["w1"], r["w2"], r["d"])
                for r in edit_pairs(ds, k=1, parts=4).take_all())
    assert k1 == [t for t in edit_pairs_bruteforce(vocab, k=2) if t[2] == 1]


def test_edit_pairs_rejects_bad_k():
    with pytest.raises(ValueError):
        edit_pairs(None, k=3)


def test_truncation_flag_surfaces(ray_session):
    """A capped variant run must be VISIBLE on the surviving pairs —
    the degradation contract callers rely on at huge vocabularies."""
    import ray.data
    vocab = ["x%d" % i for i in range(10)]  # all meet in variant "x"
    ds = ray.data.from_arrow(
        pa.table({"word": pa.array(vocab, type=pa.string())}))
    out = edit_pairs(ds, k=1, parts=2, max_run=3).take_all()
    assert out and all(r["truncated"] for r in out)
    # subset semantics: kept pairs are real d=1 pairs, just not all 45
    assert all(r["d"] == 1 for r in out)
    assert len(out) < 45
    # and with a big enough cap the same vocab is exact + unflagged
    full = edit_pairs(ds, k=1, parts=2, max_run=100).take_all()
    assert len(full) == 45
    assert not any(r["truncated"] for r in full)


# ---------------------------------------------------------------------------
# Jaro-Winkler join
# ---------------------------------------------------------------------------

def test_jaro_winkler_matches_duckdb_fuzz():
    """Bit-exact float64 parity with DuckDB, including the boost
    threshold (jaro > 0.7), the 4-char prefix cap (tiny alphabet runs
    force long prefixes) and the empty-operand convention."""
    import duckdb
    from ie_ray.stages.strsim import jaro_winkler
    con = duckdb.connect()
    rng = random.Random(41)
    cases = [("", ""), ("", "a"), ("martha", "marhta"),
             ("dixon", "dicksonx"), ("dwayne", "duane"),
             ("aaaaaab", "aaaaaba")]
    for alphabet, reps in (("abcdef", 1200), ("ab", 1200)):
        for _ in range(reps):
            cases.append((
                "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(0, 9))),
                "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(0, 9)))))
    for a, b in cases:
        want = con.execute("SELECT jaro_winkler_similarity(?, ?)",
                           [a, b]).fetchone()[0]
        assert jaro_winkler(a, b) == want, (a, b)


def test_jw_bag_bound_is_complete():
    """The pruning theorem: jw(a,b) >= th  ⇒  the bag-of-chars upper
    bound reaches (th-0.4)/0.6 — no true pair is ever pruned."""
    from ie_ray.stages.strsim import _char_counts, jaro_winkler
    rng = random.Random(17)
    th = 0.75
    j_min = (th - 0.4) / 0.6
    hits = 0
    for _ in range(2000):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(3, 9)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(3, 9)))
        if a == b or jaro_winkler(a, b) < th:
            continue
        hits += 1
        m = _char_counts([a, b])
        bag = int(np.minimum(m[0], m[1]).sum())
        ub = min((bag / len(a) + bag / len(b) + 1.0) / 3.0, 1.0)
        assert ub >= j_min, (a, b)
    assert hits > 50  # the fuzz actually exercised true pairs


PLANTED_JW = ["martha", "marhta", "marsha", "dixon", "dicksonx",
              "dwayne", "duane", "jellyfish", "smellyfish", "table",
              "tables", "stable", "spark", "sparks", "part", "zzz"]


def test_jw_pairs_distributed_matches_bruteforce(ray_session):
    import ray

    from ie_ray.stages.strsim import jw_pairs, jw_pairs_bruteforce
    vocab = ray.data.from_arrow(pa.table(
        {"word": pa.array(PLANTED_JW, type=pa.string())})).repartition(3)
    got = []
    for blk in jw_pairs(vocab, threshold=0.75, parts=4) \
            .iter_batches(batch_format="pyarrow"):
        if blk.num_rows:
            got.extend(zip(blk.column("w1").to_pylist(),
                           blk.column("w2").to_pylist(),
                           blk.column("sim").to_pylist()))
    got.sort()
    want = sorted((a, b, round(s, 4))
                  for a, b, s in jw_pairs_bruteforce(PLANTED_JW, 0.75))
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert abs(gs - ws) < 5e-5
