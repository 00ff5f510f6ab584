"""Property gates for the similarity-join primitives: randomized
brute-force equivalence for the FastSS candidate pipeline's pure core
(variant blocking + DP verify) and for the banded-Hamming join's
pigeonhole guarantee.  These run WITHOUT Ray — they attack the
algorithmic core the distributed stages are built on, on inputs the
planted fixtures can't enumerate."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ie_ray.stages.strsim import (deletion_variants,
                                  edit_pairs_bruteforce, levenshtein)

_word = st.text(alphabet="abc", min_size=1, max_size=6)


@settings(max_examples=200, deadline=None)
@given(st.lists(_word, min_size=2, max_size=12, unique=True))
def test_fastss_blocking_complete_on_random_vocab(vocab):
    """Every brute-force pair within d<=2 must be a blocking candidate
    (share a <=2-deletion variant) — the completeness half of FastSS;
    precision is handled by exact verification."""
    variants = {w: set(deletion_variants(w, 2)) for w in vocab}
    for w1, w2, d in edit_pairs_bruteforce(vocab, k=2):
        assert variants[w1] & variants[w2], (w1, w2, d)


@settings(max_examples=200, deadline=None)
@given(_word, _word)
def test_levenshtein_metric_properties(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)              # symmetry
    assert (d == 0) == (a == b)                # identity
    assert d <= max(len(a), len(b))            # upper bound
    assert d >= abs(len(a) - len(b))           # lower bound


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**64 - 1), min_size=2, max_size=20,
                unique=True), st.integers(0, 15))
def test_banded_hamming_pigeonhole(hashes, max_hamming):
    """A pair within Hamming distance <= bands-1 must share at least
    one exact band — the guarantee hamming_pairs' candidate generation
    relies on (16 bands of 4 bits)."""
    bands, width = 16, 4
    mask = (1 << width) - 1
    for i, h1 in enumerate(hashes):
        for h2 in hashes[i + 1:]:
            d = bin(h1 ^ h2).count("1")
            if d <= max_hamming and max_hamming <= bands - 1:
                shared = any(((h1 >> (width * b)) & mask)
                             == ((h2 >> (width * b)) & mask)
                             for b in range(bands))
                assert shared, (h1, h2, d)
