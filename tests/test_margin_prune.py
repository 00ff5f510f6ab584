"""Per-cell score-margin pruning: the default operating point must be
derivation-identical to the unpruned chart on held-out mid-length
prose, short sentences must be bit-identical by construction, and an
over-tight margin must never cost coverage (adaptive backoff)."""

import os

import pytest

from ie_ray.ccg.parser import MARGIN_MIN_TOKENS, CkyParser, tokenize

CLIFFS = "/root/reference/data/books/Speak-cliffsnotes-summary.txt"


def _mid_sentences(k=25):
    from ie_ray.nlp.text import split_sentences
    sents = []
    for para in open(CLIFFS, errors="ignore").read().split("\n"):
        sents.extend(split_sentences(para.strip()))
    out = []
    for s in sents:
        n = len(tokenize(s))
        if MARGIN_MIN_TOKENS <= n <= 47:
            out.append(s)
        if len(out) >= k:
            break
    return out


@pytest.mark.skipif(not os.path.exists(CLIFFS),
                    reason="reference data absent")
def test_default_margin_identical_derivations():
    pool = _mid_sentences()
    assert len(pool) >= 10
    pruned = CkyParser()              # default margin
    unpruned = CkyParser(margin=None)
    for s in pool:
        assert pruned.parse(s) == unpruned.parse(s), s


def test_short_sentences_bit_identical():
    # below MARGIN_MIN_TOKENS the margin never engages — same object
    # path, so identical by construction; pin it anyway
    p = CkyParser()
    u = CkyParser(margin=None)
    for s in ("The boy sees a girl.",
              "Stocks fall as investors panic over the new report."):
        assert p.parse(s) == u.parse(s)


@pytest.mark.skipif(not os.path.exists(CLIFFS),
                    reason="reference data absent")
def test_overtight_margin_backoff_preserves_coverage():
    # margin 0.05 prunes nearly everything; the adaptive backoff must
    # recover every sentence the unpruned chart parses
    pool = _mid_sentences(10)
    tight = CkyParser(margin=0.05)
    unpruned = CkyParser(margin=None)
    for s in pool:
        if unpruned.parse(s) is not None:
            assert tight.parse(s) is not None, s
