"""Robustness on real-corpus derivations (WSJ-style with predarg tags, and
the brexit derivation set from the reference's data/)."""

import os

import pytest

from ie_ray.semantics.engine import Composer

WSJ_LDC = r'''(<T S[dcl] 0 2> (<T S[dcl] 1 2> (<T NP 0 2> (<T NP 0 1> (<L N NNS NNS Yields N>) ) (<T NP\NP 0 2>
(<L (NP\NP)/NP IN IN on (NP_111\NP_111)/NP_112>) (<T NP 0 1> (<T N 1 2> (<L N/N JJ JJ money-market N_128/N_128>)
(<T N 1 2> (<L N/N JJ JJ mutual N_121/N_121>) (<L N NNS NNS funds N>) ) ) ) ) ) (<T S[dcl]\NP 0 2>
(<T S[dcl]\NP 0 2> (<T S[dcl]\NP 0 2> (<L (S[dcl]\NP)/(S[to]\NP) VBD VBD continued
(S[dcl]\NP_10)/(S[to]_11\NP_10:B)_11>) (<T S[to]\NP 0 2>
(<L (S[to]\NP)/(S[b]\NP) TO TO to (S[to]\NP_20)/(S[b]_21\NP_20:B)_21>)
(<L S[b]\NP VB VB slide S[b]\NP_26>) ) ) (<L , , , , ,>) ) (<T (S\NP)\(S\NP) 0 2>
(<L ((S\NP)\(S\NP))/NP IN IN amid ((S_41\NP_36)_41\(S_41\NP_36)_41)/NP_42>) (<T NP 0 1> (<T N 0 2>
(<L N/S[em] NNS NNS signs N/S[em]_47>) (<T S[em] 0 2> (<L S[em]/S[dcl] IN IN that S[em]/S[dcl]_52>)
(<T S[dcl] 1 2> (<T NP 0 1> (<T N 1 2> (<L N/N NN NN portfolio N_98/N_98>) (<L N NNS NNS managers N>) ) )
(<T S[dcl]\NP 0 2> (<L (S[dcl]\NP)/NP VBP VBP expect (S[dcl]\NP_59)/NP_60>) (<T NP 0 2> (<T NP 0 1> (<T N 1 2>
(<L N/N JJ JJ further N_69/N_69>) (<L N NNS NNS declines N>) ) ) (<T NP\NP 0 2>
(<L (NP\NP)/NP IN IN in (NP_78\NP_78)/NP_79>) (<T NP 0 1> (<T N 1 2> (<L N/N NN NN interest N_88/N_88>)
(<L N NNS NNS rates N>) ) ) ) ) ) ) ) ) ) ) ) ) (<L . . . . .>) )'''

BREXIT = "/root/reference/data/brexit-ccgbank.dat"


def test_wsj0004_tagged_derivation():
    """Predarg-tagged LDC derivation (compose_test.py:199-208): subject
    control through 'continued to slide', a tagged VP modifier 'amid', and
    an embedded clause.  Control/modifier sharing must come from the tags,
    never from the untagged heuristics."""
    c = Composer()
    sem = c.compose_ccgbank(WSJ_LDC)
    t = {(x["subj"], x["pred"], x["obj"]) for x in sem.triples()}
    assert ("yields", "continue", "slide") in t
    assert ("yields", "slide", None) in t
    assert ("managers", "expect", "declines") in t
    assert not c.missing_rules
    # 'amid' must attach to the matrix event and the 'signs' NP, which stays
    # distinct from the subject
    drs = sem.get_drs().show()
    assert "amid(E3,X5)" in drs and "signs(X5)" in drs


REF_TESTS = "/root/reference/src/python/marbles/ie/test"


@pytest.mark.skipif(not os.path.isdir(REF_TESTS),
                    reason="reference test sources not present")
def test_all_reference_inline_derivations_compose():
    """Every inline CCGBANK derivation in the reference's own test suite
    (compose/exec/gold_constituent) composes with no missing rules."""
    import re
    derivs = []
    for f in ("gold_constituent_test.py", "compose_test.py", "exec_test.py"):
        src = open(os.path.join(REF_TESTS, f)).read()
        derivs += [d for d in re.findall(r"r'''(.*?)'''", src, re.S)
                   if "<T" in d]
    assert len(derivs) >= 50
    c = Composer()
    for d in derivs:
        sem = c.compose_ccgbank(d)
        sem.get_drs().show()
        sem.triples()
    assert not c.missing_rules, c.missing_rules


@pytest.mark.skipif(not os.path.exists(BREXIT),
                    reason="reference data not present")
def test_brexit_corpus_composes():
    lines = open(BREXIT).read().splitlines()
    derivs = [l.split(":", 2)[2] for l in lines if l.startswith("CCG:")]
    assert len(derivs) == 10
    c = Composer()
    triples = []
    for d in derivs:
        sem = c.compose_ccgbank(d)   # must not raise
        triples.extend(sem.triples())
    got = {(x["subj"], x["pred"], x["obj"]) for x in triples}
    assert ("she", "want", "Britain") in got
    assert ("Britain", "stay", "EU") in got
    assert ("Christine-Lagarde", "say", "enjoy") in got
