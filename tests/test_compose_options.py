"""ComposeOptions — the engine's CO_* "query options" surface
(parity: ie/core/constants.py:48-66)."""

import pytest

from ie_ray.drt.drs import DRS, Prop, Ref, Rel
from ie_ray.semantics import ComposeError, ComposeOptions, Composer

BOY = (r'(<T S[dcl] 1 2> (<T NP 0 2> (<L NP/N DT DT The NP/N>) '
       r'(<L N NN NN boy N>) ) (<T S[dcl]\NP 0 2> '
       r'(<L (S[dcl]\NP)/NP VBZ VBZ sees (S[dcl]\NP)/NP>) '
       r'(<T NP 0 2> (<L NP/N DT DT a NP/N>) (<L N NN NN girl N>) ) ) )')


def test_defaults_match_reference_test_config():
    o = ComposeOptions()
    assert o.no_verbnet and o.no_wiki_search and o.fast_rename
    assert not (o.verify_signatures or o.print_derivation
                or o.remove_unary_props or o.varnames_match_word_index)


def test_varnames_match_word_index():
    sent = Composer(ComposeOptions(varnames_match_word_index=True)) \
        .compose_ccgbank(BOY)
    # word idx: The=0 boy=1 sees=2 a=3 girl=4 → X2, E3, X5
    assert sent.show_drs() == \
        "[X2,E3,X5| boy(X2),see(E3),_EVENT(E3),_ARG0(E3,X2)," \
        "_ARG1(E3,X5),girl(X5)]"
    # default numbering unchanged
    assert Composer().compose_ccgbank(BOY).show_drs() == \
        "[X1,E2,X3| boy(X1),see(E2),_EVENT(E2),_ARG0(E2,X1)," \
        "_ARG1(E2,X3),girl(X3)]"


def test_print_derivation(capsys):
    Composer(ComposeOptions(print_derivation=True)).compose_ccgbank(BOY)
    assert "S[dcl]" in capsys.readouterr().out


def test_verify_signatures_raises_on_missing_rule():
    # a category pair with no inferable rule: N + N -> S[dcl]
    bad = (r'(<T S[dcl] 0 2> (<L N NN NN foo N>) (<L N NN NN bar N>) )')
    c = Composer(ComposeOptions(verify_signatures=True))
    with pytest.raises(ComposeError):
        c.compose_ccgbank(bad)
    # default mode: best-effort, records the gap instead
    c2 = Composer()
    c2.compose_ccgbank(bad)
    assert ("N", "N", "S[dcl]") in c2.missing_rules


def test_discard_adjunct_constituents():
    adv = (r'(<T S[dcl] 1 2> (<L NP PRP PRP He NP>) '
           r'(<T S[dcl]\NP 0 2> (<L S[dcl]\NP VBD VBD slept S[dcl]\NP>) '
           r'(<T (S\NP)\(S\NP) 1 2> '
           r'(<L ((S\NP)\(S\NP))/((S\NP)\(S\NP)) RB RB very '
           r'((S\NP)\(S\NP))/((S\NP)\(S\NP))>) '
           r'(<L (S\NP)\(S\NP) RB RB soundly (S\NP)\(S\NP)>) ) ) )')
    with_adv = Composer().compose_ccgbank(adv)
    without = Composer(ComposeOptions(
        discard_adjunct_constituents=True)).compose_ccgbank(adv)
    kinds = lambda s: [c.vntype for c in s.constituents]
    assert "ADVP" in kinds(with_adv)
    assert "ADVP" not in kinds(without)


def test_remove_unary_props_drs():
    x, y = Ref("x", bound=True), Ref("x", bound=True)
    x.bound_idx, y.bound_idx = 0, 1
    d = DRS([Rel("company", [x]),
             Prop(x, DRS([Rel("telecom", [y])]))])
    out = d.remove_unary_props()
    assert not any(isinstance(c, Prop) for c in out.conditions)
    # the prop referent now unifies with the inlined sub-referent
    assert x.find() is y.find()
