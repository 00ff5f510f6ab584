"""DRS → modal FOL discharge + finite-model checking (reference:
ie/drt/fol.py + to_mfol drs.py:413-443; goldens pdrs_test.py:22-47)."""

from ie_ray.drt.drs import DRS, Imp, Neg, Ref, Rel
from ie_ray.drt.fol import Model, drs_to_mfol, evaluate, show_mfol


def _ref(name):
    r = Ref(name[0], bound=True)
    r.name = name
    return r


def test_empty_drs_is_top():
    f = drs_to_mfol(DRS([]))
    assert show_mfol(f) == "⊤"
    assert evaluate(f, Model([], []))


def test_happy_man_golden():
    """Reference golden: '∃x(man(w,x) ∧ happy(w,x))'
    (pdrs_test.py:44-47)."""
    x = _ref("x")
    d = DRS([Rel("man", [x]), Rel("happy", [x])])
    f = drs_to_mfol(d)
    assert show_mfol(f) == "∃x(man(w,x) ∧ happy(w,x))"
    sat = Model(["a", "b"], {("man", "w", "a"), ("happy", "w", "a"),
                             ("man", "w", "b")})
    unsat = Model(["a", "b"], {("man", "w", "a"), ("happy", "w", "b")})
    assert evaluate(f, sat)
    assert not evaluate(f, unsat)


def test_implication_universal_closure():
    """([x],[man(x)]) → ([y],[happy(y), loves(x,y)]): every man loves
    some happy individual."""
    x, y = _ref("x"), _ref("y")
    d = DRS([Imp(DRS([Rel("man", [x])]),
                 DRS([Rel("happy", [y]), Rel("loves", [x, y])]))])
    f = drs_to_mfol(d)
    s = show_mfol(f)
    assert s.startswith("∀x(man(w,x) → ∃y")
    good = Model(["m1", "m2", "h"],
                 {("man", "w", "m1"), ("man", "w", "m2"),
                  ("happy", "w", "h"),
                  ("loves", "w", "m1", "h"), ("loves", "w", "m2", "h")})
    assert evaluate(f, good)
    bad = Model(["m1", "h"],
                {("man", "w", "m1"), ("happy", "w", "h")})
    assert not evaluate(f, bad)


def test_negation():
    x = _ref("x")
    d = DRS([Rel("dog", [x]), Neg(DRS([Rel("barks", [x])]))])
    f = drs_to_mfol(d)
    quiet = Model(["d"], {("dog", "w", "d")})
    loud = Model(["d"], {("dog", "w", "d"), ("barks", "w", "d")})
    assert evaluate(f, quiet)
    assert not evaluate(f, loud)


def test_engine_drs_discharges():
    """A composed sentence's DRS must translate and model-check: the
    extracted facts themselves form a satisfying model."""
    from ie_ray.semantics.engine import Composer
    d = (r'(<T S[dcl] 1 2> (<T NP 0 2> (<L NP/N DT DT The NP/N>) '
         r'(<L N NN NN boy N>) ) (<T S[dcl]\NP 0 2> '
         r'(<L (S[dcl]\NP)/NP VBZ VBZ sees (S[dcl]\NP)/NP>) '
         r'(<T NP 0 2> (<L NP/N DT DT a NP/N>) (<L N NN NN girl N>) ) ) )')
    drs = Composer().compose_ccgbank(d).get_drs()
    f = drs_to_mfol(drs)
    # build the term model from the DRS's own conditions
    names = drs.names()
    facts = set()
    for c in drs.conditions:
        facts.add((c.pred, "w", *[names[r.find()] for r in c.refs]))
    m = Model(list(names.values()), facts)
    assert evaluate(f, m)
    # removing the _ARG1 edge falsifies it
    facts2 = {t for t in facts if t[0] != "_ARG1"}
    assert not evaluate(f, Model(list(names.values()), facts2))
