"""PDRS (projective DRT) surface — labeled contexts, projection pointers,
assertive merge with label alpha-conversion, and DRS translation (compact
re-expression of ie/drt/pdrs.py after PDRT-SANDBOX)."""

from ie_ray.drt.drs import Ref, Rel, show_linear
from ie_ray.drt.pdrs import PCond, PDRS, PRef, presupposed_name


def test_presupposition_projects_to_front():
    # "John walks": John presupposed in the global context 1, walk local in 2
    x = Ref("x", bound=True); x.bound_idx = 0
    e = Ref("e", bound=True); e.bound_idx = 1
    p = PDRS(2, [(1, 2)],
             [PRef(1, x), PRef(2, e)],
             [PCond(2, Rel("walk", [e])), PCond(2, Rel("_ARG0", [e, x])),
              PCond(1, Rel("John", [x]))])
    d = p.to_drs()
    # projected naming condition takes widest scope (front)
    assert show_linear(d) == "[X1,E2| John(X1),walk(E2),_ARG0(E2,X1)]"
    assert p.free_pointers() == []


def test_free_pointer_detection():
    x = Ref("x")
    p = PDRS(2, [], [PRef(9, x)], [PCond(9, Rel("the", [x]))])
    assert p.free_pointers() == [9]


def test_merge_alpha_converts_clashing_labels():
    xa = Ref("x", bound=True); xa.bound_idx = 0
    xb = Ref("x", bound=True); xb.bound_idx = 1
    a = PDRS(1, [], [PRef(1, xa)], [PCond(1, Rel("boy", [xa]))])
    b = PDRS(1, [], [PRef(1, xb)], [PCond(1, Rel("girl", [xb]))])
    m = a.merge(b)
    # both conditions survive under ONE outer label, no pointer collision
    assert len(m.conds) == 2
    assert len(set(m.labels())) == len(m.labels())
    s = show_linear(m.to_drs())
    assert "boy(X1)" in s and "girl(X2)" in s
    assert m.free_pointers() == []


def test_helper_and_show():
    p = presupposed_name(2, 1, "Reagan")
    assert p.free_pointers() == []
    assert "<1> Reagan(" in p.show()


def test_pdrs_show_set_goldens():
    """Reference goldens (drt/test/pdrs_test.py:12-47): empty PDRS and
    'A man is happy.' in SHOW_SET / SHOW_LINEAR notation."""
    from ie_ray.drt.drs import Ref, Rel
    from ie_ray.drt.pdrs import PDRS, PCond, PRef, show_linear, show_set
    d = PDRS(1, [], [], [])
    assert show_set(d) == "<1,{},{},{}>"
    assert show_linear(d) == "1:[||]"
    x = Ref("x")
    d = PDRS(1, [], [PRef(1, x)],
             [PCond(1, Rel("man", [x])), PCond(1, Rel("happy", [x]))])
    assert show_set(d) == "<1,{x},{(1,man(x)),(1,happy(x))},{}>"
    assert show_linear(d) == "1:[x|(1,man(x)),(1,happy(x))|]"


def test_pdrs_set_notation_roundtrip():
    """parse_pdrs on the reference's NLTK-regression structure
    (pdrs_test.py:50) round-trips through show_set, and its projective
    sub-structure is walkable."""
    from ie_ray.drt.pdrs import PImp, parse_pdrs, show_set
    s = ("<1,{(1,x)},{(1,A(c)),(2,<2,{(2,y)},{(2,B(x,y,z,a))},{}>"
         " -> <3,{(3,z)},{(3,C(x,y,z,a))},{}>)},{}>")
    d = parse_pdrs(s)
    assert len(d.conds) == 2
    imp = d.conds[1].cond
    assert isinstance(imp, PImp)
    assert imp.antecedent.label == 2 and imp.consequent.label == 3
    # canonical form: local universe refs render bare (reference golden
    # test1 shows {x} for PRef(1,·) under label 1)
    canon = ("<1,{x},{(1,A(c)),(2,<2,{y},{(2,B(x,y,z,a))},{}>"
             " -> <3,{z},{(3,C(x,y,z,a))},{}>)},{}>")
    assert show_set(d) == canon
    # idempotent round-trip
    assert show_set(parse_pdrs(show_set(d))) == canon
    # a PROJECTED universe ref keeps its pointer in canonical form
    proj = "<2,{(1,x)},{(1,man(x))},{(1,2)}>"
    assert show_set(parse_pdrs(proj)) == proj


def test_pdrs_accessibility():
    """Accessibility (DRT): the implication consequent sees the
    antecedent's universe and the outer context; the outer context does
    NOT see inner universes. Free refs are those used without any
    accessible introduction (golden get_freerefs: c,z,a at top;
    consequent locally sees x,y,z)."""
    from ie_ray.drt.pdrs import (accessible_labels, accessible_universe,
                                 get_freerefs, get_universes, parse_pdrs)
    s = ("<1,{(1,x)},{(1,A(c)),(2,<2,{(2,y)},{(2,B(x,y,z,a))},{}>"
         " -> <3,{(3,z)},{(3,C(x,y,z,a))},{}>)},{}>")
    d = parse_pdrs(s)
    assert set(accessible_labels(d, 1)) == {1}
    assert set(accessible_labels(d, 2)) == {1, 2}
    assert set(accessible_labels(d, 3)) == {1, 2, 3}
    names = lambda refs: sorted(r.name for r in refs)
    assert names(accessible_universe(d, 1)) == ["x"]
    assert names(accessible_universe(d, 2)) == ["x", "y"]
    assert names(accessible_universe(d, 3)) == ["x", "y", "z"]
    assert names(get_universes(d)) == ["x", "y", "z"]
    assert names(get_freerefs(d)) == ["a", "c", "z"]


def test_pdrs_maps_accessibility():
    """Explicit maps edges (presupposition projection targets) extend
    accessibility beyond structural nesting."""
    from ie_ray.drt.pdrs import PDRS, accessible_labels
    d = PDRS(2, [(1, 2)], [], [])
    assert set(accessible_labels(d, 2)) == {1, 2}


def test_pdrs_amerge_golden():
    """Assertive merge golden (reference pdrs_test.py test3_MergeHappyMan):
    amerge(man, happy) speaks in ONE context."""
    from ie_ray.drt.pdrs import amerge, parse_pdrs, show_set
    man = parse_pdrs("<1,{x},{(1,man(x))},{}>")
    happy = parse_pdrs("<1,{},{(1,happy(x))},{}>")
    assert show_set(amerge(man, happy)) == \
        "<1,{x},{(1,man(x)),(1,happy(x))},{}>"


def test_pdrs_pmerge_golden():
    """Projective merge golden (test3_MergeHappyMan, 'The man is happy'):
    the presupposed side moves to a fresh subordinated context."""
    from ie_ray.drt.pdrs import parse_pdrs, pmerge, show_set
    man = parse_pdrs("<1,{x},{(1,man(x))},{}>")
    happy = parse_pdrs("<1,{},{(1,happy(x))},{}>")
    assert show_set(pmerge(man, happy)) == \
        "<1,{(2,x)},{(2,man(x)),(1,happy(x))},{(1,2)}>"


def test_pdrs_predicates():
    """ispure/isproper/isplain/ispresup/isresolved (reference
    test1_HappyMan assertions)."""
    from ie_ray.drt.pdrs import (isplain, ispresup, isproper, ispure,
                                 isresolved, parse_pdrs, pmerge)
    d = parse_pdrs("<1,{x},{(1,man(x)),(1,happy(x))},{}>")
    assert ispure(d) and isproper(d) and isplain(d) and isresolved(d)
    assert not ispresup(d)
    # free referent -> not proper, not resolved
    f = parse_pdrs("<1,{},{(1,happy(x))},{}>")
    assert not isproper(f) and not isresolved(f)
    # projected content -> presuppositional, not plain
    p = pmerge(parse_pdrs("<1,{x},{(1,man(x))},{}>"), f)
    assert ispresup(p) and not isplain(p)
    # duplicate introduction -> impure
    dup = parse_pdrs(
        "<1,{x},{(2,<2,{(2,x)},{(2,B(x))},{}> -> <3,{},{(3,C(x))},{}>)},{}>")
    assert not ispure(dup)


def test_pdrs_has_bound_regressions():
    """PRef.has_bound truth table from reference test2_NLTKRegressions."""
    from ie_ray.drt.pdrs import has_bound, parse_pdrs
    d = parse_pdrs(
        "<1,{(1,x)},{(1,A(c)),(2,<2,{(2,y)},{(2,B(x,y,z,a))},{}>"
        " -> <3,{(3,z)},{(3,C(x,yd,z,a))},{}>)},{}>")
    assert not has_bound(d, 1, "a")
    assert not has_bound(d, 2, "a")
    assert not has_bound(d, 3, "a")
    assert not has_bound(d, 1, "y")
    assert not has_bound(d, 1, "c")
    assert has_bound(d, 1, "x")
    assert has_bound(d, 2, "y")
    assert has_bound(d, 3, "y")
    assert has_bound(d, 3, "z")


def test_pdrs_purify_golden():
    """purify() renames the bound z (clash with the free z used in the
    antecedent) to z1, leaving free refs untouched (reference
    test2_NLTKRegressions purify golden: universes x,y,z1; freerefs
    c,z,a)."""
    from ie_ray.drt.pdrs import get_freerefs, get_universes, parse_pdrs, \
        purify
    d = parse_pdrs(
        "<1,{(1,x)},{(1,A(c)),(2,<2,{(2,y)},{(2,B(x,y,z,a))},{}>"
        " -> <3,{(3,z)},{(3,C(x,yd,z,a))},{}>)},{}>")
    names = lambda refs: sorted(r.name for r in refs)
    dp = purify(d)
    assert names(get_universes(dp)) == ["x", "y", "z1"]
    assert names(get_freerefs(dp)) == ["a", "c", "z", "yd"] or \
        names(get_freerefs(dp)) == ["a", "c", "yd", "z"]


def test_pdrs_to_fol_goldens():
    """Modal-FOL discharge goldens (reference test0_Empty/test1_HappyMan):
    empty PDRS renders ⊤; 'A man is happy' renders with the world arg."""
    from ie_ray.drt.pdrs import parse_pdrs, to_fol_str
    assert to_fol_str(parse_pdrs("<1,{},{},{}>")) == "⊤"
    d = parse_pdrs("<1,{x},{(1,man(x)),(1,happy(x))},{}>")
    assert to_fol_str(d) == "∃x(man(w,x) ∧ happy(w,x))"
