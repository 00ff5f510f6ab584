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
