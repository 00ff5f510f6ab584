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
