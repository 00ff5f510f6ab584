"""C14 algebra surface: merge/purify/alpha_convert/get_freerefs plus
Prop/Box/Diamond conditions (re-expressed under union-find semantics;
parity anchors in ie_ray/drt/drs.py docstrings)."""

from ie_ray.drt.drs import (DRS, Box, Diamond, Neg, Prop, Ref, Rel,
                            alpha_convert, get_freerefs, merge, purify,
                            show_fol, show_linear)


def _base():
    x = Ref("x", bound=True); x.bound_idx = 0
    e = Ref("e", bound=True); e.bound_idx = 1
    f = Ref("x")
    d = DRS([Rel("boy", [x]), Rel("see", [e]), Rel("_ARG0", [e, x]),
             Rel("_ARG1", [e, f])])
    return d, x, e, f


def test_freerefs_and_merge():
    d, x, e, f = _base()
    assert get_freerefs(d) == [f]
    d2 = DRS([Prop(f, DRS([Rel("happy", [x])])),
              Box(DRS([Rel("law", [f])])),
              Diamond(DRS([Rel("rain", [e])]))])
    m = merge(d, d2)
    assert show_linear(m) == (
        "[X1,E2| boy(X1),see(E2),_ARG0(E2,X1),_ARG1(E2,X3),"
        "X3: (happy(X1)),◻(law(X3)),◇(rain(E2))]")


def test_alpha_convert_disconnects():
    d, x, e, f = _base()
    c = alpha_convert(d)
    before = show_linear(c)
    x.union(f)                    # mutate the ORIGINAL forest
    assert show_linear(d).count("X1") > 2          # original collapsed
    assert show_linear(c) == before                # copy untouched


def test_alpha_convert_mapping_and_purify():
    d, x, e, f = _base()
    g = Ref("x", bound=True); g.bound_idx = 5
    c = alpha_convert(d, {f.find(): g})
    assert get_freerefs(c) == []                   # f renamed to bound g
    p = purify(DRS([Rel("a", [x]), Rel("a", [x]), Neg(DRS([Rel("b", [e])]))]))
    assert len(p.conditions) == 2


def test_fol_with_modal_conditions():
    d, x, e, f = _base()
    m = merge(d, DRS([Box(DRS([Rel("law", [f])]))]))
    s = show_fol(m)
    assert s.startswith("exists X1.(exists E2.(")
    assert "◻(law(X3))" in s
