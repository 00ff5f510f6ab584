"""DRS notation round-trips (parity layer for the reference's
drt/test/drs_test.py fixtures)."""

from ie_ray.drt.drs import show_fol, show_linear, show_set
from ie_ray.drt.parse import parse_drs


def test_set_notation_roundtrip():
    s = "<{X1,E2},{boy(X1),want(E2),_EVENT(E2),_ARG0(E2,X1)}>"
    d = parse_drs(s)
    assert show_set(d) == s
    assert show_linear(d) == \
        "[X1,E2| boy(X1),want(E2),_EVENT(E2),_ARG0(E2,X1)]"


def test_nltk_notation():
    d = parse_drs("([X1],[i(X1),_REFLEX(X1)])")
    assert show_linear(d) == "[X1| i(X1),_REFLEX(X1)]"


def test_free_variables_stay_free():
    d = parse_drs("<{E1},{welcome(E1),_ARG0(E1,X3)}>")
    # X3 not in universe → numbered after bound refs, outside the universe
    assert show_linear(d) == "[E1| welcome(E1),_ARG0(E1,X2)]"


def test_fol_rendering():
    d = parse_drs("<{X1,E2},{boy(X1),run(E2),_ARG0(E2,X1)}>")
    assert show_fol(d) == \
        "exists X1.(exists E2.(boy(X1) & run(E2) & _ARG0(E2,X1)))"
