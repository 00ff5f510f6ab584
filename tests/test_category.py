"""Category signature parsing / structure (parity layer for the reference's
ccg_test.py:14-103)."""

from ie_ray.ccg import Category


def test_atom():
    c = Category.parse("N")
    assert c.isatom and c.isn and not c.isfunctor


def test_features():
    c = Category.parse("S[dcl]")
    assert c.base == "S" and c.features == ("dcl",)
    assert c.is_sy
    assert not Category.parse("S[adj]").is_sy


def test_functor_structure():
    c = Category.parse(r"(S[dcl]\NP)/NP")
    assert c.isfunctor and c.isarg_right
    assert c.arg.isnp
    assert c.result.signature == r"S[dcl]\NP"
    assert c.result.isarg_left
    assert c.final_atom().signature == "S[dcl]"
    assert c.arity() == 2


def test_modifier():
    assert Category.parse(r"N/N").ismodifier
    assert Category.parse(r"(S\NP)\(S\NP)").ismodifier
    assert not Category.parse(r"(S[dcl]\NP)/(S[to]\NP)").ismodifier
    assert not Category.parse(r"NP/N").ismodifier


def test_predarg_tags():
    c = Category.parse(r"(S[dcl]\NP_109)/(S[to]_110\NP_109)")
    assert c.arg.arg.tag == "109"
    assert c.result.arg.tag == "109"
    assert c.arg.result.tag == "110"
    # clean signature drops tags
    assert c.signature == r"(S[dcl]\NP)/(S[to]\NP)"


def test_easysrl_markers():
    c = Category.parse(r"(S[to]\NP_20)/(S[b]_21\NP_20:B)_21")
    assert c.isfunctor
    assert c.arg.arg.tag == "20"


def test_can_unify():
    assert Category.parse("S").can_unify(Category.parse("S[dcl]"))
    assert Category.parse("NP").can_unify(Category.parse("NP[nb]"))
    assert Category.parse("N").can_unify(Category.parse("NP"))
    assert Category.parse(r"S[X]\NP").can_unify(Category.parse(r"S[dcl]\NP"))
    assert not Category.parse("NP").can_unify(Category.parse("PP"))


def test_atoms_order():
    c = Category.parse(r"(S[dcl]\NP)/PP")
    assert [a.base for a in c.atoms()] == ["S", "NP", "PP"]
