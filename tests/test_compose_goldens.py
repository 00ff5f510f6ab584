"""End-to-end compose goldens.

Derivations and expected linear-DRS strings are fixture data taken from the
reference's own test suite (src/python/marbles/ie/test/compose_test.py:88-190)
— the parity contract for this engine.
"""

from ie_ray.semantics.engine import Composer

BOYGIRL = r'''(<T S[dcl] 1 2> (<T NP 0 2> (<L NP/N DT DT The NP/N>) (<L N NN NN boy N>) ) (<T S[dcl]\NP 0 2>
(<L (S[dcl]\NP)/(S[to]\NP) VBZ VBZ wants (S[dcl]\NP)/(S[to]\NP)>) (<T S[to]\NP 0 2>
(<L (S[to]\NP)/(S[b]\NP) TO TO to (S[to]\NP)/(S[b]\NP)>) (<T S[b]\NP 0 2>
(<L (S[b]\NP)/NP VB VB believe (S[b]\NP)/NP>) (<T NP 0 2> (<L NP/N DT DT the NP/N>)
(<L N NN NN girl N>) ) ) ) ) )'''

WELCOME = r'''(<T S[b]\NP 0 2> (<L (S[b]\NP)/PP VB VB Welcome (S[b]\NP)/PP>) (<T PP 0 2> (<L PP/NP TO TO to PP/NP>)
(<T NP 0 1> (<T N 1 2> (<L N/N NNP NNP Merryweather N/N>) (<L N NNP NNP High. N>) ) ) ) )'''

DOOR = r'''(<T S[dcl] 1 2> (<T S[dcl] 1 2> (<T NP 0 2> (<L NP/N DT DT The NP/N>) (<L N NN NN door N>) )
(<L S[dcl]\NP VBZ VBZ opens S[dcl]\NP>) ) (<T S[dcl]\S[dcl] 1 2> (<L conj CC CC and conj>) (<T S[dcl] 1 2>
(<L NP PRP PRP I NP>) (<T S[dcl]\NP 0 2> (<L S[dcl]\NP VBP VBP step S[dcl]\NP>)
(<L (S\NP)\(S\NP) RB RB up. (S\NP)\(S\NP)>) ) ) ) )'''

BUS = r'''(<T S[dcl] 1 2> (<T NP 0 2> (<L NP/N DT DT The NP/N>) (<T N 1 2> (<L N/N NN NN school N/N>)
(<L N NN NN bus N>) ) ) (<T S[dcl]\NP 0 2> (<L (S[dcl]\NP)/PP VBZ VBZ wheezes (S[dcl]\NP)/PP>)
(<T PP 0 2> (<L PP/NP TO TO to PP/NP>) (<T NP 0 2> (<L NP/N PRP$ PRP$ my NP/N>)
(<L N NN NN corner. N>) ) ) ) )'''

FARMER = r'''(<T S[dcl] 1 2> (<T NP 0 2> (<L NP/N DT DT A NP/N>) (<L N NN NN farmer N>) ) (<T S[dcl]\NP 0 2>
(<L (S[dcl]\NP)/PP VBN VBN protested (S[dcl]\NP)/PP>) (<T PP 0 2> (<L PP/NP IN IN against PP/NP>)
(<T NP 0 2> (<L NP/N DT DT the NP/N>) (<T N 1 2> (<L N/N JJ JJ new N/N>) (<L N NN NN tax N>) ) ) ) ) )'''


def _drs(derivation):
    return Composer().compose_ccgbank(derivation)


def test_boygirl_exact():
    # compose_test.py:116
    assert _drs(BOYGIRL).get_drs().show() == (
        "[X1,E2,E3,X4| boy(X1),want(E2),_EVENT(E2),_ARG0(E2,X1),_ARG1(E2,E3),"
        "believe(E3),_EVENT(E3),_ARG0(E3,X1),_ARG1(E3,X4),girl(X4)]")


def test_boygirl_constituents_exact():
    # compose_test.py:122-123
    assert _drs(BOYGIRL).constituent_string() == (
        "S_DCL(The boy #wants to believe the girl) NP(#The boy) "
        "S_INF(#to believe the girl) S_INF(#believe the girl) NP(#the girl)")


def test_boygirl_verbnet_view_exact():
    # compose_test.py:126-127 (get_verbnet_sentence)
    assert _drs(BOYGIRL).verbnet_string() == (
        "NP(#The boy) VP(#wants) S_INF(#to believe) NP(#the girl)")


def test_ccgbank_roundtrip():
    # parity: get_predarg_ccgbank identity (exec_test.py:100-101)
    from ie_ray.ccg.ccgbank import parse_ccgbank, to_ccgbank
    for d in (BOYGIRL, BUS, DOOR, FARMER, WELCOME):
        root, leaves = parse_ccgbank(d)
        ser = to_ccgbank(root)
        root2, leaves2 = parse_ccgbank(ser)
        assert to_ccgbank(root2) == ser
        assert [x.word for x in leaves] == [x.word for x in leaves2]


def test_boygirl_triples():
    t = {(x["subj"], x["pred"], x["obj"]) for x in _drs(BOYGIRL).triples()}
    assert ("boy", "want", "believe") in t
    assert ("boy", "believe", "girl") in t


def test_welcome_proper_merge_exact():
    # compose_test.py:135 (before resolve_proper_names) and :138 (after)
    pre = Composer().compose_ccgbank(WELCOME, resolve_names=False)
    assert pre.get_drs().show() == (
        "[E1,X2| welcome(E1),_EVENT(E1),_ARG0(E1,X3),_ARG1(E1,X2),to(X2),"
        "Merryweather(X2),High(X2)]")
    assert _drs(WELCOME).get_drs().show() == (
        "[E1,X2| welcome(E1),_EVENT(E1),_ARG0(E1,X3),_ARG1(E1,X2),to(X2),"
        "Merryweather-High(X2)]")


def test_door_sentence_conj_exact():
    # compose_test.py:173
    assert _drs(DOOR).get_drs().show() == (
        "[X1,E2,E3| door(X1),open(E2),_EVENT(E2),_ARG0(E2,X1),i(X4),step(E3),"
        "_EVENT(E3),_ARG0(E3,X4),up(E3),direction(E3)]")


def test_bus_possessive_exact():
    # compose_test.py:188
    assert _drs(BUS).get_drs().show() == (
        "[X1,E2,X3| school(X1),bus(X1),wheeze(E2),_EVENT(E2),_ARG0(E2,X1),"
        "_ARG1(E2,X3),to(X3),i(X4),_POSS(X4,X3),corner(X3)]")


def test_farmer_triple():
    t = {(x["subj"], x["pred"], x["obj"]) for x in _drs(FARMER).triples()}
    assert ("farmer", "protest", "tax") in t


def test_no_missing_rules():
    c = Composer()
    for d in (BOYGIRL, WELCOME, DOOR, BUS, FARMER):
        c.compose_ccgbank(d)
    assert not c.missing_rules


def test_advp_constituents_and_merge():
    """C6 refinement: VP-modifier nodes become ADVP constituents; adjacent
    same-type adjuncts merge; bare single-adverb ADVPs are dropped
    (parity: _refine_constituents, ccg.py:783-960)."""
    drv = ("(<T S[dcl] 1 2> (<T NP 0 2> (<L NP/N DT DT The NP/N>) "
           "(<L N NN NN mayor N>) ) (<T S[dcl]\\NP 0 2> "
           "(<T S[dcl]\\NP 0 1> (<L S[dcl]\\NP VBD VBD protested "
           "S[dcl]\\NP>) ) (<T (S\\NP)\\(S\\NP) 0 2> "
           "(<L ((S\\NP)\\(S\\NP))/NP IN IN with ((S\\NP)\\(S\\NP))/NP>) "
           "(<T NP 0 2> (<L NP/N DT DT the NP/N>) "
           "(<L N NN NN union N>) ) ) ) )")
    sem = Composer().compose_ccgbank(drv)
    assert sem.constituent_string() == (
        "S_DCL(The mayor #protested with the union) NP(#The mayor) "
        "ADVP(#with the union) NP(#the union)")
    # single-head: every constituent has a distinct (head, span) slot
    keys = [(c.head, tuple(c.span)) for c in sem.constituents]
    assert len(keys) == len(set(keys))


def test_predarg_ccgbank_view():
    """get_predarg_ccgbank parity (ie/semantics/ccg.py:1711-1820): leaf
    categories carry variable tags reflecting the composed ref sharing —
    the transitive's subject slot tags with the subject noun's variable."""
    sem = Composer().compose_ccgbank(
        r'(<T S[dcl] 1 2> (<T NP 0 2> (<L NP/N DT DT The NP/N>) '
        r'(<L N NN NN boy N>) ) (<T S[dcl]\NP 0 2> '
        r'(<L (S[dcl]\NP)/NP VBZ VBZ sees (S[dcl]\NP)/NP>) '
        r'(<T NP 0 2> (<L NP/N DT DT a NP/N>) (<L N NN NN girl N>) ) ) )')
    pa = sem.predarg_ccgbank()
    assert "(S[dcl]_2\\NP_1)/NP_3" in pa
    assert "boy N_1" in pa and "girl N_3" in pa
    # round-trips through the parser (tags are legal category syntax)
    from ie_ray.ccg.ccgbank import parse_ccgbank
    root, leaves = parse_ccgbank(pa)
    assert len(leaves) == 5
