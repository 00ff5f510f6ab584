"""T4/J3: VerbNet class DB + lexeme implications (reference output mode
switched on via set_verbnet_db; default stays CO_NO_VERBNET)."""

import os

import pytest

SEMLINK = "/root/reference/data/semlink/1.2.2c/vn-pb/vnpbMappings"

DRV = (r'(<T S[dcl] 1 2> (<T NP 0 2> (<L NP/N DT DT The NP/N>) '
       r'(<L N NN NN boy N>) ) (<T S[dcl]\NP 0 2> '
       r'(<L (S[dcl]\NP)/NP VBZ VBZ %s (S[dcl]\NP)/NP>) '
       r'(<T NP 0 2> (<L NP/N DT DT a NP/N>) (<L N NN NN plan N>) ) ) )')


@pytest.fixture(scope="module")
def db():
    if not os.path.exists(SEMLINK):
        pytest.skip("semlink data absent")
    from ie_ray.kb.verbnet import load_default
    d = load_default()
    assert d is not None
    return d


@pytest.fixture()
def vn_enabled(db):
    from ie_ray.semantics.lexicon import set_verbnet_db
    set_verbnet_db(db)
    yield db
    set_verbnet_db(None)


def test_db_index(db):
    assert db.classes("give") == ["13.1-1", "95"]
    assert db.classes("die") == ["48.2"]
    assert db.classes("zzz-not-a-verb") == []
    assert db.thematic_roles("give", "13.1-1") == {
        "0": "Agent", "1": "Theme", "2": "Recipient"}


def test_single_class_implication(vn_enabled):
    from ie_ray.semantics.engine import Composer
    drs = Composer().compose_ccgbank(DRV % "dies").get_drs().show()
    assert "(die(E2)) -> (_vn_48.2(E2))" in drs
    assert " or " not in drs


def test_multi_class_or_chain(vn_enabled):
    from ie_ray.semantics.engine import Composer
    drs = Composer().compose_ccgbank(DRV % "supports").get_drs().show()
    # support → {31.2, 47.8, 72}: odd leftover (72) seeded first, then the
    # (31.2 | 47.8) pair — reference pairing order (lexeme.py:624-637)
    assert ("(support(E2)) -> ((_vn_72(E2)) or "
            "((_vn_31.2(E2)) or (_vn_47.8(E2))))") in drs


def test_default_mode_unchanged(db):
    from ie_ray.semantics.engine import Composer
    drs = Composer().compose_ccgbank(DRV % "supports").get_drs().show()
    assert "_vn_" not in drs


def test_triples_survive_verbnet(vn_enabled):
    from ie_ray.semantics.engine import Composer
    tr = {(t["subj"], t["pred"], t["obj"])
          for t in Composer().compose_ccgbank(DRV % "supports").triples()}
    assert ("boy", "support", "plan") in tr


VNXML_DIR = "/root/reference/src/python/marbles/ie/kb/data/vnxml"


@pytest.mark.skipif(not __import__("os").path.isdir(VNXML_DIR),
                    reason="vnxml data absent")
def test_vnxml_member_breadth(db):
    """Round-4 breadth sweep: every MEMBER lemma of the reference's full
    VerbNet class XML must be in the index (SemLink alone covered only
    87.4%); SemLink role maps must survive the merge."""
    import os
    import xml.etree.ElementTree as ET
    members = set()
    for f in os.listdir(VNXML_DIR):
        if f.endswith(".xml"):
            try:
                root = ET.parse(os.path.join(VNXML_DIR, f)).getroot()
            except ET.ParseError:
                continue
            for m in root.iter("MEMBER"):
                n = m.get("name")
                if n:
                    members.add(n.replace("_", " "))
    assert len(members) > 4000
    missing = members - set(db.name_index)
    assert not missing, sorted(missing)[:10]
    # vnxml-only lemma got classes; SemLink entry kept its role map
    assert db.classes("absorb")
    assert db.thematic_roles("reveal", "29.2-1-2")
