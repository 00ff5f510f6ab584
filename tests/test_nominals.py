"""C12 complete: RT-mask referent classification + mask-driven phrase
selection and the nominal views (parity: select_phrases
ie/semantics/ccg.py:1271-1338, get_np_nominals/get_vp_nominals/
get_orphaned_np_nominals :1340-1365; RT_* bits ie/core/constants.py:8-46;
goldens from ie/test/appos_test.py:26-46,72-90)."""

from ie_ray.ccg.parser import CkyParser
from ie_ray.nlp.text import preprocess_sentence
from ie_ray.semantics.engine import Composer
from ie_ray.semantics.reftypes import (
    RT_ANAPHORA, RT_ATTRIBUTE, RT_EMPTY_DRS, RT_ENTITY, RT_EVENT,
    RT_EVENT_MODAL, RT_NUMBER, RT_PLURAL, RT_PROPERNAME)

BELL = ("(<T S[dcl] 1 2> (<T NP 0 2> (<T NP 0 1> (<L N NNP NNP Bell N>) ) "
        "(<T NP 0 2> (<L NP/N DT DT a NP/N>) (<L N NN NN company N>) ) ) "
        "(<T S[dcl]\\NP 0 1> (<L S[dcl]\\NP VBD VBD opened S[dcl]\\NP>) ) )")


def _cky(text):
    drv = CkyParser().parse(preprocess_sentence(text))
    assert drv is not None, text
    return Composer().compose_ccgbank(drv)


def test_rt_masks_on_composed_tokens():
    sem = Composer().compose_ccgbank(BELL)
    by_word = {t.word: t.mask for t in sem.tokens}
    assert by_word["Bell"] & RT_PROPERNAME
    assert by_word["company"] & RT_ENTITY
    assert by_word["opened"] & RT_EVENT
    assert by_word["a"] & RT_EMPTY_DRS          # article: no conditions
    assert not (by_word["company"] & RT_PLURAL)


def test_np_vp_nominals_simple():
    sem = Composer().compose_ccgbank(BELL)
    nps = [sem.span_text(sp) for _, sp in sem.get_np_nominals()]
    vps = [sem.span_text(sp) for _, sp in sem.get_vp_nominals()]
    assert nps == ["Bell", "a company"]
    assert vps == ["opened"]
    assert sem.get_orphaned_np_nominals() is None


def test_appos_at_begin_golden():
    # appos_test.py:26-46 test1_ApposAtBegin
    sem = _cky("A hot-tempered tennis player , Robbie charged the umpire .")
    f = sem.get_np_nominals()
    phrases = {sem.span_text(sp): r for r, sp in f}
    assert "Robbie" in phrases
    assert "A hot-tempered tennis player" in phrases
    assert phrases["Robbie"] is not phrases["A hot-tempered tennis player"]
    aka = [t for t in sem.triples() if t["kind"] == "aka"]
    assert len(aka) == 1


def test_appos_interrupt_golden():
    # appos_test.py:72-90 test3_ApposInterrupt
    sem = _cky("Robbie , a hot-tempered tennis player , charged the umpire .")
    phrases = {sem.span_text(sp): r for r, sp in sem.get_np_nominals()}
    assert "Robbie" in phrases
    assert "a hot-tempered tennis player" in phrases
    aka = [t for t in sem.triples() if t["kind"] == "aka"]
    assert aka == [{"subj": "Robbie", "pred": "aka", "obj": "player",
                    "kind": "aka"}]
    # the attribute rides inside the NP span via RT_ATTRIBUTE
    hot = next(t for t in sem.tokens if t.word == "hot-tempered")
    assert hot.mask & RT_ATTRIBUTE


def test_vp_span_includes_auxiliaries():
    sem = _cky("The company would have been able to report a profit .")
    vps = [sem.span_text(sp) for _, sp in sem.get_vp_nominals()]
    assert any("would have been" in v for v in vps), vps
    would = next(t for t in sem.tokens if t.word == "would")
    assert would.mask & RT_EVENT_MODAL


def test_pronoun_and_number_masks():
    sem = _cky("She bought 5 apples .")
    by_word = {t.word: t.mask for t in sem.tokens}
    assert by_word["She"] & RT_ANAPHORA
    assert by_word["5"] & RT_NUMBER
    assert by_word["apples"] & RT_PLURAL


def test_select_phrases_trims_conjoins():
    # a group whose span would end in a conjoin gets trimmed, and
    # non-contiguous groups with contentful gaps are dropped
    sem = Composer().compose_ccgbank(BELL)
    # select everything with a ref: contiguity drops nothing here
    all_sel = sem.select_phrases(lambda t: bool(t.refs))
    assert all(sp == sorted(sp) for sp in all_sel.values())


def test_orphaned_nominals_view():
    from ie_ray.ccg.category import Category
    from ie_ray.semantics.engine import SentenceSem
    from ie_ray.semantics.lexicon import Token, build_leaf_sem
    n = Category.parse("N")
    toks = []
    for i, w in enumerate(["budget", "strike"]):
        t = Token(i, w, "NN", n)
        t.sem = build_leaf_sem(t)
        for c in t.conds:
            c.src = t
        toks.append(t)
    sem = SentenceSem(toks, [], None)
    sem.mark_orphans()
    orph = sem.get_orphaned_np_nominals()
    assert orph is not None and len(orph) == 1
