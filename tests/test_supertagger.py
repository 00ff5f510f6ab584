"""Statistical/VerbNet supertag refinement (T1 upgrade, round 4).

The hand lexicon's dominant failure mode was a mis-tagged open-class
verb gating the chart (POS tagger reads "reveal" as JJ, "storms" as
NNS → no verb candidates → quarantine).  These tests pin the two
public-data extensions: VerbNet-lemma-gated verb frames and MLE counts
learned from derivation corpora (``scripts/train_supertagger.py``).
"""

import os

import pytest

from ie_ray.ccg.supertagger import (DEFAULT_MODEL_PATH, SupertagModel,
                                    _stem_guesses, leaf_counts,
                                    verbnet_verb_cats, verbnet_lemmas)


def test_stem_guesses_forms():
    d = dict(_stem_guesses("storms"))
    assert d.get("storm") == "3sg"
    d = dict(_stem_guesses("stopped"))
    assert d.get("stop") == "past"
    d = dict(_stem_guesses("making"))
    assert d.get("make") == "ng"
    d = dict(_stem_guesses("studies"))
    assert d.get("study") == "3sg"
    assert dict(_stem_guesses("reveal")) == {"reveal": "base"}


@pytest.mark.skipif(not verbnet_lemmas(), reason="SemLink data absent")
def test_verbnet_hedge_covers_mistagged_verbs():
    # "reveal" (tagger: JJ) and "storms" (tagger: NNS) must receive verb
    # candidates from VerbNet lemma evidence
    cats = {c for c, _p, _w in verbnet_verb_cats("reveal")}
    assert r"(S[b]\NP)/NP" in cats
    assert r"(S[dcl]\NP)/NP" in cats
    cats = {c for c, _p, _w in verbnet_verb_cats("storms")}
    assert r"(S[dcl]\NP)/NP" in cats        # 3sg form → dcl frames
    # non-verbs contribute nothing
    assert verbnet_verb_cats("zzzqx") == []


def test_leaf_counts_walks_ccgbank_leaves():
    drv = (r"(<T S[dcl] 1 2> (<L NP PRP PRP She NP>) "
           r"(<L S[dcl]\NP VBZ VBZ runs S[dcl]\NP>) )")
    wc, pc = leaf_counts([drv, drv, None])
    assert wc["she"]["NP"] == 2
    assert wc["runs"][r"S[dcl]\NP"] == 2
    assert pc["VBZ"][r"S[dcl]\NP"] == 2


@pytest.mark.skipif(not os.path.exists(DEFAULT_MODEL_PATH),
                    reason="model not trained")
def test_model_extras_bounded_and_additive():
    m = SupertagModel.load()
    # every learned weight sits in the hedge band: never strong enough
    # to outrank a closed-class 0.0 reading
    for w in ("said", "now", "face", "storms"):
        for cat, pos, wt in m.word_extras(w):
            assert -0.76 <= wt <= -0.24, (w, cat, wt)
    # below-evidence words contribute nothing
    assert m.word_extras("zzzqx") == []


@pytest.mark.skipif(not verbnet_lemmas(), reason="SemLink data absent")
def test_mistagged_verb_sentences_parse():
    """End-to-end: the sentences the JJ/NNS mis-tags used to quarantine."""
    from ie_ray.ccg.parser import CkyParser
    from ie_ray.semantics.engine import Composer
    p = CkyParser()
    c = Composer()
    for s in ("Anderson doesn't reveal the secret.",
              "Mr. Neck storms into history class one day.",
              "he gets a job because of immigrants.",
              "For now, she waits.",
              "she has no one on whom to depend."):
        d = p.parse(s)
        assert d is not None, s
        c.compose_ccgbank(d).get_drs()
    assert not c.missing_rules
