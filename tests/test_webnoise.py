"""Messy-web-text robustness gate for the CKY/supertagger path.

VERDICT r4 next-round #1: the held-out corpora are clean prose, but the
reference's whole reason for a learned parser is web garbage.  This gate
measures quarantine rate and triple P/R on the adversarial family in
:mod:`ie_ray.sources.webnoise` — URLs/emails in-sentence, emoji,
ALL-CAPS headlines, broken quoting, list fragments, non-ASCII names,
HTML remnants — against the clean-prose baseline.

Bars (from the verdict): adversarial quarantine ≤ max(2× clean rate,
2 %); triple P/R ≥ 0.9 on noise-wrapped golden sentences.
"""
import pytest

from ie_ray.ccg.parser import CkyParser, tokenize
from ie_ray.semantics.engine import Composer
from ie_ray.sources.clausefinder_fixtures import (CLAUSEFINDER_SENTENCES,
                                                  GOLDEN_TRIPLES)
from ie_ray.sources.webnoise import (PERTURBATIONS, WEB_FRAGMENTS,
                                     adversarial_pool)


@pytest.fixture(scope="module")
def parser():
    return CkyParser()


def _run(parser, pool):
    """(n_failed, n_total): quarantines + compose exceptions."""
    c = Composer()
    failed = 0
    for s in pool:
        try:
            d = parser.parse(s)
            if d is None:
                failed += 1
                continue
            c.compose_ccgbank(d).get_drs()
        except Exception:
            failed += 1
    assert not c.missing_rules, c.missing_rules
    return failed, len(pool)


def test_adversarial_quarantine_rate(parser):
    base = list(CLAUSEFINDER_SENTENCES)
    try:
        with open("/root/reference/data/brexit-ccgbank.dat") as f:
            for line in f:
                if line.startswith("SENTENCE:"):
                    base.append(line.split(":", 2)[2].strip())
                if len(base) > 60:
                    break
    except OSError:
        pass
    clean_failed, clean_n = _run(parser, base)
    adv = [s for _k, s in adversarial_pool(base)]
    adv_failed, adv_n = _run(parser, adv)
    clean_rate = clean_failed / clean_n
    adv_rate = adv_failed / adv_n
    assert adv_rate <= max(2 * clean_rate, 0.02), \
        (adv_failed, adv_n, clean_failed, clean_n)


def test_web_fragments_never_crash(parser):
    # boilerplate fragments parse-or-quarantine; an exception is a bug
    c = Composer()
    for s in WEB_FRAGMENTS:
        d = parser.parse(s)
        if d is not None:
            c.compose_ccgbank(d).get_drs()
    assert not c.missing_rules, c.missing_rules


# perturbations that wrap noise AROUND the proposition without changing
# it — the triples must survive byte-for-byte
_GOLD_PRESERVING = ["url_tail", "url_mid", "email_attrib", "emoji_tail",
                    "caps_prefix", "broken_quote", "list_bullet",
                    "list_number", "html_amp"]


def test_adversarial_triple_precision_recall(parser):
    c = Composer()
    tp = fp = fn = 0
    for i, (s, gold) in enumerate(GOLDEN_TRIPLES.items()):
        for j, k in enumerate(_GOLD_PRESERVING):
            ns = PERTURBATIONS[k](s, i * 7 + j)
            g = set(gold)
            if k == "email_attrib":
                # ", said a spokesman" adds a REAL say event (quotative
                # inversion) — the proposition itself must still hold
                g.add(("spokesman", "say", None))
            d = parser.parse(ns)
            got = set()
            if d is not None:
                got = {(t["subj"], t["pred"], t["obj"])
                       for t in c.compose_ccgbank(d).triples()
                       if t["kind"] == "arg"}
            tp += len(got & g)
            fp += len(got - g)
            fn += len(g - got)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    assert precision >= 0.9, (precision, recall, tp, fp, fn)
    assert recall >= 0.9, (precision, recall, tp, fp, fn)


def test_quotative_inversion():
    p = CkyParser()
    c = Composer()
    d = p.parse("Albert Einstein died, said a spokesman.")
    got = {(t["subj"], t["pred"], t["obj"])
           for t in c.compose_ccgbank(d).triples() if t["kind"] == "arg"}
    assert ("Albert-Einstein", "die", None) in got
    assert ("spokesman", "say", None) in got
    # plain transitive use unaffected
    d = p.parse("He said a word.")
    got = {(t["subj"], t["pred"], t["obj"])
           for t in c.compose_ccgbank(d).triples() if t["kind"] == "arg"}
    assert got == {("he", "say", "word")}


def test_url_email_single_tokens():
    toks = tokenize("See https://example.com/a?b=1&c=2 or mail "
                    "press@example.com now.")
    assert "https://example.com/a?b=1&c=2" in toks
    assert "press@example.com" in toks


def test_citation_noise_stripped():
    assert tokenize("Albert Einstein died, according to "
                    "https://example.com/news?id=0&ref=rss.") == \
        ["Albert", "Einstein", "died", "."]
    assert tokenize("Albert Einstein died (see "
                    "www.example.org/story-1.html).") == \
        ["Albert", "Einstein", "died", "."]
    assert tokenize("Reagan has died 😍🎉.") == \
        ["Reagan", "has", "died", "."]
    assert tokenize("BREAKING: He should leave.") == \
        ["He", "should", "leave", "."]
    assert tokenize("• The committee approved the plan.") == \
        ["The", "committee", "approved", "the", "plan", "."]


def test_headline_decasing_and_unicode_names():
    p = CkyParser()
    c = Composer()
    d = p.parse("ALBERT EINSTEIN DIED.")
    got = {(t["subj"], t["pred"], t["obj"])
           for t in c.compose_ccgbank(d).triples() if t["kind"] == "arg"}
    assert ("Albert-Einstein", "die", None) in got
    d = p.parse("José Müller founded the company in Zürich in 1999.")
    got = {(t["subj"], t["pred"], t["obj"])
           for t in c.compose_ccgbank(d).triples() if t["kind"] == "arg"}
    assert ("José-Müller", "found", "company") in got


def test_present_tense_headline_gets_s_root():
    # the cheap no-hedge pass reads this as one noun compound; the
    # S-root preference must force the hedge pass and a verbal parse
    p = CkyParser()
    c = Composer()
    d = p.parse("Stocks fall as investors panic.")
    got = {t["pred"] for t in c.compose_ccgbank(d).triples()
           if t["kind"] == "arg"}
    assert "fall" in got


def test_clean_prose_tokenization_unchanged():
    # the web path must never fire on plain prose (replay-dict keys)
    for s in CLAUSEFINDER_SENTENCES[:10]:
        assert tokenize(s) == tokenize(s)  # deterministic
    assert tokenize("The boy sees a girl.") == \
        ["The", "boy", "sees", "a", "girl", "."]
    assert tokenize("Mr. Smith's dog, which barked, ran off.") == \
        ["Mr", ".", "Smith", "'s", "dog", ",", "which", "barked", ",",
         "ran", "off", "."]
