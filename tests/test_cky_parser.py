"""T1 gates from the round-1 verdict: the CKY parser must handle
arbitrary NON-fixture text — triples P/R ≥ 0.8 on clausefinder sentences
and < 20 % quarantine on a mixed held-out corpus — with zero missing
composition rules."""

import pytest

from ie_ray.ccg.parser import CkyParser, supertag, tokenize
from ie_ray.nlp.postag import tag
from ie_ray.semantics.engine import Composer
from ie_ray.sources.clausefinder_fixtures import (CLAUSEFINDER_SENTENCES,
                                                  GOLDEN_TRIPLES)

BREXIT_SENTENCES = []
try:
    with open("/root/reference/data/brexit-ccgbank.dat") as f:
        for line in f:
            if line.startswith("SENTENCE:"):
                BREXIT_SENTENCES.append(line.split(":", 2)[2].strip())
except OSError:
    pass


@pytest.fixture(scope="module")
def parser():
    return CkyParser()


def test_postag_basics():
    words = tokenize("The mayor quickly approved the new budget in May.")
    tags = tag(words)
    assert tags[:4] == ["DT", "NN", "RB", "VBD"]
    assert tags[words.index("May")] == "NNP"


def test_tokenize_normalizes_unicode():
    assert tokenize("Standard & Poor’s") == ["Standard", "&", "Poor", "'s"]
    assert tokenize("rose 0.5% in May") == ["rose", "0.5%", "in", "May"]


def test_clausefinder_parse_rate(parser):
    c = Composer()
    ok = 0
    for s in CLAUSEFINDER_SENTENCES:
        d = parser.parse(s)
        if d is None:
            continue
        c.compose_ccgbank(d)         # must not raise
        ok += 1
    assert not c.missing_rules, c.missing_rules
    assert ok / len(CLAUSEFINDER_SENTENCES) >= 0.95, \
        (ok, len(CLAUSEFINDER_SENTENCES))


def test_triple_precision_recall(parser):
    """The verdict's T1 done-bar: triples P/R ≥ 0.8 on non-fixture text."""
    c = Composer()
    tp = fp = fn = 0
    for s, gold in GOLDEN_TRIPLES.items():
        d = parser.parse(s)
        got = set()
        if d is not None:
            got = {(t["subj"], t["pred"], t["obj"])
                   for t in c.compose_ccgbank(d).triples()
                   if t["kind"] == "arg"}
        tp += len(got & gold)
        fp += len(got - gold)
        fn += len(gold - got)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    assert precision >= 0.8, (precision, recall)
    assert recall >= 0.8, (precision, recall)


@pytest.mark.skipif(not BREXIT_SENTENCES, reason="reference data absent")
def test_mixed_corpus_quarantine_rate(parser):
    """< 20 % quarantine on clausefinder + real news sentences."""
    c = Composer()
    pool = CLAUSEFINDER_SENTENCES + BREXIT_SENTENCES
    failed = 0
    for s in pool:
        d = parser.parse(s)
        if d is None:
            failed += 1
            continue
        try:
            c.compose_ccgbank(d)
        except Exception:
            failed += 1
    assert failed / len(pool) < 0.10, (failed, len(pool))
    assert not c.missing_rules, c.missing_rules


def test_supertag_shapes():
    cands = supertag(tokenize("The committee wants to approve the plan."))
    # every token gets at least one candidate with (cat, pos, weight)
    assert all(cands) and all(len(c[0]) == 3 for c in cands)


def test_parser_used_by_replay_actor(ray_session):
    import pyarrow as pa
    import ray.data
    from ie_ray.stages.parse import ReplayParserActor
    sents = ["The senator criticizes the controversial reform.",
             "Maria Castellano has approved the annual budget.",
             "The committee will review the proposal in March."]
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(["u"] * len(sents)),
        "para_idx": pa.array([0] * len(sents), type=pa.int32()),
        "sent_idx": pa.array(range(len(sents)), type=pa.int32()),
        "sentence": pa.array(sents),
    }))
    rows = ds.map_batches(ReplayParserActor,
                          fn_constructor_kwargs={"derivations": {}},
                          batch_format="pyarrow", concurrency=(1, 1),
                          num_cpus=0.5).take_all()
    assert all(r["parse_error"] == "" for r in rows), rows
    c = Composer()
    merged = set()
    for r in rows:
        for t in c.compose_ccgbank(r["ccgbank"]).triples():
            if t["kind"] == "arg":
                merged.add((t["subj"], t["pred"], t["obj"]))
    assert ("senator", "criticize", "reform") in merged
    assert ("Maria-Castellano", "approve", "budget") in merged
    assert ("committee", "review", "proposal") in merged


def test_object_extraction_and_attribution(parser):
    """Type-raising + composition covers object relatives (reduced and
    bare); quote-attribution parentheticals parse."""
    c = Composer()
    d = parser.parse("The plan the committee rejected failed.")
    assert d is not None
    tr = {(t["subj"], t["pred"]) for t in c.compose_ccgbank(d).triples()
          if t["kind"] == "arg"}
    assert ("plan", "reject") in tr or ("committee", "reject") in tr
    # reduced relative with no relativizer, embedded in a PP
    d2 = parser.parse(
        "He repaired the damage in a way few other countries have "
        "accomplished.")
    assert d2 is not None
    c.compose_ccgbank(d2)
    assert not c.missing_rules


CLIFFS_PATH = "/root/reference/data/books/Speak-cliffsnotes-summary.txt"


@pytest.mark.skipif(not __import__("os").path.exists(CLIFFS_PATH),
                    reason="reference data absent")
def test_held_out_prose_coverage(parser):
    """≥0.95 parse+compose rate on genuinely held-out expository prose
    (every 6th sentence of the cliffsnotes corpus — none are fixtures)."""
    from ie_ray.nlp.text import split_sentences
    sents = []
    for para in open(CLIFFS_PATH).read().split("\n"):
        para = para.strip()
        if para:
            sents.extend(split_sentences(para))
    pool = [s for s in sents if 3 <= len(s.split()) <= 40][::6]
    assert len(pool) > 100
    c = Composer()
    ok = 0
    for s in pool:
        d = parser.parse(s)
        if d is None:
            continue
        c.compose_ccgbank(d)      # must not raise on a produced parse
        ok += 1
    assert not c.missing_rules, c.missing_rules
    assert ok / len(pool) >= 0.95, (ok, len(pool))


BOOKS = ["/root/reference/data/books/Speak-cliffsnotes-summary.txt",
         "/root/reference/data/books/Speak/analysis.txt",
         "/root/reference/data/books/brexit.txt",
         "/root/reference/data/books/Speak-Laurie_Halse_Anderson_djvu.txt"]


@pytest.mark.skipif(not __import__("os").path.exists(BOOKS[0]),
                    reason="reference data absent")
def test_long_sentence_coverage(parser):
    """48-150-word sentences (the reference service cap is 250,
    CcgServiceHandler.java:56-57) must parse+compose with quarantine
    rate < 10% under the punctuation-constrained chart: natural long
    sentences from held-out prose plus coordinations of consecutive
    real mid-length sentences."""
    import os
    from ie_ray.nlp.text import split_sentences
    from ie_ray.ccg.parser import tokenize

    def is_prose(toks):
        return toks and sum(
            1 for t in toks if t[0].isalpha()) / len(toks) >= 0.7

    allsents = []
    for p in BOOKS:
        if not os.path.exists(p):
            continue
        for para in open(p, errors="ignore").read().split("\n"):
            allsents.extend(split_sentences(para.strip()))
    nat = [s for s in allsents
           if is_prose(tokenize(s)) and 48 <= len(tokenize(s)) <= 150]
    mids = [s for s in allsents
            if is_prose(tokenize(s)) and 15 <= len(tokenize(s)) <= 45
            and s and s[-1] in ".!?"]
    joiners = [", and ", ", but ", "; ", ", while "]
    synth, i = [], 0
    while i + 1 < len(mids) and len(synth) < 48:
        a, b = mids[i].rstrip(".!?"), mids[i + 1].rstrip(".!?")
        s = a + joiners[len(synth) % len(joiners)] + b[0].lower() + b[1:] + "."
        if 48 <= len(tokenize(s)) <= 150:
            synth.append(s)
        i += 2
    pool = nat + synth
    assert len(pool) >= 40
    c = Composer()
    ok = 0
    for s in pool:
        d = parser.parse(s)
        if d is None:
            continue
        c.compose_ccgbank(d).get_drs()  # must not raise on a parse
        ok += 1
    assert not c.missing_rules, c.missing_rules
    assert ok / len(pool) >= 0.9, (ok, len(pool))


def test_chunk_layout_constraints():
    """Punctuation-constraint layout: punct tokens are singleton chunks,
    oversized comma-free chunks re-cut at clause openers, and a truly
    unsplittable oversized chunk quarantines (returns None)."""
    from ie_ray.ccg.parser import _chunk_layout

    words = "a b c , d e".split()
    chunk_id, cuts = _chunk_layout(words, grid_max=48)
    assert chunk_id == [0, 0, 0, 1, 2, 2]
    assert cuts[0] and cuts[3] and cuts[4] and cuts[6]

    # oversized chunk with a conjunction re-cuts before it
    long_words = ["w%d" % i for i in range(6)] + ["and"] + \
        ["v%d" % i for i in range(6)]
    chunk_id, cuts = _chunk_layout(long_words, grid_max=8)
    assert cuts[6]  # cut lands before "and"
    assert max(chunk_id) >= 1

    # no punct, no clause opener, > grid_max tokens → quarantine
    assert _chunk_layout(["w%d" % i for i in range(10)], grid_max=8) is None
