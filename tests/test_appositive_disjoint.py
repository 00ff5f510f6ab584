"""C9 completion: appositives via disjoint-DRS-graph analysis — NP NP
juxtaposition aliases (_AKA), event-less disconnected graphs are marked
_ORPHANED, and disjoint_spans exposes the component structure (parity:
ccg.py:1078-1197, get_disjoint_drs_spans ccg.py:1822-1861)."""

from ie_ray.semantics.engine import Composer

# "Bell , a company" after comma absorption: NP juxtaposed with NP
JUXT = ("(<T NP 0 2> (<T NP 0 1> (<L N NNP NNP Bell N>) ) "
        "(<T NP 0 2> (<L NP/N DT DT a NP/N>) (<L N NN NN company N>) ) )")

# full sentence: "Bell , a company , opened ."
SENT = ("(<T S[dcl] 1 2> " + JUXT + " (<T S[dcl]\\NP 0 1> "
        "(<L S[dcl]\\NP VBD VBD opened S[dcl]\\NP>) ) )")


def test_juxtaposed_np_apposition_alias():
    c = Composer()
    sem = c.compose_ccgbank(SENT)
    assert not c.missing_rules
    tr = {(t["subj"], t["pred"], t["obj"], t["kind"]) for t in sem.triples()}
    assert ("Bell", "aka", "company", "aka") in tr
    assert ("Bell", "open", None, "arg") in tr
    # the alias condition joins the graphs — one component, no orphans
    assert len(sem.disjoint_spans()) == 1
    assert "_ORPHANED" not in sem.get_drs().show()


def test_two_clause_coordination_not_orphaned():
    # "the door opened and I stepped" style coordination leaves two event
    # graphs — neither is an orphan
    drv = ("(<T S[dcl] 0 2> "
           "(<T S[dcl] 1 2> (<T NP 0 2> (<L NP/N DT DT The NP/N>) "
           "(<L N NN NN door N>) ) (<T S[dcl]\\NP 0 1> "
           "(<L S[dcl]\\NP VBD VBD opened S[dcl]\\NP>) ) ) "
           "(<T S[dcl][conj] 1 2> (<L conj CC CC and conj>) "
           "(<T S[dcl] 1 2> (<L NP PRP PRP I NP>) (<T S[dcl]\\NP 0 1> "
           "(<L S[dcl]\\NP VBD VBD stepped S[dcl]\\NP>) ) ) ) )")
    sem = Composer().compose_ccgbank(drv)
    assert len(sem.disjoint_spans()) == 2
    assert "_ORPHANED" not in sem.get_drs().show()


def test_eventless_disconnected_np_is_orphaned():
    # headline-style juxtaposition with no verb and no alias path:
    # hand-build two unconnected noun tokens
    from ie_ray.ccg.category import Category
    from ie_ray.semantics.engine import SentenceSem
    from ie_ray.semantics.lexicon import Token, build_leaf_sem
    n = Category.parse("N")
    t0 = Token(0, "budget", "NN", n)
    t1 = Token(1, "strike", "NN", n)
    for t in (t0, t1):
        t.sem = build_leaf_sem(t)
        for c in t.conds:
            c.src = t
    sem = SentenceSem([t0, t1], [], None)
    assert sem.disjoint_spans() == [[0], [1]]
    sem.mark_orphans()
    assert "_ORPHANED" in sem.get_drs().show()
