from ie_ray.nlp.spell import SpellChecker


def test_spell_correct():
    sc = SpellChecker.from_texts([
        "the committee approves the budget",
        "the committee rejects the plan",
        "the budget passes",
    ])
    assert sc.correct("committee") == "committee"
    assert sc.correct("comittee") == "committee"   # deletion
    assert sc.correct("budgete") == "budget"       # insertion
    assert sc.correct("budgwt") == "budget"        # substitution
    assert sc.correct("xyzzy") is None


def test_spell_frequency_ranking():
    sc = SpellChecker([("plan", 10), ("plant", 2)])
    # 'plans' is distance 1 from both; the frequent word wins
    assert sc.correct("plans") == "plan"
