"""Clause-extraction path (C15): reference fixture parity + synthesized
parses + the Ray stage."""

import json
import os

import pytest

REF_JSON = "/root/reference/data/clausefinder_test.json"


@pytest.mark.skipif(not os.path.exists(REF_JSON),
                    reason="reference fixtures not present")
def test_reference_clause_fixtures():
    """The canned Google-NLP parse from the reference repo; expected clause
    strings from data/clausefinder_test.txt (# EXPECTED lines)."""
    from ie_ray.nlp.clause import extract_clauses_google
    doc = json.load(open(REF_JSON))
    res = extract_clauses_google(doc)
    rendered = [" | ".join(c.render() for c in cl) for cl in res]
    assert rendered[0] == "(Albert Einstein) (died)"
    assert rendered[1] == "(Albert Einstein) (remained) (in Princeton)"
    assert rendered[2] == "(Albert Einstein) (is) (smart)"
    assert rendered[3] == "(Albert Einstein) (has won) (the Nobel Prize)"
    assert rendered[4] == "(RSAS) (gave) (Albert Einstein) (the Nobel Prize)"
    assert rendered[5] == ("(The doorman) (showed) (Albert Einstein) "
                           "(to his office)")
    assert rendered[6] == "(Albert Einstein) (declared) (the meeting open)"
    # conjoined verbs inherit the subject (Bell makes / Bell distributes)
    assert "(Bell) (makes)" in rendered[12]
    assert "(Bell) (distributes)" in rendered[12]


def test_synthesized_parses_and_stage(ray_session):
    import pyarrow as pa
    import ray.data
    from ie_ray.sources.depparse import parse_simple_sentence
    from ie_ray.stages.clauses import extract_clauses_batch

    sents = [
        "The farmer supports the tax.",
        "The council votes against the plan.",
        "Anna Marbury rejects the reform.",
    ]
    rows = {"sent_id": [], "parse_json": []}
    for i, s in enumerate(sents):
        parsed = parse_simple_sentence(s)
        assert parsed is not None, s
        rows["sent_id"].append(i)
        rows["parse_json"].append(json.dumps(parsed[0]))
    ds = ray.data.from_arrow(pa.table({
        "sent_id": pa.array(rows["sent_id"], type=pa.int64()),
        "parse_json": pa.array(rows["parse_json"], type=pa.string()),
    }))
    out = ds.map_batches(extract_clauses_batch, batch_format="pyarrow").take_all()
    by_sent = {r["sent_id"]: r for r in out}
    assert by_sent[0]["subject"] == "The farmer"
    assert by_sent[0]["verb"] == "supports"
    assert by_sent[0]["objects"] == "the tax"
    assert by_sent[1]["objects"] == "against the plan"
    assert by_sent[2]["subject"] == "Anna Marbury"
