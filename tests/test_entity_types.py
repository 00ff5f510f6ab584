"""Entity typing: shape votes + skew-safe majority aggregation."""

import pyarrow as pa
import pytest

from ie_ray.stages.graph import _mention_type, type_entities


def test_mention_type_shapes():
    assert _mention_type("Acme Corp") == "org"
    assert _mention_type("Meridian Holdings") == "org"
    assert _mention_type("Anna Marbury") == "person"
    assert _mention_type("committee") == "concept"
    assert _mention_type("the Plan") == "other"
    assert _mention_type("") == "other"


@pytest.mark.usefixtures("ray_session")
def test_majority_vote_and_tiebreak():
    import ray.data
    rows = {
        "subj_id": ["e1", "e1", "e1", "e2", "e3"],
        "subj": ["Anna Marbury", "Anna Marbury", "committee",
                 "Acme Corp", "union"],
        "obj_id": ["e2", None, "e2", "e3", None],
        "obj": ["Acme Corp", None, "Acme Corp", "union", None],
        "kind": ["arg", "arg", "arg", "aka", "quarantine"],
    }
    got = {r["entity_id"]: (r["etype"], r["evidence"])
           for r in type_entities(
               ray.data.from_arrow(pa.table(rows))).take_all()}
    # e1: 2 person votes vs 1 concept → person, 3 mentions of evidence
    assert got["e1"] == ("person", 3)
    assert got["e2"] == ("org", 3)
    # e3's only non-quarantine mention is 'union' (concept)
    assert got["e3"] == ("concept", 1)


@pytest.mark.usefixtures("ray_session")
def test_fixture_pipeline_types():
    from ie_ray.pipelines.kg import default_fixture_dir, kg_triples
    fd = default_fixture_dir(n_pages=60, pool_size=300)
    got = type_entities(kg_triples(fd)).take_all()
    by_type: dict = {}
    for r in got:
        by_type.setdefault(r["etype"], 0)
        by_type[r["etype"]] += 1
    # the synthetic pool guarantees persons, orgs and common nouns
    assert by_type.get("person", 0) > 0
    assert by_type.get("org", 0) > 0
    assert by_type.get("concept", 0) > 0
