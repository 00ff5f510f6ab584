"""Incremental graph maintenance: two-delta update == one-shot build."""
import shutil

import pyarrow as pa
import pytest


def _triples(rows):
    return pa.table({
        "subj_id": pa.array([r[0] for r in rows], type=pa.string()),
        "subj": pa.array([r[1] for r in rows], type=pa.string()),
        "pred": pa.array([r[2] for r in rows], type=pa.string()),
        "obj_id": pa.array([r[3] for r in rows], type=pa.string()),
        "obj": pa.array([r[4] for r in rows], type=pa.string()),
        "kind": pa.array([r[5] for r in rows], type=pa.string()),
    })


BATCH_A = [
    ("e:acme", "Acme", "acquire", "e:globex", "Globex", "arg"),
    ("e:acme", "Acme Corp", "acquire", "e:globex", "Globex", "arg"),
    ("e:acme", "Acme", "hire", "e:smith", "Smith", "arg"),
    ("e:smith", "Smith", "own", "e:car", "car", "poss"),
    ("e:x", "X", "rel", None, None, "arg"),          # dropped: null obj
]
BATCH_B = [
    ("e:acme", "Acme Corp", "acquire", "e:globex", "Globex", "arg"),
    ("e:acme", "Acme Corp", "acquire", "e:initech", "Initech", "arg"),
    ("e:smith", "J. Smith", "join", "e:initech", "Initech", "arg"),
]


def _snapshot(out_dir):
    from ie_ray.stages.graph_update import read_graph
    edges = {(r["subj_id"], r["pred"], r["obj_id"]): r["n"]
             for r in read_graph(out_dir, "edges").take_all()}
    nodes = {r["entity_id"]: (r["label"], r["mentions"])
             for r in read_graph(out_dir, "nodes").take_all()}
    return edges, nodes


def test_incremental_equals_one_shot(ray_session, tmp_path):
    import ray.data
    from ie_ray.stages.graph_update import update_graph

    inc_dir = str(tmp_path / "inc")
    one_dir = str(tmp_path / "one")
    m1 = update_graph(inc_dir, ray.data.from_arrow(_triples(BATCH_A)))
    assert m1["version"] == "v1"
    m2 = update_graph(inc_dir, ray.data.from_arrow(_triples(BATCH_B)))
    assert m2["version"] == "v2"
    update_graph(one_dir,
                 ray.data.from_arrow(_triples(BATCH_A + BATCH_B)))
    assert _snapshot(inc_dir) == _snapshot(one_dir)

    edges, nodes = _snapshot(inc_dir)
    assert edges[("e:acme", "acquire", "e:globex")] == 3
    assert edges[("e:smith", "own", "e:car")] == 1
    # majority label across BOTH deltas: "Acme Corp" (3) beats "Acme" (2)
    assert nodes["e:acme"] == ("Acme Corp", 5)
    # previous version remains intact (checkpoint: crash mid-v2 would
    # leave v1 CURRENT)
    assert (tmp_path / "inc" / "v1" / "edges").is_dir()


def test_crash_leaves_previous_version_current(ray_session, tmp_path):
    import ray.data
    from ie_ray.stages.graph_update import read_graph, update_graph

    out = str(tmp_path / "g")
    update_graph(out, ray.data.from_arrow(_triples(BATCH_A)))
    before, _ = _snapshot(out)
    # simulate a crashed second update: a half-written version directory
    # without the CURRENT flip
    (tmp_path / "g" / "v2" / "edges").mkdir(parents=True)
    after, _ = _snapshot(out)
    assert after == before          # reads still serve v1
    # a retried update publishes v2 properly... but the stale partial v2
    # dir is in the way of write_parquet? update_graph overwrites it.
    update_graph(out, ray.data.from_arrow(_triples(BATCH_B)))
    edges, _ = _snapshot(out)
    assert edges[("e:acme", "acquire", "e:globex")] == 3
