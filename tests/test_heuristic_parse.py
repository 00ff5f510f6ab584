"""Heuristic parser fallback: out-of-corpus sentences still produce
derivations and triples instead of quarantine rows."""

from ie_ray.semantics.engine import Composer
from ie_ray.sources.heuristic_parse import synthesize_derivation


def _triples(sentence):
    drv = synthesize_derivation(sentence)
    assert drv is not None, sentence
    return {(t["subj"], t["pred"], t["obj"])
            for t in Composer().compose_ccgbank(drv).triples()}


def test_unseen_vocabulary_svo():
    assert ("zebra", "admires", "xylophone") in \
        _triples("The zebra admires the xylophone.") or \
        ("zebra", "admire", "xylophone") in \
        _triples("The zebra admires the xylophone.")


def test_unseen_name_and_pp():
    t = _triples("Kowalski argues with the referee.")
    assert ("Kowalski", "argue", "referee") in t


def test_unseen_control():
    t = _triples("The committee refuses to ratify the amendment.")
    assert ("committee", "ratify", "amendment") in t


def test_unparseable_returns_none():
    assert synthesize_derivation("Colorless green ideas!") is None
    assert synthesize_derivation("word") is None


def test_pipeline_fallback_reduces_quarantine(ray_session):
    import pyarrow as pa
    import ray
    import ray.data
    from ie_ray.stages.parse import ReplayParserActor
    ds = ray.data.from_arrow(pa.table({
        "url": pa.array(["u"] * 2, type=pa.string()),
        "para_idx": pa.array([0, 0], type=pa.int32()),
        "sent_idx": pa.array([0, 1], type=pa.int32()),
        "sentence": pa.array(["The walrus defends the igloo",
                              ", . ; :"], type=pa.string()),
    }))
    out = ds.map_batches(ReplayParserActor,
                         fn_constructor_kwargs={"derivations": {}},
                         batch_format="pyarrow", concurrency=(1, 1),
                         num_cpus=0.5).take_all()
    by_sent = {r["sent_idx"]: r for r in out}
    assert by_sent[0]["parse_error"] == ""       # fallback parsed it
    assert by_sent[0]["ccgbank"].startswith("(<T")
    # punctuation-only input has no S/NP root — still quarantines
    assert by_sent[1]["parse_error"] == "no_parse"
