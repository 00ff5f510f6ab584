"""Hashed-bucket DSIR (scale variant): determinism, planted
target/raw separation, and rank agreement with the exact-word
variant on a corpus where the signal is unambiguous."""

import numpy as np
import pyarrow as pa

from ie_ray.stages.retrieval import dsir_scores, dsir_scores_hashed


def _corpus():
    """Target-language docs reuse a distinctive vocabulary; others
    don't — DSIR must rank lookalikes of the target slice higher."""
    tgt_words = "alpha beta gamma delta epsilon zeta".split()
    raw_words = "uno dos tres cuatro cinco seis".split()
    rng = np.random.default_rng(3)
    rows = []
    for i in range(30):
        w = rng.choice(tgt_words, size=40)
        rows.append((i, " ".join(w), "en"))
    for i in range(30, 60):
        w = rng.choice(raw_words, size=40)
        rows.append((i, " ".join(w), "xx"))
    # held-out lookalikes, labeled xx so they contribute nothing to the
    # target LM — score must come from resembling the target slice
    for i in range(60, 70):
        w = rng.choice(tgt_words, size=40)
        rows.append((i, " ".join(w), "xx"))
    for i in range(70, 80):
        w = rng.choice(raw_words, size=40)
        rows.append((i, " ".join(w), "xx"))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "lang": pa.array([r[2] for r in rows], type=pa.string())})


def _scores(fn, ds):
    return {r["doc_id"]: r["dsir_score"] for r in fn(ds).take_all()}


def test_hashed_determinism_and_separation(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_corpus()).repartition(4)
    s1 = _scores(lambda d: dsir_scores_hashed(d, "en"), ds)
    s2 = _scores(lambda d: dsir_scores_hashed(d, "en"), ds)
    assert s1 == s2                       # deterministic across runs
    assert len(s1) == 80
    look = [s1[i] for i in range(60, 70)]   # target lookalikes
    non = [s1[i] for i in range(70, 80)]    # raw lookalikes
    assert min(look) > max(non)


def test_hashed_agrees_with_exact_on_ranking(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_corpus()).repartition(4)
    hashed = _scores(lambda d: dsir_scores_hashed(d, "en"), ds)
    exact = _scores(lambda d: dsir_scores(d, "en"), ds)
    # both variants must agree on which held-out docs look like the
    # target: the top-10 of the held-out slice is the lookalike set
    held = list(range(60, 80))
    top_h = set(sorted(held, key=lambda i: -hashed[i])[:10])
    top_e = set(sorted(held, key=lambda i: -exact[i])[:10])
    assert top_h == top_e == set(range(60, 70))
