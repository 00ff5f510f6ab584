"""Distributed logistic-regression quality classifier
(stages/logreg.py): exact gradient parity vs the dense NumPy twin,
bit-deterministic retraining, held-out separation on a planted
two-distribution corpus, and broadcast scoring."""

import numpy as np
import pyarrow as pa
import pytest

from ie_ray.stages.logreg import (corrupt_text_deterministic,
                                  dense_twin_grad, featurize,
                                  logreg_score, logreg_train)

DIM = 256


def _corpus(n: int = 60):
    """Deterministic labeled corpus: positives are 'real' word salads,
    negatives the corrupted (reversed-vocabulary) variants."""
    words = ["table", "query", "stream", "filter", "merge", "window",
             "batch", "column", "vector", "join"]
    texts, ys, ids = [], [], []
    for i in range(n):
        t = " ".join(words[(i * 7 + j * 3) % len(words)]
                     for j in range(8 + i % 5))
        texts.append(t)
        ys.append(1.0)
        ids.append(i)
        texts.append(corrupt_text_deterministic(t))
        ys.append(0.0)
        ids.append(i + 100000)
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
        "y": pa.array(ys, type=pa.float64())})


def test_gradient_matches_dense_twin(ray_session):
    import ray.data
    from ie_ray.stages.logreg import _block_grad
    t = _corpus(20)
    feats = featurize(ray.data.from_arrow(t).repartition(4), dim=DIM,
                      label_col="y")
    rng = np.random.RandomState(3)
    w = rng.randn(DIM)
    b = 0.25
    parts = [
        _block_grad(blk, w, b, DIM)
        for blk in [feats.materialize().to_arrow_refs()]
        for blk in __import__("ray").get(blk) if blk.num_rows]
    g = np.sum([p[0] for p in parts], axis=0)
    gb = sum(p[1] for p in parts)
    loss = sum(p[2] for p in parts)
    tg, tgb, tloss = dense_twin_grad(t.column("text").to_pylist(),
                                     t.column("y").to_pylist(), w, b,
                                     DIM)
    assert np.allclose(g, tg, rtol=1e-12, atol=1e-12)
    assert abs(gb - tgb) < 1e-10
    assert abs(loss - tloss) < 1e-9


def test_training_deterministic_and_converges(ray_session):
    import ray.data
    t = _corpus(40)
    feats = featurize(ray.data.from_arrow(t).repartition(4), dim=DIM,
                      label_col="y")
    w1, b1, l1 = logreg_train(feats, dim=DIM, iters=15)
    w2, b2, l2 = logreg_train(feats, dim=DIM, iters=15)
    assert np.array_equal(w1, w2) and b1 == b2  # bit-identical
    assert l1[-1] < l1[0] * 0.5  # actually learned something


def test_heldout_separation(ray_session):
    import ray.data
    t = _corpus(60)
    import pyarrow.compute as pc
    train = t.filter(pc.equal(pc.bit_wise_and(
        t.column("doc_id"), pa.scalar(1, type=pa.int64())), 0))
    test = t.filter(pc.equal(pc.bit_wise_and(
        t.column("doc_id"), pa.scalar(1, type=pa.int64())), 1))
    feats = featurize(ray.data.from_arrow(train).repartition(4),
                      dim=DIM, label_col="y")
    w, b, _ = logreg_train(feats, dim=DIM, iters=25)
    tfeats = featurize(ray.data.from_arrow(test), dim=DIM)
    scores = {r["doc_id"]: r["score"]
              for r in logreg_score(tfeats, w, b).take_all()}
    y = {i: v for i, v in zip(test.column("doc_id").to_pylist(),
                              test.column("y").to_pylist())}
    pos = [scores[i] for i in scores if y[i] == 1.0]
    neg = [scores[i] for i in scores if y[i] == 0.0]
    assert pos and neg
    # exact AUC over the held-out split
    auc = np.mean([[p > q for q in neg] for p in pos])
    assert auc > 0.9, auc
