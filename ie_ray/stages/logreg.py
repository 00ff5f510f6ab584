"""Model-based quality filtering: a fastText-style linear classifier
over hashed bag-of-words features, trained with distributed full-batch
gradient passes — the TRAINED filter stage of CCNet/GPT-3/LLaMA-style
data pipelines, complementing the repo's heuristic (Gopher rules),
perplexity (CCNet bigram LM) and importance-sampling (DSIR) filters.

Scale shape, by construction:
- Features are crc32-hashed unigram counts folded into a fixed ``dim``
  bucket space — NO vocabulary exchange ever happens (the same
  open-web recipe as dsir_scores_hashed).  Featurization runs ONCE and
  materializes a compact features Dataset (doc_id, y, buckets,
  weights); at real scale that table persists to Parquet and training
  re-reads it instead of re-tokenizing the corpus every iteration.
- Each training iteration is ONE streaming pass: the weight vector
  broadcasts via ``ray.put`` (dim+1 floats), every block computes its
  EXACT gradient partial vectorized (scatter-add over its tokens) and
  emits one (dim+1)-float row; the driver folds the bounded partials
  and steps.  Full-batch gradient descent is deterministic — same
  data, same weights, any block order (partials are exact sums).
- Scoring is a stateless broadcast map.

Verification (tests/test_logreg.py): the distributed gradient is
bit-compared against a dense NumPy twin, training is run-to-run
deterministic, and held-out separation is gated on a planted
two-distribution corpus.
"""

from __future__ import annotations

import zlib
from typing import Tuple

import numpy as np
import pyarrow as pa


def _hash_tokens(col, dim: int):
    """(bucket, row, n_rows) for every whitespace token in the block —
    the shared retrieval.token_crc32 core folded into ``dim``
    buckets."""
    from .retrieval import token_crc32
    h, offsets, n_rows, _ = token_crc32(col)
    rows = np.repeat(np.arange(n_rows, dtype=np.int64),
                     np.diff(offsets))
    return h % dim, rows, n_rows


def featurize(ds, dim: int = 2048, text_col: str = "text",
              id_col: str = "doc_id", label_col: str | None = None):
    """documents → compact features Dataset: (doc_id[, y], bucket ids,
    per-token weight 1/n_tokens).  Single-space splitting keeps empty
    tokens (crc32("") is just another bucket), so every row keeps ≥ 1
    feature and the dense twin reproduces the features exactly."""

    def fx(t: pa.Table) -> pa.Table:
        buckets, rows, n_rows = _hash_tokens(t.column(text_col), dim)
        # tokens arrive row-major (rows = repeat(arange)), so the list
        # columns come straight from the offsets — no per-row loop
        counts = np.bincount(rows, minlength=n_rows)
        offsets = np.concatenate(
            ([0], np.cumsum(counts))).astype(np.int32)
        w_flat = np.repeat(1.0 / np.maximum(counts, 1), counts)
        out = {
            "doc_id": t.column(id_col).cast(pa.int64()),
            "buckets": pa.ListArray.from_arrays(
                pa.array(offsets),
                pa.array(buckets.astype(np.int32))),
            "weights": pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(w_flat))}
        if label_col is not None:
            out["y"] = t.column(label_col).cast(pa.float64())
        return pa.table(out)

    return ds.map_batches(fx, batch_format="pyarrow")


def _block_grad(t: pa.Table, w: np.ndarray, b: float, dim: int):
    """Exact (grad, grad_b, loss, n) for one block — scatter-gather
    over the block's flattened token lists, no Python loops."""
    bl = t.column("buckets").combine_chunks()
    wl = t.column("weights").combine_chunks()
    y = np.asarray(t.column("y"), dtype=np.float64)
    off = np.asarray(bl.offsets, dtype=np.int64)
    buckets = np.asarray(bl.flatten(), dtype=np.int64)
    weights = np.asarray(wl.flatten(), dtype=np.float64)
    rows = np.repeat(np.arange(len(bl), dtype=np.int64), np.diff(off))
    z = np.zeros(len(bl), dtype=np.float64)
    np.add.at(z, rows, w[buckets] * weights)
    z += b
    p = 1.0 / (1.0 + np.exp(-z))
    # stable log-loss
    loss = float(np.sum(np.logaddexp(0.0, z) - y * z))
    resid = p - y
    grad = np.bincount(buckets, weights=resid[rows] * weights,
                       minlength=dim)
    return grad, float(resid.sum()), loss, len(bl)


def logreg_train(features, dim: int = 2048, iters: int = 40,
                 lr: float = 20.0, l2: float = 1e-4,
                 verbose: bool = False) -> Tuple[np.ndarray, float, list]:
    """Full-batch gradient descent over a (materialized) features
    Dataset.  Returns ``(w, b, per-iteration mean losses)``.  The lr
    schedule ``lr / (1 + 0.05·k)`` plus a deterministic halving of the
    base rate whenever the loss rises is fixed — no randomness
    anywhere, so retraining reproduces the weights bit-for-bit."""
    import ray

    feats = features.materialize()
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    losses = []
    for k in range(iters):
        w_ref = ray.put((w, b))

        def gpart(t: pa.Table) -> pa.Table:
            ww, bb = ray.get(w_ref)
            g, gb, loss, n = _block_grad(t, ww, bb, dim)
            # k: a content-derived sort key — take_all() returns blocks
            # in COMPLETION order (preserve_order is off), and float64
            # partial sums are order-sensitive, so the driver re-sorts
            # partials by k before folding to keep retraining
            # bit-identical on a loaded cluster
            k = int(pa.compute.min(t.column("doc_id")).as_py())
            return pa.table({
                "k": pa.array([k], type=pa.int64()),
                "g": pa.array([g.tolist()],
                              type=pa.list_(pa.float64())),
                "gb": pa.array([gb], type=pa.float64()),
                "loss": pa.array([loss], type=pa.float64()),
                "n": pa.array([n], type=pa.int64())})

        rows = sorted(feats.map_batches(gpart,
                                        batch_format="pyarrow").take_all(),
                      key=lambda r: r["k"])
        n = sum(r["n"] for r in rows)
        if n == 0:
            break
        grad = np.sum([np.asarray(r["g"]) for r in rows], axis=0) / n \
            + l2 * w
        grad_b = sum(r["gb"] for r in rows) / n
        loss = sum(r["loss"] for r in rows) / n \
            + 0.5 * l2 * float(w @ w)
        losses.append(loss)
        if len(losses) >= 2 and losses[-1] > losses[-2]:
            lr *= 0.5  # deterministic divergence guard
        step = lr / (1.0 + 0.05 * k)
        w = w - step * grad
        b = b - step * grad_b
        if verbose:
            print("iter %d loss %.6f" % (k, loss))
    return w, b, losses


def logreg_score(features, w: np.ndarray, b: float,
                 round_to: int = 4):
    """Broadcast-score a features Dataset → (doc_id, score)."""
    import ray
    w_ref = ray.put((np.asarray(w, dtype=np.float64), float(b)))

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ww, bb = ray.get(w_ref)
        bl = t.column("buckets").combine_chunks()
        wl = t.column("weights").combine_chunks()
        off = np.asarray(bl.offsets, dtype=np.int64)
        buckets = np.asarray(bl.flatten(), dtype=np.int64)
        weights = np.asarray(wl.flatten(), dtype=np.float64)
        rows = np.repeat(np.arange(len(bl), dtype=np.int64),
                         np.diff(off))
        z = np.zeros(len(bl), dtype=np.float64)
        np.add.at(z, rows, ww[buckets] * weights)
        z += bb
        p = 1.0 / (1.0 + np.exp(-z))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "score": pc.round(pa.array(p, type=pa.float64()), round_to,
                              round_mode="half_towards_infinity")})

    return features.map_batches(score, batch_format="pyarrow")


def corrupt_text_deterministic(text: str, keep_every: int = 3) -> str:
    """Deterministic out-of-distribution negative for classifier
    gates: every word whose index is not a multiple of ``keep_every``
    is reversed (a disjoint 'garbage vocabulary'), the rest stay —
    so negatives overlap positives ~1/keep_every and the task is
    learnable but not trivially separable."""
    words = text.split(" ")
    return " ".join(w if i % keep_every == 0 else w[::-1]
                    for i, w in enumerate(words))


def dense_twin_grad(texts, ys, w, b, dim):
    """O(n·dim) NumPy twin of one distributed gradient pass (tests)."""
    X = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        ws = t.split(" ")  # empty tokens KEPT — parity with split_pattern
        n = len(ws)
        for word in ws:
            X[i, zlib.crc32(word.encode("utf-8")) % dim] += 1.0 / n
    y = np.asarray(ys, dtype=np.float64)
    z = X @ w + b
    p = 1.0 / (1.0 + np.exp(-z))
    loss = float(np.sum(np.logaddexp(0.0, z) - y * z))
    return X.T @ (p - y), float((p - y).sum()), loss
