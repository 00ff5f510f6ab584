"""Document deduplication operators for training-data pipelines.

All operate over a documents Dataset ``(doc_id:int64, text:string, ...)``:

* ``exact_dedup_docs``   — md5(text) hash-partition shuffle, keep min doc_id
* ``minhash_lsh_pairs``  — shingle → minhash → band buckets → candidate pairs
* ``simhash_buckets``    — 64-bit simhash, near-dup via hamming ≤ k
* ``ngram_jaccard_pairs``— verified jaccard over n-gram sets for candidates
* ``embedding_dup_pairs``— cosine ≥ τ over an embedding column

Scale notes: every candidate-generation step is a ``map_batches`` emitting
(bucket_key, doc_id) rows followed by ONE ``groupby`` on the bucket key —
the only all-to-all.  Pair verification happens inside the group (groups are
bucket-sized, not corpus-sized).  Hot buckets (boilerplate shingles) are
capped at ``MAX_BUCKET`` docs — beyond that a bucket is pure boilerplate and
every member pair would be emitted by other bands anyway.
"""

from __future__ import annotations

import hashlib
import re
import struct
from typing import List

import numpy as np
import pyarrow as pa

MAX_BUCKET = 256

_WORD_RE = re.compile(r"\w+")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest()
              for t in batch.column(col).to_pylist()]
    return batch.append_column("text_hash", pa.array(hashes, type=pa.string()))


def exact_dedup_docs(ds):
    """One row per distinct text: (text_hash, doc_id=min).  Equivalent SQL:
    SELECT md5(text), min(doc_id) FROM documents GROUP BY 1."""
    ds = ds.map_batches(add_text_hash, batch_format="pyarrow")
    ds = ds.select_columns(["text_hash", "doc_id"])
    return (ds.groupby("text_hash").min("doc_id")
            .map_batches(lambda t: t.rename_columns(["text_hash", "doc_id"]),
                         batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def _stable_hash(s: str) -> int:
    """Process-stable 48-bit hash (python's hash() is salted per process)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:6], "little")


def _shingles(text: str, k: int = 5) -> List[int]:
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        return [_stable_hash(" ".join(words))] if words else []
    return [_stable_hash(" ".join(words[i:i + k]))
            for i in range(len(words) - k + 1)]


class MinHasher:
    """Stateful minhash signer — permutation parameters built once per actor
    (the T1-style pattern: heavy init in __init__, vectorized __call__)."""

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.int64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.int64)
        self.p = (1 << 61) - 1
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text)
        if not sh:
            return np.full(self.num_perm, self.p, dtype=np.int64)
        arr = np.asarray(sh, dtype=np.int64)[:, None]
        vals = (arr * self.a[None, :] + self.b[None, :]) % self.p
        return vals.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "signature": pa.array([s.tolist() for s in sigs],
                                  type=pa.list_(pa.int64())),
        })


def minhash_lsh_pairs(ds, num_perm: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.7,
                      concurrency=(1, 4)):
    """Candidate near-dup pairs via banded LSH, verified by signature
    agreement ≥ threshold.  Returns Dataset (doc_a, doc_b, est_jaccard)."""
    rows_per_band = num_perm // bands
    sigs = ds.map_batches(MinHasher, fn_constructor_kwargs={"num_perm": num_perm},
                          batch_format="pyarrow", concurrency=concurrency,
                          num_cpus=1)

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids, keys, sig_out = [], [], []
        for did, sig in zip(batch.column("doc_id").to_pylist(),
                            batch.column("signature").to_pylist()):
            for b in range(bands):
                seg = sig[b * rows_per_band:(b + 1) * rows_per_band]
                key = "%d:%s" % (b, hashlib.md5(
                    struct.pack("%dq" % len(seg), *seg)).hexdigest()[:16])
                ids.append(did)
                keys.append(key)
                sig_out.append(sig)
        return pa.table({
            "bucket": pa.array(keys, type=pa.string()),
            "doc_id": pa.array(ids, type=pa.int64()),
            "signature": pa.array(sig_out, type=pa.list_(pa.int64())),
        })

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")

    def emit_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        sigs_ = group.column("signature").to_pylist()
        uniq = {}
        for i, s in zip(ids, sigs_):
            uniq.setdefault(i, s)
        ids_u = sorted(uniq)[:MAX_BUCKET]
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids_u)):
            si = np.asarray(uniq[ids_u[i]])
            for j in range(i + 1, len(ids_u)):
                sj = np.asarray(uniq[ids_u[j]])
                est = float((si == sj).mean())
                if est >= jaccard_threshold:
                    a_out.append(ids_u[i])
                    b_out.append(ids_u[j])
                    j_out.append(est)
        return pa.table({
            "doc_a": pa.array(a_out, type=pa.int64()),
            "doc_b": pa.array(b_out, type=pa.int64()),
            "est_jaccard": pa.array(j_out, type=pa.float64()),
        })

    pairs = buckets.groupby("bucket").map_groups(emit_pairs,
                                                 batch_format="pyarrow")
    # same pair can surface from several bands — dedup on (a, b)
    return (pairs.groupby(["doc_a", "doc_b"]).max("est_jaccard")
            .map_batches(lambda t: t.rename_columns(
                ["doc_a", "doc_b", "est_jaccard"]), batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    v = np.zeros(64, dtype=np.int64)
    for w in _WORD_RE.findall(text.lower()):
        h = int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
        bits = np.fromiter(((h >> i) & 1 for i in range(64)), dtype=np.int64,
                           count=64)
        v += 2 * bits - 1
    return int("".join("1" if x > 0 else "0" for x in v), 2)


def add_simhash(batch: pa.Table) -> pa.Table:
    hs = [simhash64(t) for t in batch.column("text").to_pylist()]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "simhash": pa.array(hs, type=pa.uint64()),
    })


def simhash_pairs(ds, max_hamming: int = 3):
    """Near-dup pairs with hamming(simhash) ≤ k via 4-block bucketing
    (a pair within distance 3 shares at least one of 4 16-bit blocks)."""
    hashed = ds.map_batches(add_simhash, batch_format="pyarrow")

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids, keys, hs_out = [], [], []
        for did, h in zip(batch.column("doc_id").to_pylist(),
                          batch.column("simhash").to_pylist()):
            for blk in range(4):
                ids.append(did)
                keys.append("%d:%04x" % (blk, (h >> (16 * blk)) & 0xFFFF))
                hs_out.append(h)
        return pa.table({
            "bucket": pa.array(keys, type=pa.string()),
            "doc_id": pa.array(ids, type=pa.int64()),
            "simhash": pa.array(hs_out, type=pa.uint64()),
        })

    def emit_pairs(group: pa.Table) -> pa.Table:
        uniq = {}
        for i, h in zip(group.column("doc_id").to_pylist(),
                        group.column("simhash").to_pylist()):
            uniq.setdefault(i, h)
        ids_u = sorted(uniq)[:MAX_BUCKET]
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids_u)):
            for j in range(i + 1, len(ids_u)):
                d = bin(uniq[ids_u[i]] ^ uniq[ids_u[j]]).count("1")
                if d <= max_hamming:
                    a_out.append(ids_u[i])
                    b_out.append(ids_u[j])
                    d_out.append(d)
        return pa.table({
            "doc_a": pa.array(a_out, type=pa.int64()),
            "doc_b": pa.array(b_out, type=pa.int64()),
            "hamming": pa.array(d_out, type=pa.int32()),
        })

    pairs = hashed.map_batches(to_buckets, batch_format="pyarrow") \
        .groupby("bucket").map_groups(emit_pairs, batch_format="pyarrow")
    return (pairs.groupby(["doc_a", "doc_b"]).min("hamming")
            .map_batches(lambda t: t.rename_columns(
                ["doc_a", "doc_b", "hamming"]), batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# n-gram jaccard (exact verification)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, n: int = 3, threshold: float = 0.5):
    """Exact jaccard over word n-gram sets for LSH candidates — the
    verify-stage of the minhash pipeline."""
    cands = minhash_lsh_pairs(ds, jaccard_threshold=0.5)
    texts = {r["doc_id"]: r["text"]
             for r in ds.select_columns(["doc_id", "text"]).take_all()} \
        if ds.count() <= 100_000 else None
    if texts is None:
        raise NotImplementedError(
            "corpus too large for broadcast verify; use minhash_lsh_pairs")
    import ray
    ref = ray.put(texts)

    def verify(batch: pa.Table) -> pa.Table:
        import ray as _ray
        tx = _ray.get(ref) if not isinstance(ref, dict) else ref
        a_out, b_out, j_out = [], [], []
        for a, b in zip(batch.column("doc_a").to_pylist(),
                        batch.column("doc_b").to_pylist()):
            wa = _WORD_RE.findall(tx[a].lower())
            wb = _WORD_RE.findall(tx[b].lower())
            ga = {tuple(wa[i:i + n]) for i in range(max(len(wa) - n + 1, 0))}
            gb = {tuple(wb[i:i + n]) for i in range(max(len(wb) - n + 1, 0))}
            if not ga or not gb:
                continue
            j = len(ga & gb) / len(ga | gb)
            if j >= threshold:
                a_out.append(a)
                b_out.append(b)
                j_out.append(round(j, 6))
        return pa.table({
            "doc_a": pa.array(a_out, type=pa.int64()),
            "doc_b": pa.array(b_out, type=pa.int64()),
            "jaccard": pa.array(j_out, type=pa.float64()),
        })

    return cands.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(ds, threshold: float = 0.95, bucket_dims: int = 4):
    """Cosine ≥ τ pairs over (vec_id, embedding:list<float>).

    Blocking: sign-pattern of the first ``bucket_dims`` PCA-free dims — a
    cheap LSH; candidates verified exactly with a numpy matmul per bucket."""
    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_pylist()
        embs = batch.column("embedding").to_pylist()
        keys = []
        for e in embs:
            keys.append("".join("1" if x >= 0 else "0"
                                for x in e[:bucket_dims]))
        return pa.table({
            "bucket": pa.array(keys, type=pa.string()),
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": batch.column("embedding"),
        })

    def emit(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_pylist()
        m = np.asarray(group.column("embedding").to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1
        mn = m / norms
        sims = mn @ mn.T
        a_out, b_out, s_out = [], [], []
        n = len(ids)
        iu, ju = np.triu_indices(n, k=1)
        hits = sims[iu, ju] >= threshold
        for i, j in zip(iu[hits], ju[hits]):
            a, b = sorted((ids[i], ids[j]))
            a_out.append(a)
            b_out.append(b)
            s_out.append(round(float(sims[i, j]), 6))
        return pa.table({
            "vec_a": pa.array(a_out, type=pa.int64()),
            "vec_b": pa.array(b_out, type=pa.int64()),
            "cosine": pa.array(s_out, type=pa.float64()),
        })

    pairs = ds.map_batches(to_buckets, batch_format="pyarrow") \
        .groupby("bucket").map_groups(emit, batch_format="pyarrow")
    result = (pairs.groupby(["vec_a", "vec_b"]).max("cosine")
              .map_batches(lambda t: t.rename_columns(
                  ["vec_a", "vec_b", "cosine"]), batch_format="pyarrow"))
    if result.count() == 0:
        # keep a typed schema even when no pairs clear the threshold
        import ray.data
        return ray.data.from_arrow(pa.table({
            "vec_a": pa.array([], type=pa.int64()),
            "vec_b": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64())}))
    return result
