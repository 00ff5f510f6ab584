"""BPE merge training + application vs an independent sequential-merge
twin (applying merges in training order must equal the greedy
lowest-rank-first encoder)."""

import pyarrow as pa

import ray.data

from ie_ray.stages.tokenizer import (BpeEncodeActor, bpe_encode_counts,
                                     bpe_encode_word, train_bpe)

TEXTS = [
    "the lowest low was newer than the newest wide west",
    "wide wide west low lower lowest newest",
    "a new era of the widest west winds",
    "the the the low low newest newest wide",
]


def _sequential_encode(word, merges):
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_greedy_equals_sequential():
    rows = []
    from collections import Counter
    c = Counter(w for t in TEXTS for w in t.split())
    rows = [{"word": w, "n": n} for w, n in c.items()]
    merges = train_bpe(rows, n_merges=20)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in c:
        assert bpe_encode_word(w, ranks) == _sequential_encode(w, merges)


def test_train_deterministic():
    rows = [{"word": w, "n": i + 1}
            for i, w in enumerate(["abc", "abd", "bcd", "abcd"])]
    assert train_bpe(rows, 6) == train_bpe(list(reversed(rows)), 6)


def test_bpe_encode_counts_dataset():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
        "text": pa.array(TEXTS, type=pa.string())}))
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_encode_counts(ds, n_merges=20).take_all()}

    from collections import Counter
    c = Counter(w for t in TEXTS for w in t.split())
    merges = train_bpe([{"word": w, "n": n} for w, n in c.items()], 20)
    for i, t in enumerate(TEXTS):
        expect = sum(len(_sequential_encode(w, merges))
                     for w in t.split())
        assert got[i] == expect
    # merging strictly compresses vs characters and never beats words
    for i, t in enumerate(TEXTS):
        n_chars = sum(len(w) for w in t.split())
        n_words = len(t.split())
        assert n_words <= got[i] <= n_chars
