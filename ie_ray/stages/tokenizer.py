"""Tokenizer-training primitives.

``bpe_top_pairs`` is the inner loop of byte-pair-encoding vocabulary
training (Sennrich et al. 2016, ACL — public algorithm): count the
frequency of every adjacent symbol pair across the corpus and surface
the top-k merge candidates.  A full BPE trainer repeats this count →
merge step; the count is the only distributed part (the merge table is
O(vocab) and lives on the driver in every public implementation), so
the operator IS the scale-relevant kernel.

Shape: each block reduces its texts to a partial ``(pair, n)`` table
via a word-level Counter — per DISTINCT word, not per token, so a
block with 10^6 tokens but 10^4 distinct words does 10^4 pair scans —
then ONE combiner-style ``groupby.sum`` merges the partials (the key
space is bounded: ≤ |alphabet|² pairs), and a tiny sort yields the
top-k.  Nothing O(corpus) crosses the exchange.

Tokenization contract: single-space split, identical to DuckDB
``string_split(text, ' ')`` — the operator carries an exact SQL oracle.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa


def bpe_top_pairs(docs, k: int = 20):
    """Top-k adjacent character pairs by corpus frequency
    ``(pair, n)``, ties broken by pair ascending."""

    def partial(t: pa.Table) -> pa.Table:
        words = Counter()
        for text in t.column("text").to_pylist():
            words.update(text.split(" "))
        pairs = Counter()
        for w, c in words.items():
            for i in range(len(w) - 1):
                pairs[w[i:i + 2]] += c
        keys = sorted(pairs)
        return pa.table({
            "pair": pa.array(keys, type=pa.string()),
            "n": pa.array([pairs[p] for p in keys], type=pa.int64())})

    agg = (docs.map_batches(partial, batch_format="pyarrow")
           .groupby("pair").sum("n")
           .map_batches(lambda t: t.rename_columns(["pair", "n"]),
                        batch_format="pyarrow"))
    return agg.sort(["n", "pair"], descending=[True, False]).limit(k)


def bpe_pairs_oracle_sql(k: int = 20) -> str:
    """Exact DuckDB equivalent on ``documents`` (1-indexed substr)."""
    return (
        "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w "
        "FROM documents), "
        "p AS (SELECT unnest(list_transform(range(1, length(w)), "
        "i -> substr(w, i::INT, 2))) AS pair FROM tok "
        "WHERE length(w) >= 2) "
        "SELECT pair, count(*) AS n FROM p GROUP BY pair "
        "ORDER BY n DESC, pair LIMIT %d" % k)


def word_freqs(docs, parts: int = 16):
    """Corpus word-frequency table (word, n) — block Counters then one
    bucketed exchange (key space = vocabulary, can be rows-sized on web
    text, hence relational.bucketed_aggregate rather than the plain
    sort-based groupby)."""
    from ie_ray.stages.relational import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        c = Counter()
        for txt in t.column("text").to_pylist():
            for w in txt.split(" "):
                if w:
                    c[w] += 1
        items = sorted(c.items())
        return pa.table({
            "word": pa.array([k for k, _ in items], type=pa.string()),
            "n": pa.array([v for _, v in items], type=pa.int64())})

    return bucketed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        "word", [("n", "sum")], parts=parts)


def train_bpe(word_freq_rows, n_merges: int = 30):
    """Greedy BPE merge-table training (Sennrich et al. 2016) over a
    (word, n) frequency table — the driver-side half of every public BPE
    implementation: the table is O(vocab), only the pair COUNTS are
    distributed (word_freqs above).  Ties break lexicographically so the
    merge list is deterministic.  Returns [(sym_a, sym_b), ...]."""
    vocab = {}
    for r in word_freq_rows:
        w, n = r["word"], int(r["n_sum"] if "n_sum" in r else r["n"])
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + n
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict) -> list:
    """Apply a trained merge table to one word (lowest-rank merge first —
    the standard greedy application order)."""
    syms = list(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        syms[best:best + 2] = [syms[best] + syms[best + 1]]
    return syms


class BpeEncodeActor:
    """Actor-pool stage applying a trained BPE merge table: the rank dict
    and a per-DISTINCT-word memo build once per actor (__init__), batches
    stream through __call__.  Output (doc_id, n_bpe_tokens)."""

    def __init__(self, merges):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.memo = {}

    def _count(self, word: str) -> int:
        n = self.memo.get(word)
        if n is None:
            n = len(bpe_encode_word(word, self.ranks))
            self.memo[word] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        counts = [sum(self._count(w) for w in txt.split(" ") if w)
                  for txt in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bpe_tokens": pa.array(counts, type=pa.int64())})


def bpe_encode_counts(docs, n_merges: int = 30, concurrency=(1, 4)):
    """Full tokenize flow: distributed word counts → driver-side merge
    training on the O(vocab) table → broadcast merge list applied in an
    actor pool.  Returns Dataset (doc_id, n_bpe_tokens)."""
    freq_rows = word_freqs(docs).take_all()   # O(vocab) pull, not corpus
    merges = train_bpe(freq_rows, n_merges)
    return docs.map_batches(
        BpeEncodeActor, fn_constructor_args=(merges,),
        batch_format="pyarrow", concurrency=concurrency, num_cpus=1)
