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
