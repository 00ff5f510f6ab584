"""Property-based oracle parity: the Python kernels and their DuckDB
SQL twins must agree on ARBITRARY corpora, not just the ASCII fixtures
(hypothesis-generated texts include unicode letters, repeated/leading/
trailing spaces and empty strings — the cases where split semantics
usually diverge)."""

import duckdb
import pyarrow as pa
from hypothesis import given, settings, strategies as st

# words: unicode letters/digits/punct, no spaces (space is the delimiter
# under test); texts: space-joined with possible empty tokens
_word = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Po"),
                           blacklist_characters=" '\"\\"),
    min_size=0, max_size=8)
_text = st.lists(_word, min_size=0, max_size=30).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=12)


def _docs_table(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string())})


def _sql(docs, q):
    con = duckdb.connect()
    con.register("documents", docs)
    return con.sql(q).fetchall()


@settings(max_examples=40, deadline=None)
@given(_corpus)
def test_chunking_rule_matches_sql(texts):
    docs = _docs_table(texts)
    W, S = 5, 3
    got = []
    for did, text in zip(range(len(texts)), texts):
        w = text.split(" ")
        for i in range((len(w) + S - 1) // S):
            seg = w[i * S:i * S + W]
            got.append((did, i, len(seg), " ".join(seg)))
    want = _sql(docs, (
        "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS l "
        "FROM documents) "
        "SELECT doc_id, i, LEAST(i*%d+%d, len(l)) - i*%d, "
        "array_to_string(l[(i*%d+1)::INT : LEAST(i*%d+%d, len(l))::INT],"
        " ' ') FROM tok, UNNEST(range(0, ((len(l)+%d)//%d)::BIGINT)) "
        "AS t(i) ORDER BY doc_id, i" % (S, W, S, S, S, W, S - 1, S)))
    assert sorted(got) == sorted(want)


@settings(max_examples=40, deadline=None)
@given(_corpus)
def test_bpe_pairs_match_sql(texts):
    from collections import Counter
    from ie_ray.stages.tokenizer import bpe_pairs_oracle_sql
    docs = _docs_table(texts)
    pairs = Counter()
    for text in texts:
        for w in text.split(" "):
            for i in range(len(w) - 1):
                pairs[w[i:i + 2]] += 1
    got = sorted(pairs.items(), key=lambda x: (-x[1], x[0]))[:1000]
    want = _sql(docs, bpe_pairs_oracle_sql(1000))
    assert got == [tuple(r) for r in want]


@settings(max_examples=40, deadline=None)
@given(_corpus)
def test_heavy_hitter_threshold_matches_sql(texts):
    from collections import Counter
    from ie_ray.stages.sketches import heavy_hitters_oracle_sql
    docs = _docs_table(texts)
    cnt = Counter()
    total = 0
    for text in texts:
        w = text.split(" ")
        total += len(w)
        cnt.update(w)
    phi = 0.2
    got = sorted(((w, c) for w, c in cnt.items() if c >= phi * total),
                 key=lambda x: (-x[1], x[0]))
    want = _sql(docs, heavy_hitters_oracle_sql(phi))
    assert got == [tuple(r) for r in want]
