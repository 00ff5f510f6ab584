"""BM25 top-k and unigram-LM scoring vs a DuckDB oracle on a planted
corpus (tokenization contract: single-space split == string_split)."""

import duckdb
import pyarrow as pa
import pytest

from ie_ray.stages.retrieval import (UNIGRAM_LOGPROB_SQL, bm25_oracle_sql,
                                     bm25_topk, unigram_logprob)

DOCS = pa.table({
    "doc_id": pa.array(range(8), type=pa.int64()),
    "text": pa.array([
        "join hash join merge scan",
        "dup dup dup detection via hash",
        "stream window agg over stream",
        "hash table build probe side",
        "the quick brown fox",
        "join order matters for the optimizer",
        "dup",
        "scan filter project join stream hash dup window",
    ]),
})


def _oracle(sql: str):
    con = duckdb.connect()
    con.register("documents", DOCS)
    return con.sql(sql).fetchall()


@pytest.mark.usefixtures("ray_session")
def test_bm25_matches_duckdb():
    import ray.data
    got = bm25_topk(ray.data.from_arrow(DOCS),
                    ["dup", "join", "stream", "hash"], k=5).take_all()
    want = _oracle(bm25_oracle_sql(["dup", "join", "stream", "hash"], 5))
    assert [(r["rank"], r["doc_id"], r["score"]) for r in got] == want
    # the all-terms doc and the rare-term-heavy doc must rank on top
    assert {got[0]["doc_id"], got[1]["doc_id"]} == {1, 7}


@pytest.mark.usefixtures("ray_session")
def test_unigram_logprob_matches_duckdb():
    import ray.data
    got = {r["doc_id"]: r["logprob"]
           for r in unigram_logprob(ray.data.from_arrow(DOCS)).take_all()}
    want = dict(_oracle(UNIGRAM_LOGPROB_SQL))
    assert got == want
    # rare words ('quick brown fox') must score lower than stock words
    assert want[4] < want[0]
