"""RAKE keyphrase extraction (stages/keyphrase.py): brute-force twin
on the fixture corpus, DuckDB-oracle parity on a synthetic corpus with
planted gaps-and-islands edge cases, and the block-local top-k
invariants (rank order, distinctness, k cap)."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ie_ray.stages.keyphrase import (rake_bruteforce, rake_keyphrases,
                                     rake_oracle_sql, word_scores)

SF = "/root/testdata/sf0.001"


def _rows(ds):
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")
         if b.num_rows], promote_options="default") \
        if ds.count() else None
    if t is None:
        return []
    t = t.sort_by([("doc_id", "ascending"), ("rank", "ascending")])
    return list(zip(t.column("doc_id").to_pylist(),
                    t.column("phrase").to_pylist(),
                    t.column("score_ppm").to_pylist(),
                    t.column("rank").to_pylist()))


PLANTED = [
    (1, "the quick brown fox and a lazy dog"),          # 2 islands
    (2, "quick brown fox quick brown fox"),             # repeated phrase
    (3, "the the and or"),                              # all stopwords
    (4, ""),                                            # empty
    (5, None),                                          # null text
    (6, "UPPER Case MiXeD with the lower case words"),  # ascii-lower
    (7, "tail island with no trailing stopword"),       # tail flush
    (8, "x"),                                           # single token
]


def test_bruteforce_matches_duckdb_on_planted():
    t = pa.table({"doc_id": pa.array([d for d, _ in PLANTED],
                                     type=pa.int64()),
                  "text": pa.array([s for _, s in PLANTED],
                                   type=pa.string())})
    con = duckdb.connect()
    con.register("documents", t)
    want = con.sql(rake_oracle_sql(3)).fetchall()
    got = rake_bruteforce([(d, s) for d, s in PLANTED], 3)
    assert [tuple(r) for r in want] == got


def test_distributed_matches_bruteforce_on_planted(ray_session):
    t = pa.table({"doc_id": pa.array([d for d, _ in PLANTED],
                                     type=pa.int64()),
                  "text": pa.array([s for _, s in PLANTED],
                                   type=pa.string())})
    ds = ray.data.from_arrow(t).repartition(3)
    got = _rows(rake_keyphrases(ds, top_k=3))
    assert got == rake_bruteforce([(d, s) for d, s in PLANTED], 3)


def test_distributed_matches_bruteforce_on_fixture(ray_session):
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"])
    ds = ray.data.from_arrow(docs).repartition(4)
    got = _rows(rake_keyphrases(ds, top_k=3))
    want = rake_bruteforce(list(zip(docs.column("doc_id").to_pylist(),
                                    docs.column("text").to_pylist())), 3)
    assert got == want
    # invariants: ranks 1..k, distinct phrases per doc, scores sorted
    seen = {}
    for doc, phrase, score, rank in got:
        seen.setdefault(doc, []).append((rank, score, phrase))
    for doc, entries in seen.items():
        ranks = [r for r, _, _ in entries]
        assert ranks == list(range(1, len(ranks) + 1))
        assert len({p for _, _, p in entries}) == len(entries)
        scores = [s for _, s, _ in entries]
        assert scores == sorted(scores, reverse=True)


def test_word_scores_deg_over_freq(ray_session):
    # "alpha beta" and "alpha" as phrases: freq(alpha)=2, deg(alpha)=3
    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array(["alpha beta", "the alpha the"],
                                   type=pa.string())})
    s = word_scores(ray.data.from_arrow(t))
    assert s["alpha"] == 3 * 1_000_000 // 2
    assert s["beta"] == 2 * 1_000_000
