"""Bigram-LM perplexity score (CCNet-style quality filter):
hand-computed golden on a tiny corpus, exact DuckDB-oracle agreement
on a randomized corpus (including multi-block splits, the partial/
combine correctness case), and the <2-token exclusion contract."""

import math

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from ie_ray.stages.retrieval import (bigram_logprob,
                                     bigram_logprob_oracle_sql)


def _run(rows, ray_session, parallelism=4):
    import ray.data
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string())})
    ds = ray.data.from_arrow(t)
    if parallelism > 1:
        ds = ds.repartition(parallelism)
    out = bigram_logprob(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    return out


def _oracle(rows):
    con = duckdb.connect()
    con.register("documents_src", pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string())}))
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    return con.execute(bigram_logprob_oracle_sql()).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)


def test_hand_golden(ray_session):
    # corpus: "a b a b" + "a c"  →  bigrams: ab×2, ba×1, ac×1
    # C1(a)=3, C1(b)=1; V = |{a,b,c}| = 3
    rows = [(0, "a b a b"), (1, "a c")]
    out = _run(rows, ray_session, parallelism=1)
    lp_ab = math.log((2 + 1) / (3 + 3))
    lp_ba = math.log((1 + 1) / (1 + 3))
    lp_ac = math.log((1 + 1) / (3 + 3))
    assert out.doc_id.tolist() == [0, 1]
    assert out.bigram_lp[0] == pytest.approx(
        round(2 * lp_ab + lp_ba, 4), abs=1e-9)
    assert out.bigram_lp[1] == pytest.approx(round(lp_ac, 4), abs=1e-9)


def test_short_docs_excluded(ray_session):
    # docs with <2 tokens have no bigrams — excluded in BOTH engines
    rows = [(0, "solo"), (1, ""), (2, "two words")]
    out = _run(rows, ray_session)
    ora = _oracle(rows)
    assert out.doc_id.tolist() == [2]
    assert ora.doc_id.tolist() == [2]
    assert out.bigram_lp[0] == ora.bigram_lp[0]


def test_oracle_agreement_multiblock(ray_session):
    # randomized corpus across several blocks: Ray may split one doc's
    # tf rows across blocks — the bucketed doc_id combine must total
    # them exactly like the single-engine oracle
    rng = np.random.default_rng(17)
    vocab = "the a cat dog sat mat ran big red on".split()
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(2, 60)))))
            for i in range(120)]
    out = _run(rows, ray_session, parallelism=8)
    ora = _oracle(rows)
    assert len(out) == len(ora) == 120
    assert (out.doc_id.values == ora.doc_id.values).all()
    assert np.abs(out.bigram_lp.values - ora.bigram_lp.values).max() == 0


def test_hashed_variant_determinism_and_rank_agreement(ray_session):
    # big bucket table + tiny vocab → collision-free regime: hashed
    # scores must rank documents exactly like the exact-word variant
    # (values differ only via V = occupied buckets == true vocab here)
    from ie_ray.stages.retrieval import bigram_logprob_hashed
    rng = np.random.default_rng(23)
    vocab = "aa bb cc dd ee ff gg hh".split()
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(2, 40)))))
            for i in range(80)]
    out1 = _run_hashed(rows, ray_session)
    out2 = _run_hashed(rows, ray_session)
    assert (out1.bigram_lp.values == out2.bigram_lp.values).all()

    exact = _run(rows, ray_session)
    m = exact.merge(out1, on="doc_id", suffixes=("_e", "_h"))
    assert len(m) == 80
    re_ = m.bigram_lp_e.rank(method="first")
    rh = m.bigram_lp_h.rank(method="first")
    # Spearman via rank-then-Pearson (no scipy in this sandbox)
    rho = np.corrcoef(re_.values, rh.values)[0, 1]
    assert rho > 0.99, rho


def test_hashed_excludes_short_docs(ray_session):
    rows = [(0, "solo"), (1, ""), (2, "two words again here")]
    out = _run_hashed(rows, ray_session)
    assert out.doc_id.tolist() == [2]


def _run_hashed(rows, ray_session):
    import ray.data
    from ie_ray.stages.retrieval import bigram_logprob_hashed
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string())})
    ds = ray.data.from_arrow(t).repartition(4)
    return bigram_logprob_hashed(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def test_join_path_matches_oracle(ray_session):
    # force the large-vocab hash-join path (broadcast_vocab_max=0):
    # the bigram vocabulary must never reach the driver and the scores
    # must still match DuckDB exactly
    import ray.data
    rng = np.random.default_rng(31)
    vocab = "the a cat dog sat mat ran big red on".split()
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(2, 50)))))
            for i in range(90)]
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string())})
    ds = ray.data.from_arrow(t).repartition(6)
    out = bigram_logprob(ds, broadcast_vocab_max=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ora = _oracle(rows)
    assert len(out) == len(ora) == 90
    assert np.abs(out.bigram_lp.values - ora.bigram_lp.values).max() == 0


def test_null_text_matches_oracle(ray_session):
    """NULL text must contribute NOTHING (no tokens, no vocab entry) —
    fill_null('') used to add an empty-string token to V that the
    oracle's unnest(string_split(NULL,' ')) does not produce, shifting
    every document's score (code-review finding, round 5)."""
    import duckdb
    rows_t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["a b a b", "a c", None], type=pa.string())})
    import ray.data
    out = bigram_logprob(ray.data.from_arrow(rows_t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents_src", rows_t)
    con.execute("CREATE VIEW documents AS SELECT * FROM documents_src")
    ora = con.execute(bigram_logprob_oracle_sql()).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.doc_id.tolist() == ora.doc_id.tolist() == [0, 1]
    assert (out.bigram_lp.values == ora.bigram_lp.values).all()
    # the hashed variant excludes the NULL doc and its vocab bucket too
    from ie_ray.stages.retrieval import bigram_logprob_hashed
    hh = bigram_logprob_hashed(
        ray.data.from_arrow(rows_t)).to_pandas()
    assert sorted(hh.doc_id.tolist()) == [0, 1]
