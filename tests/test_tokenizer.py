"""BPE pair-count kernel vs DuckDB oracle on a planted corpus."""

import duckdb
import pyarrow as pa
import pytest

from ie_ray.stages.tokenizer import bpe_pairs_oracle_sql, bpe_top_pairs

DOCS = pa.table({
    "doc_id": pa.array([0, 1, 2], type=pa.int64()),
    "text": pa.array(["low lower lowest", "new newer newest", "low new aa"]),
})


@pytest.mark.usefixtures("ray_session")
def test_bpe_pairs_match_duckdb():
    import ray.data
    got = [(r["pair"], r["n"])
           for r in bpe_top_pairs(ray.data.from_arrow(DOCS), k=10)
           .take_all()]
    con = duckdb.connect()
    con.register("documents", DOCS)
    want = con.sql(bpe_pairs_oracle_sql(10)).fetchall()
    assert got == want
    # 'lo'/'ow' appear in low, lower, lowest, low → 4 each
    assert ("lo", 4) in got and ("ow", 4) in got
