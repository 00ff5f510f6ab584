"""Compressibility quality signal: repetitive text scores far lower."""

import pyarrow as pa
import pytest


@pytest.mark.usefixtures("ray_session")
def test_repetitive_docs_compress_more():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "e", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    import os
    import tempfile
    import pyarrow.parquet as pq
    d = tempfile.mkdtemp(prefix="sf_fake_")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(["spam " * 300,
                          "the quick brown fox jumps over lazy dogs and "
                          "every sentence here differs from the previous "
                          "one in vocabulary, order and rhythm entirely"]),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["s", "s"]),
        "n_chars": pa.array([1500, 140], type=pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r["compression_ratio"]
           for r in m.queries()["doc_compression_ratio"](d).take_all()}
    assert got[0] < 0.05          # pure repetition collapses
    assert got[1] > 0.5           # natural-ish text doesn't
    # determinism across runs
    again = {r["doc_id"]: r["compression_ratio"]
             for r in m.queries()["doc_compression_ratio"](d).take_all()}
    assert got == again
