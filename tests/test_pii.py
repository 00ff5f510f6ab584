"""PII scrub: planted-fixture behavior + DuckDB engine equivalence
(the gate corpus has no PII, so this test is the behavioral gate)."""

import duckdb
import pyarrow as pa

from ie_ray.stages.pii import pii_oracle_sql, pii_scrub, scrub_batch

DOCS = [
    (1, "contact john.doe+spam@example.co.uk or call 555-123-4567"),
    (2, "ssn 123-45-6789 leaked from 192.168.0.1 twice 10.0.0.255"),
    (3, "dots phone 555.123.4567 and email a@b.io end"),
    (4, "clean text with no personal data at all"),
    (5, "edge 999-99-9999 999-999-9999 mixed a_b%c@d-e.org"),
]


def _table():
    return pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
        "text": pa.array([t for _, t in DOCS], type=pa.string())})


def test_counts_and_redaction():
    out = scrub_batch(_table()).to_pydict()
    by = {d: i for i, d in enumerate(out["doc_id"])}
    assert out["n_email"][by[1]] == 1 and out["n_phone"][by[1]] == 1
    assert out["n_ssn"][by[2]] == 1 and out["n_ip"][by[2]] == 2
    assert out["n_phone"][by[3]] == 1 and out["n_email"][by[3]] == 1
    assert all(out[k][by[4]] == 0
               for k in ("n_email", "n_ssn", "n_phone", "n_ip"))
    assert out["n_ssn"][by[5]] == 1 and out["n_phone"][by[5]] == 1 \
        and out["n_email"][by[5]] == 1
    assert out["redacted"][by[1]] == "contact <EMAIL> or call <PHONE>"
    assert out["redacted"][by[2]] == "ssn <SSN> leaked from <IP> twice <IP>"
    assert out["redacted"][by[3]] == "dots phone <PHONE> and email <EMAIL> end"
    assert out["redacted"][by[4]] == DOCS[3][1]


def test_duckdb_engine_equivalence():
    con = duckdb.connect()
    con.register("documents", _table())
    want = {r[0]: r[1:] for r in con.execute(
        pii_oracle_sql() +
        " ORDER BY doc_id").fetchall()}
    got = scrub_batch(_table()).to_pydict()
    for i, d in enumerate(got["doc_id"]):
        assert want[d] == (got["n_email"][i], got["n_ssn"][i],
                           got["n_phone"][i], got["n_ip"][i],
                           got["redacted"][i]), d


def test_streaming_shape(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_table()).repartition(3)
    rows = {r["doc_id"]: r["redacted"]
            for r in pii_scrub(ds).take_all()}
    assert rows[2] == "ssn <SSN> leaked from <IP> twice <IP>"
    assert len(rows) == len(DOCS)
