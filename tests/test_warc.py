"""WARC source (sources/warc.py): writer↔parser round-trip on the
synthetic page corpus (plain + Common-Crawl gzip-per-record layout),
malformed-input quarantine, and the cross-format drop-in guarantee —
read_warc produces the same rows and the same extracted text as the
Parquet pages path."""

import os

import pyarrow as pa
import pytest

from ie_ray.sources.pages import golden_sentences, synthesize_pages
from ie_ray.sources.warc import (build_warc, parse_warc, read_warc,
                                 write_warc_fixture, _parse_warc_date)


@pytest.fixture(scope="module")
def pages():
    pool = golden_sentences(200)
    return synthesize_pages(30, pool)


def _assert_rows_match(rows, pages):
    assert len(rows) == len(pages)
    for got, want in zip(rows, pages):
        assert got["url"] == want["url"]
        assert got["warc_ts"] == want["warc_ts"]
        assert got["html"] == want["html"]  # byte identity
        assert got["lang"] == want["lang"]


def test_roundtrip_plain(pages):
    rows, trunc = parse_warc(build_warc(pages))
    assert trunc == 0
    _assert_rows_match(rows, pages)


def test_roundtrip_gzip_multistream(pages):
    data = build_warc(pages, gzip_per_record=True)
    assert data[:2] == b"\x1f\x8b"
    rows, trunc = parse_warc(data)
    assert trunc == 0
    _assert_rows_match(rows, pages)


def test_non_response_records_skipped(pages):
    # warcinfo is already emitted by build_warc; add a request record too
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: https://example.com/\r\n"
           b"WARC-Date: 2017-01-01T00:00:00Z\r\n"
           b"Content-Length: 4\r\n\r\nGET /\r\n\r\n")
    # fix the length: body is "GET /" = 5 bytes
    req = req.replace(b"Content-Length: 4", b"Content-Length: 5")
    rows, trunc = parse_warc(build_warc(pages[:3]) + req)
    assert trunc == 0
    assert len(rows) == 3


def test_truncated_record_quarantined(pages):
    data = build_warc(pages[:5])
    rows, trunc = parse_warc(data[:len(data) - 40])  # cut mid-record
    assert trunc == 1
    assert len(rows) == 4  # records before the cut survive


def test_bad_content_length_quarantined():
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://x/\r\n"
           b"WARC-Date: 2017-01-01T00:00:00Z\r\n"
           b"Content-Length: banana\r\n\r\n")
    rows, trunc = parse_warc(bad)
    assert (rows, trunc) == ([], 1)


def test_corrupt_gzip_member_quarantined_not_fatal(pages):
    """A flipped byte inside one member must degrade to (prefix rows,
    trunc=1), never an uncaught zlib.error killing the read task."""
    import gzip
    recs = [build_warc([p], gzip_per_record=False, warcinfo=False)
            for p in pages[:5]]
    members = [gzip.compress(r, mtime=0) for r in recs]
    data = bytearray(b"".join(members))
    # corrupt a byte well inside the 4th member's deflate stream
    off = sum(len(m) for m in members[:3]) + len(members[3]) // 2
    data[off] ^= 0xFF
    rows, trunc = parse_warc(bytes(data))
    assert trunc == 1
    assert [r["url"] for r in rows] == [p["url"] for p in pages[:3]]


def test_truncated_gzip_sweep_never_silent(pages):
    """Cutting the archive at ANY byte offset either keeps every record
    (cut exactly on a member boundary — indistinguishable from a
    shorter file by design) or reports trunc=1.  Row loss with trunc=0
    must be impossible."""
    import gzip
    recs = [build_warc([p], gzip_per_record=False, warcinfo=False)
            for p in pages[:5]]
    members = [gzip.compress(r, mtime=0) for r in recs]
    data = b"".join(members)
    boundaries = set()
    acc = 0
    for m in members:
        acc += len(m)
        boundaries.add(acc)
    full = len(pages[:5])
    for cut in range(1, len(data), 7):
        rows, trunc = parse_warc(data[:cut])
        if trunc == 0:
            assert cut in boundaries, cut
            assert len(rows) == sorted(boundaries).index(cut) + 1
        else:
            assert len(rows) <= full


def test_total_loss_file_leaves_marker_row(ray_session, tmp_path):
    """A file yielding zero parseable records still surfaces one
    warc_truncated=1 marker row (empty lang — the language filter drops
    it downstream), so complete loss of a file is never invisible."""
    bad = tmp_path / "bad.warc"
    bad.write_bytes(b"this is not a WARC file at all")
    got = read_warc([str(bad)]).take_all()
    assert len(got) == 1
    assert got[0]["warc_truncated"] == 1
    assert got[0]["url"] == "" and got[0]["lang"] == ""


def test_records_carry_mandatory_record_id(pages):
    data = build_warc(pages[:2])
    assert data.count(b"WARC-Record-ID: <urn:uuid:") == 3  # warcinfo + 2
    # deterministic: same rows → byte-identical archive
    assert data == build_warc(pages[:2])


def test_warc_date_variants():
    assert _parse_warc_date("2017-01-09T22:13:20Z") == 1484000000_000000
    # WARC 1.1 fractional seconds survive at us granularity
    assert _parse_warc_date("2017-01-09T22:13:20.250000Z") \
        == 1484000000_250000


def test_bracketed_uri_accepted(pages):
    data = build_warc(pages[:1]).replace(
        b"WARC-Target-URI: " + pages[0]["url"].encode(),
        b"WARC-Target-URI: <" + pages[0]["url"].encode() + b">")
    rows, trunc = parse_warc(data)
    assert trunc == 0
    assert rows[0]["url"] == pages[0]["url"]


def test_read_warc_dataset_matches_parquet_schema(ray_session, pages,
                                                  tmp_path):
    paths = write_warc_fixture(str(tmp_path / "pages.warc.gz"),
                               n_pages=30, gzip_per_record=True, shards=3)
    assert len(paths) == 3
    ds = read_warc(paths)
    got = sorted(ds.take_all(), key=lambda r: r["url"])
    want = sorted(pages, key=lambda r: r["url"])
    assert [r["url"] for r in got] == [r["url"] for r in want]
    assert [r["html"] for r in got] == [r["html"] for r in want]
    assert [r["lang"] for r in got] == [r["lang"] for r in want]
    assert all(r["warc_truncated"] == 0 for r in got)
    ts = pa.array([r["warc_ts"] for r in got])
    assert pa.types.is_timestamp(ts.type)


def test_flagship_triples_identical_across_containers(ray_session):
    """End-to-end drop-in: the SAME corpus through WARC ingestion and
    through Parquet ingestion yields the identical triple set."""
    import __ray_entry__ as e
    qs = e.queries()

    def key(r):
        return tuple("" if v is None else str(v) for v in
                     (r["url"], r.get("sent_idx"), r["subj"], r["pred"],
                      r["obj"], r["kind"]))

    a = sorted(map(key, qs["kg_triples_warc"]("sf0.001").take_all()))
    b = sorted(map(key, qs["kg_triples"]("sf0.001").take_all()))
    assert len(a) > 400
    assert a == b


def test_warc_pages_extract_byte_identity(ray_session, pages, tmp_path):
    """The S2 invariant holds across the container swap: HTML→text
    extraction over WARC-read pages equals the corpus's own text."""
    from ie_ray.stages.extract import extract_text_batch
    paths = write_warc_fixture(str(tmp_path / "p.warc.gz"), n_pages=20)
    ds = read_warc(paths).map_batches(extract_text_batch,
                                      batch_format="pyarrow")
    got = {r["url"]: r["text"] for r in ds.take_all()}
    want = {p["url"]: p["text"] for p in synthesize_pages(
        20, golden_sentences(200))}
    assert got == want
