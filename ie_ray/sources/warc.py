"""WARC (ISO 28500) source for Common-Crawl-style page archives.

The engine's page tables (``url, warc_ts, html, text, lang`` — the
BASELINE input_hint schema) arrive as Parquet in every fixture, but the
archives the north-star workload actually crawls from ship as WARC:
gzip-multistream files of ``WARC/1.0`` records, one HTTP response per
record (Common Crawl's layout — each record its own gzip member so
readers can split files without decompressing them end to end).  This
module reads that container into the SAME Arrow schema the Parquet path
produces, so ``pipelines.kg.kg_triples(..., pages_ds=read_warc(paths))``
is a drop-in swap (parity target: the reference ingests pages via its
RSS/article reader, ``ie/core/aws/__init__.py`` — the WARC reader is the
web-archive equivalent of that S1 source).

Scale shape: files are the parallelism unit (``ray.data.
read_binary_files`` → one parse task per file; a 100 TB crawl is ~10^5
files, far more than any cluster's slots).  Parsing is a single forward
scan per file — header block, ``Content-Length`` body skip, record
separator — no regex over the payload, no full-text decode.  The writer
(`build_warc`) exists for fixtures and tests: it emits spec-valid
records (warcinfo + response with an HTTP/1.1 envelope), optionally one
gzip member per record exactly like Common Crawl.

Malformed input is quarantined, not fatal: a record with a bad header
block or a truncated body ends that FILE's parse (a forward scan cannot
resynchronize reliably mid-stream) but keeps every record already
parsed, and the drop is surfaced in the ``warc_truncated`` counter
column rather than silently swallowed.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator, List, Optional, Tuple

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


def _parse_warc_date(s: str) -> int:
    """ISO-8601 WARC-Date → epoch microseconds.  WARC 1.0 mandates
    second granularity; 1.1 allows fractional seconds — both accepted."""
    import datetime as dt
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    d = dt.datetime.fromisoformat(s)
    if d.tzinfo is None:
        d = d.replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp() * 1_000_000)


def _format_warc_date(epoch_us: int) -> str:
    import datetime as dt
    d = dt.datetime.fromtimestamp(epoch_us / 1_000_000, tz=dt.timezone.utc)
    if epoch_us % 1_000_000:
        return d.strftime("%Y-%m-%dT%H:%M:%S.%fZ")
    return d.strftime("%Y-%m-%dT%H:%M:%SZ")


def _gunzip_multistream(data: bytes) -> Tuple[bytes, int]:
    """Decompress concatenated gzip members (Common Crawl's per-record
    layout) into one byte stream.  At real scale the member boundaries
    are the split points (each member is a whole record); inside one
    read task sequential decompression is the correct, bounded shape —
    the task already owns the whole file.

    Returns ``(bytes, bad)``: ``bad=1`` when a member is corrupt
    (``zlib.error``) or the final member is truncated mid-stream
    (``eof`` never reached) — the decompressed prefix is kept and the
    caller marks the file quarantined instead of the Ray task dying on
    an uncaught codec exception."""
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            out.write(d.decompress(data[pos:]))
            out.write(d.flush())
        except zlib.error:
            return out.getvalue(), 1
        if not d.eof:  # truncated final member — an incomplete upload
            return out.getvalue(), 1
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # trailing garbage — stop rather than spin
            return out.getvalue(), 1
        pos += consumed
    return out.getvalue(), 0


def parse_warc(data: bytes) -> Tuple[List[dict], int]:
    """Parse WARC bytes (plain or gzip-multistream) into response-record
    dicts ``{url, warc_ts, html, lang}``.  Returns ``(rows, truncated)``
    where ``truncated`` is 1 if the scan hit a malformed/truncated
    record and stopped early (rows before it are kept), else 0.

    Non-response records (warcinfo, request, metadata, …) are skipped —
    they are bookkeeping, not pages.  The HTTP envelope of a response
    record is split off at its first blank line; ``Content-Language``
    (when the server sent one) populates ``lang`` so the language filter
    downstream keeps working, else ``lang`` is ''.
    """
    gz_bad = 0
    if data[:2] == b"\x1f\x8b":
        data, gz_bad = _gunzip_multistream(data)
    rows: List[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate extra blank lines between records
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            return rows, 1
        head_end = data.find(_SEP, pos)
        if head_end < 0:
            return rows, 1
        headers = {}
        for line in data[pos:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers[b"content-length"])
        except (KeyError, ValueError):
            return rows, 1
        body_start = head_end + len(_SEP)
        body_end = body_start + length
        if body_end > n:
            return rows, 1
        body = data[body_start:body_end]
        pos = body_end
        if headers.get(b"warc-type") == b"response":
            html = body
            lang = ""
            if body.startswith(b"HTTP/"):
                http_end = body.find(_SEP)
                if http_end >= 0:
                    for line in body[:http_end].split(_CRLF)[1:]:
                        k, _, v = line.partition(b":")
                        if k.strip().lower() == b"content-language":
                            lang = v.strip().decode("ascii", "replace")
                    html = body[http_end + len(_SEP):]
            uri = headers.get(b"warc-target-uri", b"").decode(
                "utf-8", "replace")
            # WARC 1.1 allows <...> bracketing of the URI
            if uri.startswith("<") and uri.endswith(">"):
                uri = uri[1:-1]
            try:
                ts = _parse_warc_date(
                    headers.get(b"warc-date", b"").decode("ascii"))
            except ValueError:
                return rows, 1
            rows.append({"url": uri, "warc_ts": ts, "html": html,
                         "lang": lang})
    return rows, gz_bad


def read_warc(paths, override_num_blocks: Optional[int] = None):
    """Read WARC file(s) into a Dataset with the pages-table schema
    (``url:string, warc_ts:timestamp[us], html:binary, text:string,
    lang:string`` — text is '' here: WARC carries raw HTML, extraction
    happens downstream exactly as on the Parquet path).  A
    ``warc_truncated`` int64 column carries the per-file malformed-tail
    counter so callers can alert on quarantined input instead of
    discovering silent row loss.  A file that yields ZERO parseable
    records while flagged bad still leaves a trace: one marker row with
    empty url/html/lang and ``warc_truncated=1`` (empty ``lang`` means
    the language filter drops it before any downstream stage, so the
    marker can't contaminate a pipeline that ignores the counter).
    Limit: a gzip-multistream cut exactly ON a member boundary is
    indistinguishable from a legitimately shorter file — real crawls
    pair archives with record-count indexes for that case."""
    import pyarrow as pa
    import ray.data

    files = ray.data.read_binary_files(
        paths, include_paths=True,
        override_num_blocks=override_num_blocks)

    def to_pages(b: pa.Table) -> pa.Table:
        urls: List[str] = []
        tss: List[int] = []
        htmls: List[bytes] = []
        langs: List[str] = []
        trunc: List[int] = []
        for blob in b.column("bytes").to_pylist():
            rows, t = parse_warc(blob)
            if not rows and t:  # total loss — leave the marker row
                rows = [{"url": "", "warc_ts": 0, "html": b"",
                         "lang": ""}]
            for r in rows:
                urls.append(r["url"])
                tss.append(r["warc_ts"])
                htmls.append(r["html"])
                langs.append(r["lang"])
                trunc.append(t)
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array([""] * len(urls), type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "warc_truncated": pa.array(trunc, type=pa.int64())})

    return files.map_batches(to_pages, batch_format="pyarrow")


def build_warc(rows: Iterator[dict], gzip_per_record: bool = False,
               warcinfo: bool = True) -> bytes:
    """Serialize page rows (``url``, ``warc_ts`` epoch-us int,
    ``html`` bytes, optional ``lang``) as a WARC/1.0 byte stream:
    one response record per page wrapped in a minimal HTTP/1.1
    envelope.  ``gzip_per_record=True`` emits one gzip member per
    record — Common Crawl's splittable layout."""
    import gzip as _gzip
    import uuid as _uuid

    def rec_id(seed: str) -> bytes:
        # mandatory per ISO 28500 §5.2; deterministic (content-derived)
        # so fixtures stay byte-stable across runs
        return ("<urn:uuid:%s>" % _uuid.uuid5(
            _uuid.NAMESPACE_URL, seed)).encode("ascii")

    def record(rtype: bytes, heads: List[Tuple[bytes, bytes]],
               body: bytes) -> bytes:
        lines = [b"WARC/1.0", b"WARC-Type: " + rtype]
        lines += [k + b": " + v for k, v in heads]
        lines.append(b"Content-Length: " + str(len(body)).encode())
        return _CRLF.join(lines) + _SEP + body + _SEP

    out: List[bytes] = []
    if warcinfo:
        info = b"software: ie_ray.sources.warc\r\nformat: WARC File Format 1.0\r\n"
        out.append(record(b"warcinfo", [
            (b"WARC-Record-ID", rec_id("warcinfo")),
            (b"WARC-Date", b"2017-01-01T00:00:00Z"),
            (b"Content-Type", b"application/warc-fields")], info))
    for r in rows:
        html = r["html"]
        if isinstance(html, str):
            html = html.encode("utf-8")
        http = [b"HTTP/1.1 200 OK",
                b"Content-Type: text/html; charset=utf-8",
                b"Content-Length: " + str(len(html)).encode()]
        lang = r.get("lang") or ""
        if lang:
            http.append(b"Content-Language: " + lang.encode("ascii"))
        body = _CRLF.join(http) + _SEP + html
        out.append(record(b"response", [
            (b"WARC-Record-ID",
             rec_id("%s|%d" % (r["url"], int(r["warc_ts"])))),
            (b"WARC-Target-URI", r["url"].encode("utf-8")),
            (b"WARC-Date",
             _format_warc_date(int(r["warc_ts"])).encode("ascii")),
            (b"Content-Type", b"application/http; msgtype=response")],
            body))
    if gzip_per_record:
        return b"".join(_gzip.compress(rec, mtime=0) for rec in out)
    return b"".join(out)


def write_warc_fixture(out_path: str, n_pages: int = 60,
                       gzip_per_record: bool = True,
                       shards: int = 1,
                       pool_size: Optional[int] = None) -> List[str]:
    """Deterministic WARC fixture from the synthetic page corpus (same
    generator as the Parquet pages table, so cross-format identity is
    checkable row for row; pass ``pool_size=1200`` to mirror
    ``pipelines.kg.default_fixture_dir`` exactly)."""
    import os
    from .pages import golden_sentences, synthesize_pages

    pool = golden_sentences(pool_size if pool_size is not None
                            else min(1200, max(200, n_pages)))
    rows = synthesize_pages(n_pages, pool)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    paths = []
    per = (len(rows) + shards - 1) // shards
    for s in range(shards):
        part = rows[s * per:(s + 1) * per]
        if not part:
            break
        p = out_path if shards == 1 else \
            out_path.replace(".warc", "-%03d.warc" % s)
        with open(p, "wb") as f:
            f.write(build_warc(part, gzip_per_record=gzip_per_record))
        paths.append(p)
    return paths
