"""WARC source: read Common-Crawl-style WARC files into the ``pages`` table
shape (url, warc_ts, html) as a Ray Data pipeline.

WHY: the input contract is a Common-Crawl-style pages table; CC itself ships
WARC (ISO 28500) — ~1 GB ``.warc.gz`` segments of ``WARC/1.0`` records, each
``response`` record wrapping an HTTP response. This module is the ingest
edge: one Ray task per WARC file (exactly the parallelism CC's segmenting is
designed for — at 100 TB the unit of work is the segment file, and
``read_binary_files`` streams file contents through the object store without
driver assembly), a pure-Python record walk per file, Arrow batches out.

Format notes (public spec, minimal subset):
- record = header block (``WARC/1.0`` + ``Name: value`` lines, CRLF) +
  CRLF CRLF + ``Content-Length`` payload bytes + CRLF CRLF;
- ``WARC-Type: response`` payload = HTTP response (status + headers +
  CRLF CRLF + body); the page bytes are the HTTP body;
- ``.warc.gz`` files are MULTI-MEMBER gzip (one member per record is the CC
  convention) — ``gzip.decompress`` reads only the first member, so the
  gunzip loop below walks members with ``zlib.decompressobj(wbits=31)``.

The writer exists for tests and for re-sharding pipelines (pages table ->
WARC segments); it emits the same minimal subset it reads.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b"\r\n"


def gunzip_members(data: bytes) -> bytes:
    """Decompress ALL members of a (possibly multi-member) gzip blob."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def parse_warc(blob: bytes) -> list[tuple[str, str, bytes]]:
    """WARC bytes -> [(url, warc_date, html_body)] for response records.

    Tolerant walker: non-response records (warcinfo, request, metadata) are
    skipped by type; malformed trailing bytes terminate the walk instead of
    raising (a truncated segment yields its complete prefix records)."""
    if blob[:2] == b"\x1f\x8b":
        blob = gunzip_members(blob)
    out: list[tuple[str, str, bytes]] = []
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and blob[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = blob.find(_CRLF + _CRLF, pos)
        if hdr_end < 0 or not blob.startswith(b"WARC/", pos):
            break
        headers: dict[str, str] = {}
        for line in blob[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("latin-1").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        if hdr_end + 4 + length > n:
            break  # truncated final record: keep the complete prefix only
        payload = blob[hdr_end + 4: hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type") == "response":
            url = headers.get("warc-target-uri", "")
            date = headers.get("warc-date", "")
            body = payload
            if payload[:5] == b"HTTP/":
                http_end = payload.find(_CRLF + _CRLF)
                body = payload[http_end + 4:] if http_end >= 0 else b""
            out.append((url, date, body))
    return out


def _warc_batch_to_pages(t: pa.Table) -> pa.Table:
    urls: list[str] = []
    ts: list = []
    htmls: list[bytes] = []
    for blob in t["bytes"].to_pylist():
        for url, date, body in parse_warc(blob):
            urls.append(url)
            try:
                dt = datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ").replace(
                    tzinfo=timezone.utc)
                ts.append(int(dt.timestamp() * 1_000_000))
            except ValueError:
                ts.append(0)
            htmls.append(body)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
    })


def read_warc(paths):
    """WARC file(s)/dir -> Dataset(url, warc_ts, html) — the ``pages`` table
    shape minus the derived text/lang columns. One task per file."""
    import ray.data as rd

    return rd.read_binary_files(paths).map_batches(
        _warc_batch_to_pages, batch_format="pyarrow", batch_size=1)


def write_warc(pages: pa.Table, path: str, gzip_records: bool = False,
               ts_default: str = "2024-01-01T00:00:00Z") -> str:
    """pages table (url, html[, warc_ts]) -> one minimal WARC file
    (``.gz`` = one gzip member per record, the CC segment convention)."""
    recs: list[bytes] = []
    has_ts = "warc_ts" in pages.column_names
    for i in range(pages.num_rows):
        url = pages["url"][i].as_py()
        html = pages["html"][i].as_py()
        if isinstance(html, str):
            html = html.encode()
        if has_ts and pages["warc_ts"][i].is_valid:
            dt = pages["warc_ts"][i].as_py()
            date = dt.strftime("%Y-%m-%dT%H:%M:%SZ")
        else:
            date = ts_default
        http = (b"HTTP/1.1 200 OK\r\nContent-Length: "
                + str(len(html)).encode() + b"\r\n\r\n" + html)
        hdr = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Target-URI: " + url.encode() + b"\r\n"
               b"WARC-Date: " + date.encode() + b"\r\n"
               b"Content-Type: application/http;msgtype=response\r\n"
               b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n")
        rec = hdr + http + b"\r\n\r\n"
        if gzip_records:
            comp = zlib.compressobj(9, zlib.DEFLATED, 31)
            rec = comp.compress(rec) + comp.flush()
        recs.append(rec)
    with open(path, "wb") as f:
        f.write(b"".join(recs))
    return path
