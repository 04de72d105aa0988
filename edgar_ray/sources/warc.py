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
import ray

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


def record_bytes(url: str, html: bytes, date: str,
                 gzip_record: bool = False) -> bytes:
    """One minimal WARC response record (.gz = one gzip member per record,
    the CC segment convention)."""
    http = (b"HTTP/1.1 200 OK\r\nContent-Length: "
            + str(len(html)).encode() + b"\r\n\r\n" + html)
    hdr = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: " + url.encode() + b"\r\n"
           b"WARC-Date: " + date.encode() + b"\r\n"
           b"Content-Type: application/http;msgtype=response\r\n"
           b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n")
    rec = hdr + http + b"\r\n\r\n"
    if gzip_record:
        comp = zlib.compressobj(9, zlib.DEFLATED, 31)
        rec = comp.compress(rec) + comp.flush()
    return rec


def _row_date(tbl: pa.Table, i: int, ts_default: str) -> str:
    if "warc_ts" in tbl.column_names and tbl["warc_ts"][i].is_valid:
        return tbl["warc_ts"][i].as_py().strftime("%Y-%m-%dT%H:%M:%SZ")
    return ts_default


def write_warc_segments(pages_ds, out_dir: str,
                        num_segments: int | None = 16,
                        gzip_records: bool = True,
                        target_segment_bytes: int = 1 << 30,
                        ts_default: str = "2024-01-01T00:00:00Z") -> pa.Table:
    """DISTRIBUTED re-segmenter: pages Dataset (url, html[, warc_ts]) ->
    ``num_segments`` ``.warc.gz`` files under ``out_dir``.

    Deterministic assignment via the two-pass block prefix-scan (the
    pack_shards pattern, pipelines/sampling.py): pass 1 collects per-block
    row counts (tiny metadata — the driver never sees page bytes), an
    exclusive scan gives every row its global input index, and segment =
    ``global_idx * num_segments // total`` — contiguous, row-balanced
    ranges, stable under any block arrival order. Pass 2 stamps blocks in
    parallel; one ``groupby(segment).map_groups`` task then streams each
    segment's records (input order restored by the global index) to its
    file. RESUMABLE: a segment whose final file already exists is skipped
    (files publish via tempfile + atomic rename, so a crash mid-write
    never leaves a readable partial file). Size ``num_segments`` so one
    segment ~1 GB (the CC convention) — the segment is the unit of read
    parallelism for :func:`read_warc`. ``out_dir`` must be shared storage
    on a multi-node cluster (each writer task opens it directly).

    ``num_segments=None`` auto-sizes from the same pass-1 metadata: one
    segment per ``target_segment_bytes`` of raw page payload (the CC
    ~1 GB convention; compression ratio is payload-dependent, so the
    target is pre-gzip bytes).

    Returns a manifest table (segment, n_records, path)."""
    import os
    import tempfile

    import numpy as np
    import ray
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    refs = pages_ds.to_arrow_refs()
    meta = ray.get([_block_meta.remote(r) for r in refs])
    nrows = [n for n, _ in meta]
    total = int(sum(nrows))
    if num_segments is None:
        total_bytes = int(sum(b for _, b in meta))
        num_segments = max(1, -(-total_bytes // target_segment_bytes))
    if total == 0:
        return pa.table({"segment": pa.array([], pa.int32()),
                         "n_records": pa.array([], pa.int64()),
                         "path": pa.array([], pa.string())})
    offsets = np.r_[0, np.cumsum(nrows)[:-1]]
    stamped = rd.from_arrow_refs(
        [_stamp_segment.remote(r, int(off), total, num_segments)
         for r, off in zip(refs, offsets)])

    def write_seg(t: pa.Table) -> pa.Table:
        seg = int(t["_seg"][0].as_py())
        path = os.path.join(out_dir, f"part-{seg:05d}.warc"
                            + (".gz" if gzip_records else ""))
        if os.path.exists(path):  # resumable: finished segment skips
            return pa.table({"segment": pa.array([seg], pa.int32()),
                             "n_records": pa.array([t.num_rows], pa.int64()),
                             "path": pa.array([path], pa.string())})
        t = t.sort_by("_gidx")  # input order within the segment
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".warc.tmp")
        with os.fdopen(fd, "wb") as f:
            for i in range(t.num_rows):
                html = t["html"][i].as_py()
                if isinstance(html, str):
                    html = html.encode()
                f.write(record_bytes(t["url"][i].as_py(), html,
                                     _row_date(t, i, ts_default),
                                     gzip_record=gzip_records))
        os.replace(tmp, path)
        return pa.table({"segment": pa.array([seg], pa.int32()),
                         "n_records": pa.array([t.num_rows], pa.int64()),
                         "path": pa.array([path], pa.string())})

    manifest = (stamped.groupby("_seg")
                .map_groups(write_seg, batch_format="pyarrow"))
    tbl = pa.concat_tables(
        [b for b in ray.get(manifest.to_arrow_refs()) if b.num_rows])
    return tbl.sort_by("segment")


@ray.remote
def _block_meta(t: pa.Table) -> tuple[int, int]:
    """(rows, raw html payload bytes) — pass-1 metadata for segment count
    and the prefix scan."""
    nbytes = 0
    if t.num_rows and "html" in t.column_names:
        col = t["html"].combine_chunks() if isinstance(
            t["html"], pa.ChunkedArray) else t["html"]
        nbytes = col.nbytes
    return t.num_rows, int(nbytes)


@ray.remote
def _stamp_segment(t: pa.Table, offset: int, total: int,
                   num_segments: int) -> pa.Table:
    import numpy as np

    gidx = np.arange(offset, offset + t.num_rows, dtype=np.int64)
    seg = (gidx * num_segments // total).astype(np.int32)
    return (t.append_column("_gidx", pa.array(gidx, pa.int64()))
            .append_column("_seg", pa.array(seg, pa.int32())))


def write_warc(pages: pa.Table, path: str, gzip_records: bool = False,
               ts_default: str = "2024-01-01T00:00:00Z") -> str:
    """pages table (url, html[, warc_ts]) -> one minimal WARC file
    (``.gz`` = one gzip member per record, the CC segment convention)."""
    recs: list[bytes] = []
    for i in range(pages.num_rows):
        html = pages["html"][i].as_py()
        if isinstance(html, str):
            html = html.encode()
        recs.append(record_bytes(pages["url"][i].as_py(), html,
                                 _row_date(pages, i, ts_default),
                                 gzip_record=gzip_records))
    with open(path, "wb") as f:
        f.write(b"".join(recs))
    return path


# ---------------------------------------------------------------------------
# WET (extracted-text sibling of WARC): Common Crawl ships *.warc.wet.gz
# segments of `WARC-Type: conversion` records whose payload is the page's
# extracted PLAIN TEXT (no HTTP wrapper). Same container grammar, so the
# reader reuses the record walker.
# ---------------------------------------------------------------------------


def parse_wet(blob: bytes) -> list[tuple[str, str]]:
    """WET bytes -> [(url, text)] for conversion records (gzip-multi-member
    aware, truncation-tolerant — same walker contract as parse_warc)."""
    if blob[:2] == b"\x1f\x8b":
        blob = gunzip_members(blob)
    out: list[tuple[str, str]] = []
    pos = 0
    n = len(blob)
    while pos < n:
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
            break
        payload = blob[hdr_end + 4: hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type") == "conversion":
            out.append((headers.get("warc-target-uri", ""),
                        payload.decode("utf-8", "replace")))
    return out


def _wet_batch_to_docs(t: pa.Table) -> pa.Table:
    urls: list[str] = []
    texts: list[str] = []
    for blob in t["bytes"].to_pylist():
        for url, text in parse_wet(blob):
            urls.append(url)
            texts.append(text)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "text": pa.array(texts, pa.string())})


def read_wet(paths):
    """WET file(s)/dir -> Dataset(url, text). One task per segment file
    (the CC unit of work), exactly like read_warc."""
    import ray.data as rd

    return rd.read_binary_files(paths).map_batches(
        _wet_batch_to_docs, batch_format="pyarrow", batch_size=1)


def wet_record_bytes(url: str, text: str, date: str,
                     gzip_record: bool = False) -> bytes:
    payload = text.encode("utf-8")
    hdr = (b"WARC/1.0\r\n"
           b"WARC-Type: conversion\r\n"
           b"WARC-Target-URI: " + url.encode() + b"\r\n"
           b"WARC-Date: " + date.encode() + b"\r\n"
           b"Content-Type: text/plain\r\n"
           b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n")
    rec = hdr + payload + b"\r\n\r\n"
    if gzip_record:
        comp = zlib.compressobj(9, zlib.DEFLATED, 31)
        rec = comp.compress(rec) + comp.flush()
    return rec


def write_wet(docs: pa.Table, path: str, gzip_records: bool = False,
              ts_default: str = "2024-01-01T00:00:00Z") -> str:
    """docs table (url, text) -> one minimal WET file (writer for tests
    and text-only re-sharding pipelines)."""
    recs = [wet_record_bytes(docs["url"][i].as_py(),
                             docs["text"][i].as_py() or "",
                             _row_date(docs, i, ts_default),
                             gzip_record=gzip_records)
            for i in range(docs.num_rows)]
    with open(path, "wb") as f:
        f.write(b"".join(recs))
    return path
