"""URL canonicalization for the seen-set key.

The reference dedups on raw map keys (date strings / doc types); the frontier
needs a canonical URL key (north rule): lowercase scheme+host, strip fragments
and default ports, keep query (EDGAR URLs are query-significant), strip
trailing ``&`` and sort nothing (EDGAR param order is stable and meaningful to
the reference's Sscanf parse, /root/reference/parser.go:17-24).
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit, urlunsplit


def canonicalize(url: str) -> str:
    parts = urlsplit(url.strip())
    scheme = (parts.scheme or "https").lower()
    host = parts.netloc.lower()
    if host.endswith(":80") and scheme == "http":
        host = host[:-3]
    if host.endswith(":443") and scheme == "https":
        host = host[:-4]
    path = parts.path or "/"
    query = parts.query.rstrip("&")
    return urlunsplit((scheme, host, path, query, ""))


def url_sha1(url: str) -> bytes:
    return hashlib.sha1(canonicalize(url).encode()).digest()


def parse_cik_and_doc_id(url: str) -> tuple[str, str]:
    """Viewer URL -> (cik, zero-padded 18-digit accession id) — the
    reference's Sscanf parse (P12, /root/reference/parser.go:17-24): the
    canonical identity key of a filing URL, used by the seen-set and
    checkpoint partitioning. Returns ("", "") when the URL is not a viewer
    link."""
    from urllib.parse import parse_qs, urlsplit

    q = parse_qs(urlsplit(url).query)
    cik = q.get("cik", [""])[0]
    acc = q.get("accession_number", [""])[0]
    if not cik or not acc:
        return "", ""
    return cik, acc.replace("-", "").zfill(18)
