"""URL canonicalization — the web-curation front door.

Collapses the URL variants that point at one resource before any
by-URL dedup or domain-level statistics (the first grouping key of a
CommonCrawl-style pipeline; the reference's readers assume file paths,
`DirectoryDatasetReader.java:86-89` — the web analogue is this):

- scheme and host lowercased;
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment stripped;
- tracking query parameters dropped (``utm_*``, ``gclid``, ``fbclid``,
  ``ref``, ``mc_cid``, ``mc_eid``);
- remaining query parameters sorted byte-wise (param order is not
  semantic for the overwhelming majority of endpoints);
- empty query (after dropping) loses its ``?``.

Deliberately NOT done (semantic changes): trailing-slash folding,
www-stripping, percent-decoding — those conflate distinct resources on
real sites. Every rule here is expressible in SQL (regexp_replace +
list_sort), so the canonicalization itself is oracle-checkable.
"""

from __future__ import annotations

import re
from typing import List

import numpy as np
import pyarrow as pa

_SPLIT_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)
_TRACKING_RE = re.compile(r"^(utm_|gclid=|fbclid=|ref=|mc_cid=|mc_eid=)")
_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def normalize_url(url: str) -> str:
    """Canonical form of one URL (see module docstring); returns inputs
    that don't parse as absolute URLs unchanged."""
    m = _SPLIT_RE.match(url or "")
    if m is None:
        return url or ""
    scheme = m.group("scheme").lower()
    host = m.group("host").lower()
    default = _DEFAULT_PORT.get(scheme)
    if default and host.endswith(default):
        host = host[: -len(default)]
    path = m.group("path")
    query = m.group("query")
    if query:
        kept = sorted(
            p for p in query.split("&") if p and not _TRACKING_RE.match(p)
        )
        query = "&".join(kept)
    out = "%s://%s%s" % (scheme, host, path)
    if query:
        out += "?" + query
    return out


def host_of(url: str) -> str:
    """Host of one URL under the same canonical rules as
    :func:`normalize_url` (lowercased, default port stripped); ""
    for inputs that don't parse as absolute URLs. The first grouping
    key of domain-level curation (per-host caps, blocklists)."""
    m = _SPLIT_RE.match(url or "")
    if m is None:
        return ""
    scheme = m.group("scheme").lower()
    host = m.group("host").lower()
    default = _DEFAULT_PORT.get(scheme)
    if default and host.endswith(default):
        host = host[: -len(default)]
    return host


def host_array(urls) -> pa.Array:
    """Vectorized-per-distinct :func:`host_of` over an Arrow string
    column (dictionary-encode first — crawl URL columns are
    duplicate-heavy in the host)."""
    import pyarrow.compute as pc

    urls = pc.fill_null(urls, "")
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    enc = urls.dictionary_encode()
    codes = np.asarray(enc.indices, dtype=np.int64)
    dic: List[str] = enc.dictionary.to_pylist()
    hosts = np.array([host_of(u) for u in dic], dtype=object)
    return pa.array(hosts[codes], pa.string())


def normalize_url_array(urls) -> pa.Array:
    """Vectorized-per-distinct canonicalization of an Arrow string
    column: dictionary-encode first so each distinct URL is normalized
    once per batch (duplicate-heavy by construction — that's the point
    of the operator)."""
    import pyarrow.compute as pc

    urls = pc.fill_null(urls, "")
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    enc = urls.dictionary_encode()
    codes = np.asarray(enc.indices, dtype=np.int64)
    dic: List[str] = enc.dictionary.to_pylist()
    norm = np.array([normalize_url(u) for u in dic], dtype=object)
    return pa.array(norm[codes], pa.string())
