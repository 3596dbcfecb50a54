"""URL canonicalization — the normalization pass a web-scale crawl
applies BEFORE hashing urls into vertex ids, so that trivially-distinct
spellings of one page collapse to one vertex (RFC 3986 §6 syntax-based
normalization, the subset that is always safe):

  * scheme and host lowercased
  * default port stripped (``:80`` for http, ``:443`` for https)
  * fragment (``#...``) removed
  * dot-segments resolved in the path (``/a/./b/../c`` -> ``/a/c``)
  * empty path -> ``/``
  * percent-encoding uppercased (``%3a`` -> ``%3A``) and unreserved
    characters decoded (``%41`` -> ``A``)

Pure functions + one stateless map_batches stage. No query-string
reordering or tracking-param stripping — those change semantics and
belong in site-specific policy, not the engine.

(Reference analogue: input canonicalization before id assignment —
SURVEY.md §2.6 partitioner inputs; the reference's graphs arrive
pre-canonicalized as integer ids, this engine ingests raw urls.)
"""

from __future__ import annotations

import re

import pyarrow as pa

_SCHEME_HOST = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$", re.S)
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}
_PCT = re.compile(r"%([0-9A-Fa-f]{2})")
_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def _fix_pct(m: re.Match) -> str:
    ch = chr(int(m.group(1), 16))
    if ch in _UNRESERVED:
        return ch
    return "%" + m.group(1).upper()


def _resolve_dots(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # a trailing "." / ".." consumes the final slash; restore it
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    return res if res.startswith("/") else "/" + res


def canonicalize_url(url: str) -> str:
    """Syntax-based canonical form of an absolute http(s) url; other
    schemes / relative strings pass through with only fragment removal."""
    url = url.split("#", 1)[0]
    m = _SCHEME_HOST.match(url)
    if not m:
        return url
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    rest = m.group(3)
    dp = _DEFAULT_PORTS.get(scheme)
    if dp and host.endswith(dp):
        host = host[: -len(dp)]
    path, sep, query = rest.partition("?")
    if not path:
        path = "/"
    path = _resolve_dots(path)
    path = _PCT.sub(_fix_pct, path)
    if query:
        query = _PCT.sub(_fix_pct, query)
    return f"{scheme}://{host}{path}{sep}{query}"


class CanonicalizeUrls:
    """Stateless map_batches stage: rewrites the ``url`` column (and
    optionally other url-typed columns) to canonical form."""

    def __init__(self, columns: tuple[str, ...] = ("url",)):
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        for col in self.columns:
            vals = [canonicalize_url(u) for u in batch.column(col).to_pylist()]
            batch = batch.set_column(
                batch.schema.get_field_index(col), col, pa.array(vals, pa.string())
            )
        return batch


def canonicalize_pages(pages):
    """pages Dataset -> same Dataset with canonical ``url``."""
    return pages.map_batches(CanonicalizeUrls(("url",)), batch_format="pyarrow")
