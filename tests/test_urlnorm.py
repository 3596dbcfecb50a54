"""URL canonicalization vs RFC 3986 §6 expectations."""

import pyarrow as pa

import ray.data

from linkgraph.urlnorm import CanonicalizeUrls, canonicalize_url

CASES = [
    # scheme/host case, default port, fragment
    ("HTTP://Example.COM:80/a", "http://example.com/a"),
    ("https://Example.com:443/a?q=1#frag", "https://example.com/a?q=1"),
    ("https://example.com:8443/a", "https://example.com:8443/a"),
    # dot segments
    ("http://h/a/./b", "http://h/a/b"),
    ("http://h/a/b/../c", "http://h/a/c"),
    ("http://h/a/b/..", "http://h/a/"),
    ("http://h/./a", "http://h/a"),
    ("http://h/a/../../b", "http://h/b"),
    # empty path, query preserved verbatim (no reordering)
    ("http://h", "http://h/"),
    ("http://h?b=2&a=1", "http://h/?b=2&a=1"),
    # percent-encoding: unreserved decoded, reserved uppercased
    ("http://h/%41%2fx", "http://h/A%2Fx"),
    ("http://h/a%7Eb", "http://h/a~b"),
    # non-http passthrough (fragment still dropped)
    ("mailto:x@y#z", "mailto:x@y"),
    ("/relative/path#f", "/relative/path"),
]


def test_canonicalize_url_cases():
    for raw, want in CASES:
        assert canonicalize_url(raw) == want, raw


def test_canonicalize_idempotent():
    for raw, want in CASES:
        assert canonicalize_url(want) == want, want


def test_canonicalize_stage():
    ds = ray.data.from_arrow(
        pa.table({"url": pa.array([c[0] for c in CASES]), "x": pa.array(range(len(CASES)))})
    )
    out = ds.map_batches(CanonicalizeUrls(("url",)), batch_format="pyarrow").to_pandas()
    assert list(out["url"]) == [c[1] for c in CASES]
    assert list(out["x"]) == list(range(len(CASES)))


def test_synthetic_urls_already_canonical():
    """The generator's urls are fixed points — canonicalizing the
    pages table changes nothing (so build_edges output is invariant)."""
    import numpy as np

    from linkgraph.synth import pages_table

    pt = pages_table(np.arange(50), 50, 5)
    for u in pt.column("url").to_pylist():
        assert canonicalize_url(u) == u
