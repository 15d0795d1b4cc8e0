"""URL scalar functions (operator E4, reference
``crawler/utilities/origin_url.go:7-13`` ``GetHostname``; link filters
``crawler/internal/crawler/page_navigator.go:33,111-152``).

Used inside ``map_batches`` bodies — pure, deterministic, no I/O.
"""

from __future__ import annotations

from urllib.parse import urlsplit

# the reference's 17 binary-extension link filters (page_navigator.go:33)
BINARY_EXTENSIONS = frozenset(
    ".pdf .png .jpg .jpeg .gif .svg .zip .tar .gz .mp3 .mp4 .avi .mov .exe .dmg .iso .webp".split()
)


def hostname_path(url: str) -> tuple[str, str]:
    """(hostname, path) of a URL — empty strings when unparseable."""
    try:
        parts = urlsplit(url)
        return parts.hostname or "", parts.path or ""
    except ValueError:
        return "", ""


def strip_fragment(url: str) -> str:
    """Drop the #fragment (the reference strips it before enqueueing,
    page_navigator.go:131-138)."""
    i = url.find("#")
    return url if i < 0 else url[:i]


def is_binary_link(url: str) -> bool:
    """True for links the reference's LINK_FILTERS would drop."""
    path = hostname_path(strip_fragment(url))[1].lower()
    dot = path.rfind(".")
    return dot >= 0 and path[dot:] in BINARY_EXTENSIONS


def host_counts_batch(batch, url_col: str = "url"):
    """map_batches body: per-batch partial (hostname, n_docs) counts —
    combine with a small groupby-sum (J3/J4 analog over the page table)."""
    import pyarrow as pa

    counts: dict[str, int] = {}
    for u in batch[url_col].to_pylist():
        h = hostname_path(u)[0]
        counts[h] = counts.get(h, 0) + 1
    return pa.table(
        {
            "hostname": pa.array(list(counts.keys()), type=pa.string()),
            "n_docs": pa.array(list(counts.values()), type=pa.int64()),
        }
    )


_CANON_STEPS = (
    # applied in order; each is (regex, replacement) and each step is a
    # plain re.sub so any engine (including a SQL regexp_replace chain)
    # reproduces the canonical form byte-for-byte
    (r"#.*$", ""),                       # fragment never reaches a server
    (r"\?utm_[^#]*$", ""),               # pure-tracking query string
    (r"^(https?)://([^/]+):(80|443)(/|$)", r"\1://\2\4"),  # default ports
    (r"/+$", ""),                        # trailing slashes
)


def canonical_url(url: str) -> str:
    """Crawl-dedup URL canonicalization: lowercase scheme+host, drop
    fragments, drop pure-tracking (`?utm_...`) query strings, strip
    default ports and trailing slashes. Deliberately REGEX-ONLY (no
    urllib parse) so the exact transform is portable to any oracle —
    each step is one substitution. Distinct canonical pages stay
    distinct: path and non-tracking queries are untouched."""
    import re

    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)(.*)$", url)
    if m:
        url = m.group(1).lower() + "://" + m.group(2).lower() + m.group(3)
    for pat, rep in _CANON_STEPS:
        url = re.sub(pat, rep, url)
    return url


def canonical_urls_arrow(urls):
    """Arrow-vectorized ``canonical_url`` over a string array — the
    same pinned step chain as RE2 kernels (lowercase scheme+host
    prefix, then the ``_CANON_STEPS`` substitutions in order), one
    compute call per step instead of a Python loop per URL.
    ``canonical_url`` remains the scalar referee (fuzz-checked
    equivalent in ``test_frontier.py``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = pa.array(urls, type=pa.string())
    ex = pc.extract_regex(
        urls, r"^(?P<p>[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)(?P<r>.*)$")
    low = pc.binary_join_element_wise(
        pc.utf8_lower(ex.field("p")), ex.field("r"), "")
    # non-matching rows: extract_regex leaves EMPTY child fields under
    # an invalid struct slot, so select on the struct validity
    out = pc.if_else(pc.is_valid(ex), low, urls)
    for pat, rep in _CANON_STEPS:
        out = pc.replace_substring_regex(out, pat, rep)
    return out


def canonical_url_batch(batch, url_col: str = "url", out_col: str = "canon_url"):
    """map_batches fn: append the canonical form of ``url_col``."""
    import pyarrow as pa

    return batch.append_column(
        out_col,
        pa.array([canonical_url(u) for u in batch[url_col].to_pylist()],
                 type=pa.string()),
    )
