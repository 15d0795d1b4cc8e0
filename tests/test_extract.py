"""E1 extraction conformance: extract(html) == text byte-identically per url."""

import pyarrow.parquet as pq

from zensearch_ray.sources.pages import generate_pages_table
from zensearch_ray.stages.extract import extract_batch, extract_text


def test_extract_ignores_non_content():
    html = (
        b"<html><head><title>T</title><style>p{}</style>"
        b"<script>var x=1;</script></head><body>"
        b"<nav>skip me</nav><p>keep this</p><!-- no --><footer>skip</footer>"
        b"</body></html>"
    )
    assert extract_text(html) == "keep this"


def test_extract_nested_no_double_count():
    html = b"<div>a <p>b</p> <span>c</span></div>"
    assert extract_text(html) == "a b c"


def test_extract_whitespace_normalization():
    html = b"<p>  a \n\t b  </p><p>c</p>"
    assert extract_text(html) == "a b c"


def test_extract_entities_and_void_tags():
    html = b"<p>a &amp; b<br>c</p><p>caf&eacute;</p>"
    assert extract_text(html) == "a & b c café"


def test_extract_bytes_identity_fixture():
    """The headline invariant over the deterministic fixture table."""
    table = generate_pages_table(n_rows=150, seed=42)
    out = extract_batch(table)
    texts = out["text"].to_pylist()
    orig = table["text"].to_pylist()
    for url, got, want in zip(table["url"].to_pylist(), texts, orig):
        assert got == want, f"extraction mismatch for {url}"


def test_generator_deterministic(tmp_path):
    t1 = generate_pages_table(n_rows=50, seed=42)
    t2 = generate_pages_table(n_rows=50, seed=42)
    assert t1.equals(t2)


def test_dedup_variant_has_duplicate_urls():
    t = generate_pages_table(n_rows=100, seed=42, dup_fraction=0.2)
    urls = t["url"].to_pylist()
    assert len(urls) == 120
    assert len(set(urls)) == 100
