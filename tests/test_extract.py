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


ADVERSARIAL_HTML = [
    '<a title="a>b">x</a>',                      # quoted '>' in attribute
    "<div>a < b and c > d</div>",                # bare '<' in text
    "<p>x<script>var a = '</div>'</script>y</p>",  # tag-lookalike in rawtext
    "<title>The &lt;Title&gt;</title><div>body</div>",
    "<!-- <div>ghost</div> --><p>real</p>",
    "<div>unclosed <p>nested",
    "<DIV>upper</DIV>",
    "<br><div>after void</div><img src='x'>",
    "<style>.a { color: red }</style><code>c1</code>",
    "<div/>selfclose<p>t</p>",
    "<!DOCTYPE html><html><body><p>doc</p></body></html>",
    "<p>end</p>trailing < text",
    "<pre>  spaced   out  </pre>",
]


def test_fast_path_matches_htmlparser_referee():
    """The compiled-regex fast extractor must equal the HTMLParser
    reference implementation byte-for-byte — on the fixture corpus and
    on adversarial html (quoted '>', rawtext script bodies, bare '<',
    comments, malformed nesting)."""
    from zensearch_ray.stages.extract import (
        extract_text_and_title,
        extract_text_and_title_reference,
    )

    for seed in (7, 42):
        t = generate_pages_table(n_rows=200, seed=seed)
        for h in t["html"].to_pylist():
            assert extract_text_and_title(h) == extract_text_and_title_reference(h)
    for case in ADVERSARIAL_HTML:
        assert extract_text_and_title(case) == extract_text_and_title_reference(
            case
        ), case


def test_generator_deterministic(tmp_path):
    t1 = generate_pages_table(n_rows=50, seed=42)
    t2 = generate_pages_table(n_rows=50, seed=42)
    assert t1.equals(t2)


def test_dedup_variant_has_duplicate_urls():
    t = generate_pages_table(n_rows=100, seed=42, dup_fraction=0.2)
    urls = t["url"].to_pylist()
    assert len(urls) == 120
    assert len(set(urls)) == 100
