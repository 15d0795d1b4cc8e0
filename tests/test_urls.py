"""E4 URL scalar functions + host-count pipeline + topk_docs resolution."""

import pyarrow as pa
import pytest

from zensearch_ray.functions.urls import (
    hostname_path,
    host_counts_batch,
    is_binary_link,
    strip_fragment,
)


def test_hostname_path():
    assert hostname_path("https://site1.example.com/a/b?q=1#f") == (
        "site1.example.com",
        "/a/b",
    )
    assert hostname_path("not a url")[0] == ""
    assert hostname_path("https://UPPER.example.com/X")[0] == "upper.example.com"


def test_strip_fragment():
    assert strip_fragment("https://a/b#sec") == "https://a/b"
    assert strip_fragment("https://a/b") == "https://a/b"


def test_binary_link_filter():
    assert is_binary_link("https://x.com/file.PDF")
    assert is_binary_link("https://x.com/a/b.tar#frag")
    assert not is_binary_link("https://x.com/page.html")
    assert not is_binary_link("https://x.com/page")


def test_host_counts_batch():
    batch = pa.table(
        {"url": ["https://a.com/1", "https://a.com/2", "https://b.com/x"]}
    )
    out = host_counts_batch(batch)
    got = dict(zip(out["hostname"].to_pylist(), out["n_docs"].to_pylist()))
    assert got == {"a.com": 2, "b.com": 1}


def test_topk_docs_resolves_urls(ray_session, pages_small, tmp_path):
    from zensearch_ray.pipelines.build_index import BuildConfig, build_index
    from zensearch_ray.pipelines.query import QueryEngine

    index_dir = str(tmp_path / "idx")
    build_index(pages_small, index_dir, BuildConfig(num_shards=4, salt_subs=2, lang="en"))
    engine = QueryEngine(index_dir)
    docs = engine.topk_docs("search engine page", k=5)
    assert len(docs) == 5
    assert [d["rank"] for d in docs] == [1, 2, 3, 4, 5]
    for d in docs:
        assert d["url"].startswith("https://")
        assert d["score"] > 0
    # pruned path resolves to the same documents (scores approx — the
    # two paths accumulate terms in different float orders)
    pruned = engine.topk_docs("search engine page", k=5, mode="pruned")
    assert [(d["rank"], d["doc_id"], d["url"]) for d in pruned] == [
        (d["rank"], d["doc_id"], d["url"]) for d in docs
    ]
    for a, b in zip(pruned, docs):
        assert a["score"] == pytest.approx(b["score"], rel=1e-12)


def test_canonical_url_forms():
    from zensearch_ray.functions.urls import canonical_url

    cases = {
        "HTTPS://Example.COM:443/a/b/?utm_source=x#frag": "https://example.com/a/b",
        "http://site.org:80/": "http://site.org",
        "https://a.b/path/": "https://a.b/path",
        "https://a.b/path?q=real": "https://a.b/path?q=real",  # kept
        "https://a.b/Path": "https://a.b/Path",  # path case preserved
        "https://a.b:8080/x": "https://a.b:8080/x",  # non-default port kept
        "not a url": "not a url",
    }
    for raw, want in cases.items():
        assert canonical_url(raw) == want, raw
    # distinct canonical pages never collapse
    assert canonical_url("https://a.b/x") != canonical_url("https://a.b/y")
