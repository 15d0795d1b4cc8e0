"""Frontier-delta pipeline: href harvesting, canonicalization chain,
bloom anti-join vs the visited set, per-host cap — against a pure-
Python replica of the pinned synthetic-link scheme, plus the
real-corpus (pages + index docmeta) form."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.urls import canonical_url
from zensearch_ray.pipelines.frontier import (
    HOST_CAP,
    HOST_MOD,
    N_LINKS_MOD,
    PAGE_MOD,
    VISITED_LT,
    VISITED_MOD,
    frontier_delta,
    frontier_from_pages,
)
from zensearch_ray.stages.extract import extract_links


def test_extract_links_pinned_spec():
    h = ('<html><a href="HTTP://A.B:80/x/?utm_a=1#f">x</a>'
         "<A HREF='rel/b.html'>y</A>"
         '<a class="z" href=plain>w</a>'
         '<a href="a&amp;b">q</a>'
         '<a name="anchor-without-href">skip</a>'
         '<a href="">empty-skipped</a></html>')
    assert extract_links(h) == [
        "HTTP://A.B:80/x/?utm_a=1#f", "rel/b.html", "plain", "a&b",
    ]
    # bytes input + duplicate preservation + document order
    assert extract_links(b'<a href="u">1</a><a href="u">2</a>') == ["u", "u"]


def test_canonical_chain_on_messy_href():
    raw = "HTTP://Host5.Example:80/p/17/?utm_src=x#frag2"
    assert canonical_url(raw) == "http://host5.example/p/17"


def test_extract_links_arrow_matches_referee():
    """The Arrow-RE2 collector must reproduce the per-document Python
    referee (hrefs AND document order) over messy fuzzed HTML: every
    quoting form, no-href anchors, <base href> before the first
    anchor, entities, empty hrefs, non-anchor tags."""
    import random

    from zensearch_ray.stages.extract import extract_links_arrow

    rng = random.Random(7)

    def rand_html(i):
        parts = ["<html>"]
        if i % 5 == 0:
            parts.append('<base href="http://Base.Example/zz">')
        parts.append("<body>")
        for j in range(rng.randint(0, 6)):
            q = rng.choice(['"', "'", ""])
            href = rng.choice([
                f"HTTP://Host{j}.Example:80/p/{i * 7 + j}/?utm_src=x#f",
                f"/rel/path{j}", "https://a.b/c?x=1&amp;y=2", "",
                "#frag", f"mailto:x@y{j}.z",
                "http://h.e/sp ace" if q else f"http://h.e/x{j}",
            ])
            extra = rng.choice(["", " class='k'", ' data-x=">"', " id=z"])
            if rng.random() < 0.2:
                parts.append(f"<a{extra}>no href</a>")
            if q:
                parts.append(f"<A {extra.strip()} HREF={q}{href}{q}>t</a>")
            else:
                parts.append(f"<a href={href or 'x'}>t</a>")
            parts.append(f"<abbr title='a'>{j}</abbr> <div>x</div>")
        parts.append("</body></html>")
        return "".join(parts)

    docs = [rand_html(i) for i in range(300)]
    rows, hrefs = extract_links_arrow(pa.array(docs))
    got: dict[int, list] = {}
    for r, h in zip(rows.tolist(), hrefs.to_pylist()):
        got.setdefault(r, []).append(h)
    for i, d in enumerate(docs):
        assert got.get(i, []) == extract_links(d), i


def test_canonical_urls_arrow_matches_referee():
    import random

    from zensearch_ray.functions.urls import canonical_urls_arrow

    rng = random.Random(11)
    cases = []
    for i in range(800):
        scheme = rng.choice(["HTTP", "http", "https", "HtTpS", "ftp", ""])
        host = rng.choice([f"Host{i % 7}.Example", "a.B.c", "X"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", "/p/Q", "/p/q/", "/p//", "/a/b///"])
        q = rng.choice(["", "?utm_src=x", "?x=1", "?utm_a=1&b=2",
                        "?x=1&utm_b=2"])
        frag = rng.choice(["", "#f", "#a#b"])
        if scheme:
            cases.append(f"{scheme}://{host}{port}{path}{q}{frag}")
        else:
            cases.append(f"{path or '/rel'}{q}{frag}")
    cases += ["", "mailto:A@B.c", "//proto-rel/Path", "http://h:80",
              "https://H:443/", "http://h:443/x"]
    got = canonical_urls_arrow(pa.array(cases)).to_pylist()
    for c, g in zip(cases, got):
        assert g == canonical_url(c), c


def _expected_frontier(doc_ids, n_chars, cap=HOST_CAP):
    """Driver-side replica of the pinned scheme (the SQL oracle's
    arithmetic, in Python)."""
    links = []
    for d, nc in zip(doc_ids, n_chars):
        for j in range(1, d % N_LINKS_MOD + 1):
            url = (f"http://host{(d * 7 + j * 13 + nc) % HOST_MOD}"
                   f".example/p/{(d * 31 + j) % PAGE_MOD}")
            links.append((d, url))
    visited = {u for d, u in links if d % VISITED_MOD < VISITED_LT}
    fresh = sorted({u for d, u in links
                    if d % VISITED_MOD >= VISITED_LT and u not in visited})
    rows = []
    byhost: dict[str, int] = {}
    for u in fresh:
        host = u.split("//")[1].split("/")[0]
        if byhost.get(host, 0) < cap:
            byhost[host] = byhost.get(host, 0) + 1
            rows.append((host, u))
    return pd.DataFrame(rows, columns=["host", "url"]).sort_values(
        ["host", "url"], ignore_index=True)


@pytest.fixture(scope="module")
def fr_sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("fr_sf")
    rng = np.random.default_rng(3)
    n = 400
    nc = rng.integers(20, 400, size=n)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(["t"] * n),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array(nc, type=pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
        row_group_size=64,
    )
    return str(d), np.arange(n), nc


def test_frontier_delta_matches_replica(fr_sf_dir):
    sf, ids, nc = fr_sf_dir
    got = frontier_delta(sf)
    want = _expected_frontier(ids.tolist(), nc.tolist())
    pd.testing.assert_frame_equal(got, want)
    # the cap genuinely binds somewhere on 400 docs over 23 hosts
    assert (got.groupby("host")["url"].count() == HOST_CAP).any()
    assert (got.groupby("host")["url"].count() <= HOST_CAP).all()


def test_frontier_from_pages_lifecycle(ray_session, tmp_path):
    """Real-corpus form: pages with stored HTML links → index docmeta
    is the visited set → output = uncrawled links only, canonical,
    binary-extension links dropped, capped per host."""
    from zensearch_ray.pipelines.build_index import BuildConfig, build_index

    urls = [f"http://site{i % 3}.test/page{i}" for i in range(12)]
    links = {
        0: ['<a href="http://site1.test/page1#top">known</a>'
            '<a href="HTTP://New.Host:80/fresh/1/">n1</a>'
            '<a href="http://new.host/doc.pdf">binary</a>'],
        5: ['<a href="http://new.host/fresh/2">n2</a>'
            '<a href="http://site1.test/page4">known2</a>'],
        7: ['<a href="http://other.org/a">o1</a>'
            '<a href="http://other.org/b">o2</a>'
            '<a href="http://other.org/c">o3</a>'],
    }
    html = [
        "<html><body><p>alpha beta gamma</p>" +
        "".join(links.get(i, [])) + "</body></html>"
        for i in range(12)
    ]
    pages = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls),
                "warc_ts": pa.array(["20240101000000"] * 12),
                "html": pa.array(html),
                "text": pa.array(["alpha beta gamma"] * 12),
                "lang": pa.array(["en"] * 12),
            }
        ),
        pages,
    )
    idx = str(tmp_path / "idx")
    build_index(pages, idx, BuildConfig(num_shards=2))
    got = frontier_from_pages(pages, idx, cap=2).to_pandas().sort_values(
        ["host", "url"], ignore_index=True)
    want = pd.DataFrame(
        {
            "host": ["new.host", "new.host", "other.org", "other.org"],
            "url": ["http://new.host/fresh/1", "http://new.host/fresh/2",
                    "http://other.org/a", "http://other.org/b"],
        }
    )
    pd.testing.assert_frame_equal(got, want)
