"""Crawl-frontier delta: harvest links from stored HTML, canonicalize,
anti-join against the already-indexed URL set, and cap per host.

Reference analog: the crawler's page navigator walks every anchor of a
fetched page, filters/normalizes the hrefs, and enqueues only URLs not
already visited (``crawler/internal/crawler/page_navigator.go:93-218``,
visited/queue joins ``database/src/database.ts``). The reference does
this live, one page at a time; the batch-engine analog computes the
same delta over a STORED corpus in one pass — the pipeline a user
replaying a crawl from WARC runs first.

Shape at 100 TB: link harvesting and canonicalization are map-only
over the stored pages; the visited set never broadcasts raw (Bloom
words broadcast once via ``ray.put``, exact false-positive removal in
a co-partitioned semi-join — ``stages/bloom.py:bloom_semi_join``);
the per-host cap moves only per-batch-trimmed (host, url) slivers
(≤ cap rows per host per batch) through ONE host-keyed exchange, the
``source_cap`` layout.

``frontier_delta`` is the ORACLE-CHECKED entry: the sf tables carry no
stored HTML, so it first synthesizes a deterministic stored-page corpus
from (doc_id, n_chars) — messy hrefs (uppercase scheme/host, default
port, utm query, fragment) whose CANONICAL form is a pure arithmetic
formula. The SQL oracle builds the canonical URLs directly from that
formula, so the comparison proves the whole chain: the regex href
collector found exactly the planted links, canonicalization performed
the exact pinned transform, the anti-join is exact (every Bloom false
positive removed), and the cap kept exactly the K smallest URLs per
host. ``frontier_from_pages`` is the real-corpus form (pages table +
index docmeta) wired to the CLI.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from zensearch_ray.functions.urls import (
    canonical_url,
    canonical_urls_arrow,
    hostname_path,
)
from zensearch_ray.stages.extract import extract_links_arrow

# pinned synthetic-link scheme (mirrored verbatim by the SQL oracle):
# doc d emits links j = 1 .. (doc_id % (N_LINKS_MOD)) with
#   host = (doc_id*7 + j*13 + n_chars) % HOST_MOD
#   page = (doc_id*31 + j) % PAGE_MOD
# raw href  "HTTP://Host{host}.Example:80/p/{page}/?utm_src=x#frag{j}"
# canonical "http://host{host}.example/p/{page}"
N_LINKS_MOD = 4
HOST_MOD = 23
PAGE_MOD = 211
# docs with doc_id % VISITED_MOD < VISITED_LT are the "previous crawl
# generation": their links are already indexed (the visited set)
VISITED_MOD, VISITED_LT = 10, 3
HOST_CAP = 5


def synth_pages_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars) → (doc_id, html): the deterministic stored-
    HTML stand-in (the sf tables carry no WARC payload)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    ncs = batch["n_chars"].to_numpy(zero_copy_only=False)
    htmls = []
    for d, nc in zip(ids.tolist(), ncs.tolist()):
        anchors = [
            f'<a href="HTTP://Host{(d * 7 + j * 13 + nc) % HOST_MOD}'
            f'.Example:80/p/{(d * 31 + j) % PAGE_MOD}/?utm_src=x#frag{j}">'
            f"l{j}</a>"
            for j in range(1, d % N_LINKS_MOD + 1)
        ]
        htmls.append("<html><body>" + "".join(anchors) + "</body></html>")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "html": pa.array(htmls, type=pa.string()),
        }
    )


def harvest_canonical_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, html) → flat (doc_id, url) rows: href collection +
    canonicalization fused in one map (no raw-href column ever rides
    an exchange). Both steps are Arrow-RE2-vectorized
    (``extract_links_arrow`` + ``canonical_urls_arrow``); the per-row
    Python pair (``extract_links`` + ``canonical_url``) is the
    referee, fuzz-checked equivalent in ``test_frontier.py``."""
    rows, hrefs = extract_links_arrow(batch["html"])
    return pa.table(
        {
            "doc_id": pa.compute.cast(
                batch["doc_id"].take(pa.array(rows)), pa.int64()),
            "url": canonical_urls_arrow(hrefs),
        }
    )


def _host_cap(fresh, cap: int):
    """≤``cap`` lexicographically-smallest DISTINCT urls per host.
    Local distinct+trim per batch (global K smallest distinct urls is
    a subset of the union of per-batch K smallest), then ONE
    host-keyed exchange over the slivers — ``source_cap``'s layout."""

    def add_host_trim(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates("url")
        df = df.assign(
            host=[hostname_path(u)[0] for u in df["url"].tolist()]
        )
        df = df.sort_values(["host", "url"], kind="mergesort")
        return df.groupby("host", as_index=False).head(cap)[["host", "url"]]

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates("url").sort_values(
            ["host", "url"], kind="mergesort"
        )
        return df.groupby("host", as_index=False).head(cap)

    return (
        fresh.map_batches(add_host_trim, batch_format="pandas")
        .groupby("host")
        .map_groups(finish, batch_format="pandas")
    )


def frontier_delta(sf_dir: str, cap: int = HOST_CAP) -> pd.DataFrame:
    """Oracle entry: (host, url) of the new crawl frontier — links
    harvested from the synthetic stored pages of the CURRENT crawl
    generation (doc_id % 10 ≥ 3) that no already-indexed page
    (doc_id % 10 < 3) links to, ≤``cap`` per host, ordered
    (host, url)."""
    import ray.data as rd

    from zensearch_ray.stages.bloom import bloom_semi_join

    def links_for(residue_pred):
        def keep(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(residue_pred(ids % VISITED_MOD)))

        return (
            rd.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "n_chars"],
            )
            .map_batches(keep, batch_format="pyarrow")
            .map_batches(synth_pages_batch, batch_format="pyarrow")
            .map_batches(harvest_canonical_batch, batch_format="pyarrow")
            .select_columns(["url"])
        )

    visited = links_for(lambda r: r < VISITED_LT)
    cands = links_for(lambda r: r >= VISITED_LT)
    fresh = bloom_semi_join(cands, "url", visited, anti=True)
    df = _host_cap(fresh, cap).to_pandas()
    return df.sort_values(["host", "url"], ignore_index=True)


def frontier_from_pages(
    pages_path, index_dir: str, cap: int = HOST_CAP,
    same_host_only: bool = False,
):
    """Real-corpus frontier delta: stored pages (url, html) + an index
    whose docmeta carries the visited URL set → Dataset (host, url) of
    uncrawled links, ≤``cap`` per host. ``same_host_only`` keeps only
    links pointing at a host the corpus already covers (the
    reference's stay-on-site mode). Binary-extension links are dropped
    like the reference's LINK_FILTERS (``page_navigator.go:33``)."""
    import ray.data as rd

    from zensearch_ray.functions.urls import is_binary_link
    from zensearch_ray.stages.bloom import bloom_semi_join
    from zensearch_ray.state.manifest import IndexLayout

    layout = IndexLayout(index_dir)
    man = layout.read_manifest()
    meta_dirs = [
        layout.docmeta_gen_dir(g)
        for g in range(int(man.get("n_generations", 1)))
    ]
    visited = rd.read_parquet(meta_dirs, columns=["url"]).map_batches(
        lambda b: pa.table(
            {"url": pa.array([canonical_url(u) for u in
                              b["url"].to_pylist()], type=pa.string())}
        ),
        batch_format="pyarrow",
    )

    def harvest(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        _, hrefs = extract_links_arrow(batch["html"])
        uniq = pc.unique(canonical_urls_arrow(hrefs))
        # scheme + binary-extension filters run over the DISTINCT
        # per-batch sliver only (bounded by link diversity, not count)
        urls = sorted(
            u for u in uniq.to_pylist()
            if u.startswith(("http://", "https://"))
            and not is_binary_link(u)
        )
        return pa.table({"url": pa.array(urls, type=pa.string())})

    pages = (
        rd.read_parquet(pages_path, columns=["html"])
        if isinstance(pages_path, (str, list))
        else pages_path
    )
    links = pages.map_batches(harvest, batch_format="pyarrow")
    if same_host_only:
        hosts = visited.map_batches(
            lambda b: pa.table(
                {"host": pa.array(
                    [hostname_path(u)[0] for u in b["url"].to_pylist()],
                    type=pa.string())}
            ),
            batch_format="pyarrow",
        )

        def tag_host(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "host",
                pa.array([hostname_path(u)[0] for u in
                          batch["url"].to_pylist()], type=pa.string()),
            )

        links = bloom_semi_join(
            links.map_batches(tag_host, batch_format="pyarrow"),
            "host", hosts, anti=False,
        ).select_columns(["url"])
    fresh = bloom_semi_join(links, "url", visited, anti=True)
    return _host_cap(fresh, cap)
