"""Exact dedup operator (A7): keep first row per key by order column."""

import ray.data as rd

from zensearch_ray.sources.pages import generate_pages_table
from zensearch_ray.stages.dedup import dedup_by_key, find_duplicate_keys


def test_find_duplicate_keys(ray_session):
    t = generate_pages_table(n_rows=80, seed=42, dup_fraction=0.25)
    ds = rd.from_arrow(t)
    dups = find_duplicate_keys(ds, "url")
    urls = t["url"].to_pylist()
    expected = {u for u in urls if urls.count(u) > 1}
    assert dups == expected


def test_dedup_keeps_first_by_warc_ts(ray_session):
    t = generate_pages_table(n_rows=80, seed=42, dup_fraction=0.25)
    ds = rd.from_arrow(t)
    out = dedup_by_key(ds, "url", order_col="warc_ts").to_pandas()
    assert len(out) == 80
    assert out["url"].is_unique
    # kept row per duplicated url is the earliest warc_ts occurrence
    pdf = t.to_pandas()
    first = pdf.sort_values("warc_ts").groupby("url", as_index=False).first()
    merged = out.merge(first, on="url", suffixes=("", "_want"))
    assert (merged["warc_ts"] == merged["warc_ts_want"]).all()


def test_dedup_no_duplicates_passthrough(ray_session):
    t = generate_pages_table(n_rows=50, seed=42, dup_fraction=0.0)
    ds = rd.from_arrow(t)
    out = dedup_by_key(ds, "url", order_col="warc_ts")
    assert out.count() == 50


def test_simhash_near_pairs_exact_recall(ray_session):
    """Banded simhash pair detection must find exactly the pairs a
    brute-force hamming scan finds (pigeonhole: n_bands > max_hamming)."""
    import numpy as np
    import ray.data as rd

    from zensearch_ray.stages.minhash import SimHashStage, simhash_near_pairs

    SF = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    # brute-force oracle over all fingerprints
    fp = ds.map_batches(SimHashStage, batch_format="pyarrow", concurrency=2).to_pandas()
    ids = fp["doc_id"].to_numpy()
    h = fp["simhash"].to_numpy().astype(np.uint64)
    want = set()
    for i in range(len(ids)):
        x = h[i] ^ h[i + 1 :]
        for j in np.flatnonzero(np.array([bin(int(v)).count("1") for v in x]) <= 6):
            a, b = int(ids[i]), int(ids[i + 1 + j])
            want.add((min(a, b), max(a, b)))
    got_df = simhash_near_pairs(ds, max_hamming=6, n_bands=7)
    got = set(zip(got_df["a"].tolist(), got_df["b"].tolist()))
    assert got == want
