"""MinHash-LSH distributed dedup: candidate recall on planted near-dups,
connected components vs union-find, and the full distributed
``dup_groups`` pipeline vs the driver-side brute-force oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from zensearch_ray.stages.minhash import (
    connected_components,
    dup_groups,
    lsh_candidate_pairs,
    shingle_hashes,
    verify_and_group,
)


@pytest.fixture(scope="module")
def near_dup_corpus():
    """120 base docs + planted duplicates: exact copies (j=1) and
    1-token perturbations of ~200-token docs (j ≈ 0.97) — high enough
    that LSH (16 bands × 8 rows) recall is ~1 - 1e-7."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    docs = {}
    for i in range(120):
        toks = [vocab[j] for j in rng.integers(0, 500, size=200)]
        docs[i] = " ".join(toks)
    # group A: 200..202 exact copies of doc 3
    for j, d in enumerate(range(200, 203)):
        docs[d] = docs[3]
    # group B: 300/301 near-copies of doc 7 (perturb one token)
    for d in (300, 301):
        toks = docs[7].split(" ")
        toks[50 + d % 7] = "zz%d" % d
        docs[d] = " ".join(toks)
    # chain: 400 ~ doc 11, 401 ~ 400 (forces >1 CC iteration if the
    # verify graph is a path rather than a clique)
    t = docs[11].split(" ")
    t[10] = "chain400"
    docs[400] = " ".join(t)
    t2 = list(t)
    t2[180] = "chain401"
    docs[401] = " ".join(t2)
    ids = sorted(docs)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array([docs[i] for i in ids], type=pa.string()),
        }
    )


def _brute_groups(table: pa.Table, threshold: float = 0.8) -> dict[int, int]:
    """All-pairs shingle-Jaccard + union-find — the small-scale oracle."""
    ids = table["doc_id"].to_pylist()
    sets_ = [set(shingle_hashes(t).tolist()) for t in table["text"].to_pylist()]
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            sa, sb = sets_[i], sets_[j]
            union = len(sa | sb)
            if union and len(sa & sb) / union >= threshold:
                ra, rb = find(ids[i]), find(ids[j])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {d: find(d) for d in ids}


def test_dup_groups_matches_bruteforce(ray_session, near_dup_corpus):
    import ray.data as rd

    ds = rd.from_arrow(near_dup_corpus)
    got = dup_groups(ds, threshold=0.8, num_partitions=4).to_pandas()
    want = _brute_groups(near_dup_corpus, threshold=0.8)
    got_map = dict(zip(got["doc_id"].tolist(), got["group_id"].tolist()))
    assert got_map == want
    # sanity: the planted groups actually grouped
    assert got_map[200] == got_map[201] == got_map[202] == got_map[3]
    assert got_map[300] == got_map[301] == got_map[7]
    assert got_map[400] == got_map[11]


def test_dup_groups_matches_driver_unionfind(ray_session, near_dup_corpus):
    """Distributed verify+CC must produce the same groups as the
    driver union-find fed the same LSH candidates."""
    import ray.data as rd

    ds = rd.from_arrow(near_dup_corpus)
    pairs = lsh_candidate_pairs(ds)
    driver_groups = verify_and_group(ds, pairs, threshold=0.8)
    got = dup_groups(ds, threshold=0.8, num_partitions=4).to_pandas()
    got_map = dict(zip(got["doc_id"].tolist(), got["group_id"].tolist()))
    for d in near_dup_corpus["doc_id"].to_pylist():
        assert got_map[d] == driver_groups.get(d, d)


def test_connected_components_chain_and_clique(ray_session):
    """CC over a 6-node path (needs multiple propagation rounds), a
    clique, and an isolated edge — labels = component min."""
    import ray.data as rd

    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15),  # path
             (20, 21), (20, 22), (21, 22),                      # triangle
             (30, 31)]
    ds = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([a for a, _ in edges], type=pa.int64()),
                "b": pa.array([b for _, b in edges], type=pa.int64()),
            }
        )
    )
    labels = connected_components(ds, num_partitions=2).to_pandas()
    lm = dict(zip(labels["node"].tolist(), labels["label"].tolist()))
    assert all(lm[n] == 10 for n in range(10, 16))
    assert all(lm[n] == 20 for n in (20, 21, 22))
    assert lm[30] == lm[31] == 30


def test_max_bucket_caps_degenerate_corpus(ray_session):
    """1k identical docs: with max_bucket below the group size, LSH and
    simhash banding must drop the degenerate bucket (no O(N²) blowup,
    no pairs) rather than emit ~500k pairs."""
    import ray.data as rd

    from zensearch_ray.stages.minhash import simhash_near_pairs

    n = 1000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "text": pa.array(["same text for every doc here"] * n),
        }
    )
    ds = rd.from_arrow(t)
    assert lsh_candidate_pairs(ds, max_bucket=100) == set()
    pairs = simhash_near_pairs(ds, max_hamming=6, n_bands=7, max_bucket=100)
    assert len(pairs) == 0
    # and with a generous cap the pairs ARE found (cap is the only gate)
    small = rd.from_arrow(t.slice(0, 20))
    assert len(lsh_candidate_pairs(small, max_bucket=1000)) == 20 * 19 // 2


def test_band_layout_no_dead_band(ray_session):
    """Regression: 63 bits / 9 bands used width = 63//9 + 1 = 8, so band
    8 started at bit 64 — a zero-information band (always 0) that
    funneled every row into one bucket.  With a corpus above max_bucket
    that bucket was dropped, and a hamming-8 pair whose 8 differing bits
    land one-per-band in bands 0..7 (agreeing only on band 8) was LOST.
    Ceil width (7) makes band 8 carry bits 56..62 and the pair is found."""
    import ray.data as rd

    from zensearch_ray.stages.minhash import hamming_near_pairs_from_fp

    rng = np.random.default_rng(42)
    n = 300
    fps = rng.integers(0, 1 << 63, size=n, dtype=np.int64)
    # planted pair: differ in exactly one bit inside each of bands 0..7
    # (ceil width 7 → band b covers bits [7b, 7b+7)); band 8 agrees.
    a = np.int64(0x123456789ABCDEF)
    b = a
    for band in range(8):
        b ^= np.int64(1) << np.int64(7 * band)
    fps[0], fps[1] = a, b
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n), type=pa.int64()),
                  "simhash": pa.array(fps, type=pa.int64())})
    )
    got = hamming_near_pairs_from_fp(
        ds, max_hamming=8, n_bands=9, max_bucket=50
    )
    pairs = set(zip(got["a"].tolist(), got["b"].tolist()))
    assert (0, 1) in pairs
    # degenerate layouts must raise, never silently weaken the guarantee
    import pytest as _pytest

    with _pytest.raises(ValueError, match="degenerate"):
        hamming_near_pairs_from_fp(ds, max_hamming=3, n_bands=6, nbits=10)
