"""Graph operator tests: distributed PageRank vs the driver-side
brute-force reference (same pinned semantics), plus the connected-
components composition over the embedding near-dup graph."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zensearch_ray.stages.graph import pagerank, pagerank_reference


def _pr_frame(edges):
    import ray.data as rd

    df = pd.DataFrame(edges, columns=["src", "dst", "w"])
    return pagerank(rd.from_pandas(df))


def test_pagerank_matches_reference(ray_session):
    edges = [
        ("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0),
        ("c", "a", 1.0), ("d", "a", 5.0), ("b", "a", 1.0),
    ]
    got = _pr_frame(edges).set_index("node")["pagerank"]
    want = pagerank_reference(edges)
    assert set(got.index) == set(want)
    for n, r in want.items():
        assert got[n] == pytest.approx(r, abs=1e-12)
    assert got.sum() == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_mass_redistributed(ray_session):
    # 'sink' has no out-edges: its rank must feed back uniformly, and
    # total rank must still sum to 1
    edges = [("a", "sink", 1.0), ("b", "sink", 2.0), ("a", "b", 1.0)]
    got = _pr_frame(edges).set_index("node")["pagerank"]
    want = pagerank_reference(edges)
    for n, r in want.items():
        assert got[n] == pytest.approx(r, abs=1e-12)
    assert got.sum() == pytest.approx(1.0, abs=1e-9)
    assert got["sink"] > got["a"]  # sink receives from both


def test_pagerank_integer_nodes_multi_block(ray_session):
    # 60 nodes in a ring + chords, shipped as many small blocks so the
    # per-block prep/contrib path actually fans out
    import ray.data as rd

    rng = np.random.default_rng(7)
    edges = [(i, (i + 1) % 60, 1.0) for i in range(60)]
    edges += [
        (int(rng.integers(0, 60)), int(rng.integers(0, 60)), float(w))
        for w in rng.integers(1, 5, size=120)
    ]
    df = pd.DataFrame(edges, columns=["src", "dst", "w"])
    ds = rd.from_pandas(df).repartition(9)
    got = pagerank(ds).set_index("node")["pagerank"]
    want = pagerank_reference(edges)
    for n, r in want.items():
        assert got[n] == pytest.approx(r, rel=1e-9)


def test_pagerank_empty_edges(ray_session):
    import ray.data as rd

    empty = rd.from_pandas(
        pd.DataFrame({"src": pd.Series([], dtype=object),
                      "dst": pd.Series([], dtype=object),
                      "w": pd.Series([], dtype=np.float64)})
    )
    out = pagerank(empty)
    assert len(out) == 0
    assert list(out.columns) == ["node", "pagerank"]


def test_dup_components_vs_bruteforce(ray_session):
    # clustered vectors: components = groups of mutually-similar rows,
    # checked against a driver union-find over the exact pair list
    import ray.data as rd

    from zensearch_ray.stages.ann import dup_components, normalize_rows

    rng = np.random.default_rng(3)
    base = rng.normal(size=(5, 16))
    rows, ids = [], []
    for i in range(60):
        c = i % 5
        rows.append(base[c] + rng.normal(scale=0.15, size=16))
        ids.append(i)
    m = normalize_rows(np.array(rows))
    thr = 0.8
    sims = m @ m.T
    parent = list(range(60))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(60):
        for j in range(i + 1, 60):
            if sims[i, j] >= thr:
                parent[find(i)] = find(j)
    want = {i: min(j for j in range(60) if find(j) == find(i)) for i in range(60)}

    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": ids, "embedding": [r.tolist() for r in rows]})
    )
    got = dup_components(ds, thr).to_pandas()
    got_map = dict(zip(got["vec_id"], got["component_id"]))
    assert got_map == want


def test_pagerank_sharded_matches_broadcast_and_reference(ray_session):
    """The co-partitioned shard exchange must reproduce the broadcast
    layout's values exactly (same pinned semantics, float64 both
    ways) — string nodes, dangling node, parallel edges, multi-block."""
    import ray.data as rd

    from zensearch_ray.stages.graph import pagerank_sharded

    rng = np.random.default_rng(13)
    names = [f"host{i:03d}" for i in range(80)]
    edges = [(names[i], names[(i + 7) % 80], 1.0) for i in range(80)]
    edges += [
        (names[int(rng.integers(0, 80))], names[int(rng.integers(0, 80))],
         float(w))
        for w in rng.integers(1, 6, size=200)
    ]
    edges.append((names[0], "sink", 2.0))  # dangling dst
    df = pd.DataFrame(edges, columns=["src", "dst", "w"])
    ds = rd.from_pandas(df).repartition(7)
    got = pagerank_sharded(ds, num_partitions=5).set_index("node")["pagerank"]
    want = pagerank_reference(edges)
    assert set(got.index) == set(want)
    for n, r in want.items():
        assert got[n] == pytest.approx(r, abs=1e-12), n
    assert got.sum() == pytest.approx(1.0, abs=1e-9)
    bc = _pr_frame(edges).set_index("node")["pagerank"]
    for n in bc.index:
        assert got[n] == pytest.approx(bc[n], abs=1e-13), n


def test_pagerank_sharded_integer_nodes_and_empty(ray_session):
    import ray.data as rd

    from zensearch_ray.stages.graph import pagerank_sharded

    edges = [(1, 2, 1.0), (2, 3, 2.0), (3, 1, 1.0), (4, 1, 5.0)]
    df = pd.DataFrame(edges, columns=["src", "dst", "w"])
    got = pagerank_sharded(rd.from_pandas(df), num_partitions=3)
    want = pagerank_reference(edges)
    gm = dict(zip(got["node"], got["pagerank"]))
    for n, r in want.items():
        assert gm[n] == pytest.approx(r, abs=1e-12)
    empty = pagerank_sharded(
        rd.from_pandas(pd.DataFrame(columns=["src", "dst", "w"])))
    assert len(empty) == 0


def test_pagerank_sharded_prep_memory_bounded(ray_session):
    """No shard actor may ever hold the full node vocabulary during
    prep: peak residency is its own vocab shard plus the distinct-dst
    slivers its edges reference (the r4 form ``ray.get``-ed all shard
    vocabularies, pulling the full |V| into every actor once)."""
    import ray.data as rd

    from zensearch_ray.stages.graph import pagerank_sharded

    # ring of 500 nodes: each node links to the next, so each shard's
    # dst slivers are edge-bounded, far below |V|
    n = 500
    edges = [(f"n{i:04d}", f"n{(i + 1) % n:04d}", 1.0) for i in range(n)]
    df = pd.DataFrame(edges, columns=["src", "dst", "w"])
    peaks: list = []
    got = pagerank_sharded(
        rd.from_pandas(df).repartition(6), num_partitions=5,
        _peaks_out=peaks,
    ).set_index("node")["pagerank"]
    want = pagerank_reference(edges)
    for node, r in want.items():
        assert got[node] == pytest.approx(r, abs=1e-12), node
    assert len(peaks) == 5
    # every edge has exactly one dst, so each shard's sliver total is
    # at most its edge count (~n/5) and its vocab is ~n/5: peak must
    # stay well under the full vocabulary
    assert max(peaks) < 0.6 * n, peaks
    assert all(p > 0 for p in peaks)


def test_pagerank_auto_routes_by_cap(ray_session):
    """Forced tiny cap → sharded path; generous cap → broadcast path.
    Both must agree bit-for-bit on the same graph."""
    import ray.data as rd

    from zensearch_ray.stages.graph import pagerank_auto

    edges = [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0),
             ("c", "d", 1.0), ("d", "a", 1.0)]
    df = pd.DataFrame(edges, columns=["src", "dst", "w"])
    lo = pagerank_auto(rd.from_pandas(df), broadcast_cap=2,
                       num_partitions=3)
    hi = pagerank_auto(rd.from_pandas(df), broadcast_cap=10**6)
    lm = dict(zip(lo["node"], lo["pagerank"]))
    hm = dict(zip(hi["node"], hi["pagerank"]))
    assert set(lm) == set(hm)
    for n in lm:
        assert lm[n] == pytest.approx(hm[n], abs=1e-13), n
