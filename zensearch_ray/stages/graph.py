"""Distributed graph operators: weighted PageRank over an edge Dataset.

Reference analog: the reference crawls the web LINK GRAPH — its page
navigator harvests every anchor href into the frontier
(``crawler/internal/crawler/page_navigator.go:93-218``) — but never
computes over the graph it builds. PageRank is THE canonical web-scale
computation over exactly that graph, so the rebuild carries it as a
first-class operator (the same machinery ranks hosts, click-graph
nodes, or terms — TextRank).

100-TB shape
------------
The edge set is the BIG side and stays in the object store end to end:
it is snapshotted once into Arrow blocks, each block is preprocessed
ONCE into an (src_idx, dst_idx, w/out_weight) numpy triple held in
plasma, and every iteration is one embarrassingly-parallel pass over
those triples with the current rank vector broadcast via ``ray.put``
(zero-copy read per task). Per-iteration output is one dense partial
contribution vector per block — |V| floats, not edge-scale.

The NODE vector is the assumed-small side (|V| « |E|: hosts vs links,
terms vs bigram occurrences, event types vs transitions) — the standard
web-PageRank layout. For a node set that outgrows driver memory the
join-based alternative already in the repo applies: per-iteration hash
join of edges against a label/rank Dataset exactly as
``stages/minhash.py:connected_components`` does for min-label
propagation; this module deliberately implements the broadcast variant
so BOTH shapes exist.

Raw ``@ray.remote`` is justified here (same stance as
``stages/ann.py:near_dup_pairs``): the Dataset API would re-plan and
re-execute the whole upstream DAG on every one of the ``iters``
passes; iterating over pinned block refs reads each block from plasma
instead.

Semantics (pinned, shared with the SQL oracles in ``__ray_entry__``):
standard damped PageRank on a weighted directed graph,
``r'(v) = (1-d)/|V| + d * (Σ_{u→v} r(u)·w(u,v)/out(u) + dangling/|V|)``
where ``out(u) = Σ_x w(u,x)`` and ``dangling = Σ_{out(u)=0} r(u)``
(dangling mass redistributed uniformly). Fixed iteration count — no
early-exit — so an unrolled-SQL oracle computes the identical value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pagerank(
    edges_ds,
    damping: float = 0.85,
    iters: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
) -> pd.DataFrame:
    """Weighted PageRank over an edge Dataset → pandas (node, pagerank).

    ``edges_ds`` holds one row per directed edge (pre-aggregate parallel
    edges upstream if exact parity with an aggregated oracle matters —
    the math is identical either way since contributions are linear in
    ``w``). Node ids may be strings or ints; the node vocabulary is the
    small side (see module docstring). Ranks sum to 1.
    """
    import ray

    packed = edges_ds.select_columns([src_col, dst_col, w_col]).materialize()
    block_refs = packed.to_arrow_refs()

    @ray.remote
    def block_nodes(tbl: pa.Table) -> np.ndarray:
        if tbl.num_rows == 0 or src_col not in tbl.column_names:
            # zero-row blocks out of an upstream map_groups can carry an
            # EMPTY schema (no columns at all) — treat as no nodes
            return np.array([])
        return np.union1d(
            tbl[src_col].to_numpy(zero_copy_only=False),
            tbl[dst_col].to_numpy(zero_copy_only=False),
        )

    node_lists = ray.get([block_nodes.remote(r) for r in block_refs])
    node_lists = [a for a in node_lists if len(a)]
    if not node_lists:
        return pd.DataFrame({"node": pd.Series([], dtype=object),
                             "pagerank": pd.Series([], dtype=np.float64)})
    nodes = np.unique(np.concatenate(node_lists))
    n_nodes = len(nodes)
    idx_ref = ray.put({n: i for i, n in enumerate(nodes)})

    # one-time per-block prep: index-map the endpoints, keep the triple
    # in plasma (num_returns=2: only the small out-weight partial comes
    # back to the driver)
    @ray.remote(num_returns=2)
    def block_prep(tbl: pa.Table, idx: dict, nv: int):
        if tbl.num_rows == 0 or src_col not in tbl.column_names:
            z = np.empty(0, dtype=np.int64)
            return (z, z, np.empty(0, dtype=np.float64)), np.zeros(nv)
        s = pd.Series(tbl[src_col].to_numpy(zero_copy_only=False)).map(idx)
        d = pd.Series(tbl[dst_col].to_numpy(zero_copy_only=False)).map(idx)
        w = tbl[w_col].to_numpy(zero_copy_only=False).astype(np.float64)
        s = s.to_numpy(np.int64)
        d = d.to_numpy(np.int64)
        return (s, d, w), np.bincount(s, weights=w, minlength=nv)

    prep = [block_prep.remote(r, idx_ref, n_nodes) for r in block_refs]
    triple_refs = [t for t, _ in prep]
    out_weight = np.sum(ray.get([o for _, o in prep]), axis=0)
    out_ref = ray.put(out_weight)
    dangling = out_weight == 0.0

    @ray.remote
    def contrib_block(triple, ranks: np.ndarray, outw: np.ndarray, nv: int):
        s, d, w = triple
        return np.bincount(d, weights=ranks[s] * w / outw[s], minlength=nv)

    ranks = np.full(n_nodes, 1.0 / n_nodes)
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        r_ref = ray.put(ranks)
        parts = ray.get(
            [contrib_block.remote(t, r_ref, out_ref, n_nodes) for t in triple_refs]
        )
        contrib = np.sum(parts, axis=0)
        dang = float(ranks[dangling].sum())
        ranks = base + damping * (contrib + dang / n_nodes)
    return pd.DataFrame({"node": nodes, "pagerank": ranks})


def pagerank_reference(
    edges: list[tuple], damping: float = 0.85, iters: int = 20
) -> dict:
    """Driver-side brute-force oracle for tests: same pinned semantics,
    plain numpy over an edge list [(src, dst, w), ...] → {node: rank}."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    pos = {n: i for i, n in enumerate(nodes)}
    nv = len(nodes)
    out = np.zeros(nv)
    for s, _, w in edges:
        out[pos[s]] += w
    ranks = np.full(nv, 1.0 / nv)
    base = (1.0 - damping) / nv
    for _ in range(iters):
        contrib = np.zeros(nv)
        for s, d, w in edges:
            contrib[pos[d]] += ranks[pos[s]] * w / out[pos[s]]
        dang = ranks[out == 0.0].sum()
        ranks = base + damping * (contrib + dang / nv)
    return dict(zip(nodes, ranks))
