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

The NODE vector is the assumed-small side for :func:`pagerank` (|V| «
|E|: hosts vs links, terms vs bigram occurrences, event types vs
transitions) — the standard web-PageRank layout. For node sets that
outgrow a broadcast, :func:`pagerank_sharded` keeps the rank vector as
node-hash SHARDS in actors with a co-partitioned contribution
exchange per iteration (the ``connected_components`` layout, held
warm); :func:`pagerank_auto` routes between the two on a
provable-upper-bound node-count estimate.

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


def pagerank_sharded(
    edges_ds,
    damping: float = 0.85,
    iters: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    num_partitions: int = 8,
    _peaks_out: list | None = None,
) -> pd.DataFrame:
    """Co-partitioned PageRank for node sets that outgrow a broadcast.

    Same pinned semantics as :func:`pagerank`, different layout: the
    rank vector lives as ``num_partitions`` node-hash SHARDS inside
    long-lived actors — no task ever sees the full |V| vector. One
    map-side shuffle partitions the edges by hash(src) (each shard
    actor then owns every edge whose out-weight it needs, so
    ``out(u)`` is complete locally); prep pre-indexes each edge's dst
    into the owning shard's node order ONCE. Per iteration the only
    exchange is the sparse per-(src-shard → dst-shard) contribution
    partials (≤ min(|E|, P·|V|/P) rows, actor→actor via plasma) plus
    P dangling-mass SCALARS through the driver — the 10^12-node web
    graph shape the broadcast variant's docstring promises.

    Result collection remains |V|-scale (one (node, pagerank) frame,
    parity with :func:`pagerank`); at real scale consume per-shard
    tables instead of the concatenated frame.
    """
    import ray

    from zensearch_ray.state.sink import _part_of

    P = int(num_partitions)
    packed = edges_ds.select_columns([src_col, dst_col, w_col]).materialize()
    block_refs = packed.to_arrow_refs()

    @ray.remote
    def split_block(tbl: pa.Table):
        """One pass: rows split by hash(src) shard (as plasma refs) +
        the per-shard node vocabularies this block observes."""
        empty = tbl.num_rows == 0 or src_col not in tbl.column_names
        subs, nodes = [], []
        if not empty:
            ps = _part_of(tbl[src_col], P)
            pd_ = _part_of(tbl[dst_col], P)
            s_np = tbl[src_col].to_numpy(zero_copy_only=False)
            d_np = tbl[dst_col].to_numpy(zero_copy_only=False)
        for p in range(P):
            if empty:
                subs.append(None)
                nodes.append(ray.put(np.array([])))
                continue
            mask = ps == p
            subs.append(ray.put(tbl.filter(pa.array(mask))) if mask.any()
                        else None)
            # node vocab slivers stay in plasma too — the driver only
            # ever holds refs, never any part of the vocabulary
            nodes.append(ray.put(np.unique(np.concatenate(
                [s_np[mask], d_np[pd_ == p]]))))
        return subs, nodes

    split = ray.get([split_block.remote(r) for r in block_refs])

    # num_cpus=0: the shards are coordination-bound rank OWNERS (state +
    # short vectorized bursts), so they must all schedule even on a
    # small session — P one-CPU actors on a 4-CPU test node would
    # deadlock at __init__. At cluster scale give them real resources
    # via .options().
    @ray.remote(num_cpus=0)
    class _Shard:
        """Owns rank shard p: nodes_p (sorted), ranks_p, outw_p, and
        the src-shard-p edges pre-grouped by destination shard."""

        def __init__(self, p: int, sub_refs: list):
            import ray as _ray

            self.p = p
            tables = [t for t in _ray.get(sub_refs) if t is not None
                      and t.num_rows]
            self.edges = (pa.concat_tables(tables) if tables else None)

        def nodes(self, node_refs: list) -> np.ndarray:
            import ray as _ray

            arrs = [a for a in _ray.get(node_refs) if len(a)]
            self.nodes_p = (np.unique(np.concatenate(arrs)) if arrs
                            else np.array([]))
            return self.nodes_p

        def prep_local(self) -> list:
            """Prep phase A: index src against the OWN vocabulary,
            compute out-weights, and emit — per destination shard —
            this shard's distinct-dst node SLIVER (a plasma ref;
            bounded by this shard's edges, never |V|). The old form
            ``ray.get``-ed ALL shard vocabularies here, so on a real
            cluster every node transiently pulled the full |V| array;
            now no actor ever holds more than its own vocab plus its
            edge-derived slivers (asserted by ``peak_nodes``)."""
            import ray as _ray

            nv = len(self.nodes_p)
            self.outw = np.zeros(nv)
            self._pre: dict[int, tuple] = {}
            slivers: list = [None] * P
            self._peak_nodes = nv
            if self.edges is not None:
                s = np.searchsorted(
                    self.nodes_p,
                    self.edges[src_col].to_numpy(zero_copy_only=False))
                w = self.edges[w_col].to_numpy(
                    zero_copy_only=False).astype(np.float64)
                self.outw = np.bincount(s, weights=w, minlength=nv)
                qd = _part_of(self.edges[dst_col], P)
                d_np = self.edges[dst_col].to_numpy(zero_copy_only=False)
                for q in range(P):
                    m = qd == q
                    if m.any():
                        du = np.unique(d_np[m])
                        self._pre[q] = (
                            s[m], np.searchsorted(du, d_np[m]), w[m])
                        slivers[q] = _ray.put(du)
                        self._peak_nodes += len(du)
                self.edges = None  # raw rows no longer needed
            self.dangling = self.outw == 0.0
            self.ranks = None
            return slivers

        def index_slivers(self, sliver_refs: list) -> list:
            """Prep phase B (runs on the DESTINATION shard): resolve
            each source shard's dst sliver to positions in this
            shard's node order — one sliver resident at a time, so
            peak here is own vocab + the largest single sliver."""
            import ray as _ray

            out: list = []
            for r in sliver_refs:
                if r is None:
                    out.append(None)
                    continue
                arr = _ray.get(r)
                self._peak_nodes = max(
                    self._peak_nodes, len(self.nodes_p) + len(arr))
                out.append(_ray.put(
                    np.searchsorted(self.nodes_p, arr).astype(np.int64)))
            return out

        def finish_prep(self, pos_refs: list) -> int:
            """Prep phase C: rewrite each edge's dst pointer through
            its sliver's resolved positions — the per-iteration
            ``by_q`` layout is unchanged from the all-vocab form."""
            import ray as _ray

            self.by_q: dict[int, tuple] = {}
            for q, (s_m, pos_in_du, w_m) in self._pre.items():
                pos = _ray.get(pos_refs[q])
                self.by_q[q] = (s_m, pos[pos_in_du], w_m)
            self._pre = {}
            return len(self.nodes_p)

        def peak_nodes(self) -> int:
            """Max node ids resident in this actor during prep (own
            vocab + slivers) — the memory-bound contract under test."""
            return int(self._peak_nodes)

        def init_ranks(self, n_total: int):
            self.n_total = n_total
            self.ranks = np.full(len(self.nodes_p),
                                 1.0 / n_total if n_total else 0.0)

        def local_dangling(self) -> float:
            return float(self.ranks[self.dangling].sum())

        def contribs(self):
            """Sparse (dst_idx, partial_sum) per destination shard —
            pre-aggregated here so partial size is bounded by the
            destination shard's vocabulary, not this shard's edges."""
            out = []
            for q in range(P):
                t = self.by_q.get(q)
                if t is None:
                    out.append(None)
                    continue
                s_idx, d_idx, w = t
                vals = self.ranks[s_idx] * w / self.outw[s_idx]
                uniq, inv = np.unique(d_idx, return_inverse=True)
                out.append((uniq, np.bincount(inv, weights=vals)))
            return tuple(out)

        def apply(self, dang_total: float, damping_: float, part_refs):
            import ray as _ray

            # contribution partials flow actor→actor through plasma —
            # the driver only ever relays the refs
            parts = _ray.get(list(part_refs))
            contrib = np.zeros(len(self.nodes_p))
            for part in parts:
                if part is not None:
                    d_idx, vals = part
                    contrib[d_idx] += vals
            base = (1.0 - damping_) / self.n_total
            self.ranks = base + damping_ * (
                contrib + dang_total / self.n_total)
            return True

        def result(self) -> pa.Table:
            return pa.table({"node": pa.array(self.nodes_p),
                             "pagerank": pa.array(self.ranks)})

    shards = [
        _Shard.remote(p, [blk[0][p] for blk in split
                          if blk[0][p] is not None])
        for p in range(P)
    ]
    node_refs = [
        s.nodes.remote([blk[1][p] for blk in split])
        for p, s in enumerate(shards)
    ]
    ray.wait(node_refs, num_returns=P)
    # three-phase sliver prep: the driver only relays plasma refs —
    # it never reads a vocabulary or a sliver
    sliver_mat = ray.get([s.prep_local.remote() for s in shards])
    pos_mat = ray.get([
        shards[q].index_slivers.remote([sliver_mat[p][q] for p in range(P)])
        for q in range(P)
    ])
    counts = ray.get([
        shards[p].finish_prep.remote([pos_mat[q][p] for q in range(P)])
        for p in range(P)
    ])
    n_total = int(sum(counts))
    if n_total == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=object),
                             "pagerank": pd.Series([], dtype=np.float64)})
    ray.get([s.init_ranks.remote(n_total) for s in shards])

    for _ in range(iters):
        dang = float(sum(ray.get(
            [s.local_dangling.remote() for s in shards])))
        part_refs = [
            s.contribs.options(num_returns=P).remote() for s in shards
        ]
        ray.get([
            shards[q].apply.remote(dang, damping,
                                   [pr[q] for pr in part_refs])
            for q in range(P)
        ])

    tables = ray.get([s.result.remote() for s in shards])
    if _peaks_out is not None:  # test hook: per-actor prep peaks
        _peaks_out.extend(ray.get([s.peak_nodes.remote() for s in shards]))
    for s in shards:
        ray.kill(s)
    # nodeless shards (P > |V|) carry a typeless empty schema — drop
    # them rather than let concat fight over the node column type
    tables = [t for t in tables if t.num_rows]
    df = pa.concat_tables(tables).to_pandas()
    return df.sort_values("node", ignore_index=True)


def pagerank_auto(
    edges_ds,
    damping: float = 0.85,
    iters: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    broadcast_cap: int = 2_000_000,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Route by node-set size, like ``ann.near_dup_pairs_auto``: the
    broadcast layout (one ``ray.put`` rank vector per iteration —
    cheapest while |V| fits every worker) below ``broadcast_cap``
    distinct nodes, the co-partitioned shard exchange above it. The
    estimate is the SUM of per-block distinct counts (an upper bound,
    computed from scalars — never the vocabulary itself), so the
    broadcast path is only chosen when the true |V| provably fits."""
    import ray

    packed = edges_ds.select_columns([src_col, dst_col, w_col]).materialize()

    @ray.remote
    def block_card(tbl: pa.Table) -> int:
        if tbl.num_rows == 0 or src_col not in tbl.column_names:
            return 0
        return len(np.union1d(
            tbl[src_col].to_numpy(zero_copy_only=False),
            tbl[dst_col].to_numpy(zero_copy_only=False)))

    upper = sum(ray.get([block_card.remote(r)
                         for r in packed.to_arrow_refs()]))
    kw = dict(damping=damping, iters=iters, src_col=src_col,
              dst_col=dst_col, w_col=w_col)
    if upper <= broadcast_cap:
        return pagerank(packed, **kw)
    return pagerank_sharded(packed, num_partitions=num_partitions, **kw)


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
