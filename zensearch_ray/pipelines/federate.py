"""Federated (doc-sharded) scatter-gather search over multiple
independently built index artifacts — the second half of the
distributed-serving story. ``ShardedQueryService`` (service.py)
partitions one artifact's TERM shards across workers; this module
federates SEPARATE artifacts that each index a disjoint document
subset (one per crawl batch / cluster / tenant), which is the shape a
256-node deployment actually runs: every node builds and owns the
index of its own corpus slice, and a query fans out to all of them.
Reference analog: the reference runs ONE search-engine process over
one MySQL corpus (``search-engine/main.go:90-174``); federation is
how that surface survives a corpus that no longer fits one node.

Exactness contract. Doc-partitioned shards are disjoint, so the union
top-k is the k-sized merge of per-shard top-k lists PROVIDED every
shard scores under the GLOBAL corpus statistics. A naive federation
that lets each shard apply its local idf/avgdl is subtly wrong — the
same document's score would change with its neighbors' shard
assignment. The two-phase protocol here is Elasticsearch's
``dfs_query_then_fetch`` made exact:

  phase 1 (stats): each shard reports df per query term (a dict-sized
    message); N and Σdl combine from manifest metadata (`n_docs`,
    `sum_dl` — the same exact-integer combine ``merge_indexes`` uses,
    compact.py:359-365).
  phase 2 (score): every shard scores its local postings under the
    broadcast global (idf, avgdl) and returns its LOCAL top-k; the
    driver merges S·k rows by (score DESC, doc_id ASC).

Because both phases use the engine's own kernels (`idf`, `tf_norm`,
`topk_order`) in the same accumulation order as ``QueryEngine.topk``,
a federated query over any doc-partition of a corpus is BIT-IDENTICAL
to a one-shot build over the union (asserted in tests/test_federate.py
and value-checked against the DuckDB BM25 oracle by the
``federated_topk`` driver entry).

Scale shape: per query, each shard does one dictionary probe per term
(phase 1) and one postings scan of its local lists (phase 2); wire
traffic is O(terms + k) per shard, independent of corpus size. Shards
never exchange postings. Adding a crawl batch = building one new
shard artifact and appending it to the service's list — no rebuild,
no merge, no downtime (contrast ``merge_indexes``, which folds
artifacts into one for single-node serving).
"""

from __future__ import annotations

import numpy as np

from zensearch_ray.functions.bm25 import idf, tf_norm, topk_order
from zensearch_ray.functions.text import tokenize


def _local_topk(engine, toks: list[str], idf_by_term: dict[str, float],
                avgdl_g: float, k: int, id_offset: int = 0):
    """Score one shard's postings under broadcast global stats —
    exactly ``QueryEngine._accumulate_plan`` + ``_score_plan`` with
    (idf, avgdl) overridden; same term order, same float accumulation
    order, so per-doc sums are bit-identical to the union engine."""
    all_ids, all_contrib = [], []
    for t in toks:  # multiplicity preserved, like _term_plan
        w = idf_by_term.get(t, 0.0)
        if w == 0.0:
            continue
        p = engine.lookup(t)
        if p is None:
            continue  # term lives only in other shards
        ids, tfs, dls = p.decode_all()
        all_ids.append(ids)
        all_contrib.append(w * tf_norm(tfs, dls, avgdl_g, engine.params))
    if not all_ids:
        return []
    ids = np.concatenate(all_ids)
    contrib = np.concatenate(all_contrib)
    uniq, inv = np.unique(ids, return_inverse=True)
    scores = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(scores, inv, contrib)
    mask = scores > 0.0
    top_ids, top_sc = topk_order(uniq[mask], scores[mask], k)
    if id_offset:
        top_ids = top_ids + id_offset
    return list(zip(top_ids.tolist(), top_sc.tolist()))


def _merge_topk(per_shard: list[list[tuple[int, float]]], k: int):
    """k-sized driver merge of disjoint shard lists by
    (score DESC, doc_id ASC) — the engine's own tie order."""
    rows = [r for lst in per_shard for r in lst]
    if not rows:
        return []
    ids = np.array([d for d, _ in rows], dtype=np.int64)
    sc = np.array([s for _, s in rows], dtype=np.float64)
    top_ids, top_sc = topk_order(ids, sc, k)
    return list(zip(top_ids.tolist(), top_sc.tolist()))


class FederatedEngine:
    """In-process federation over shard index dirs (the test/referee
    face; ``FederatedService`` is the warm-actor serving face).

    ``id_offsets`` relocates shard-local dense ids into a union id
    space (the ``merge_indexes`` convention: shard i's ids +=
    Σ id_ceiling of shards < i). Artifacts indexed with a global id
    column — like the driver entries' ``id_col='doc_id'`` builds over
    doc_id-disjoint subsets — need no offsets (the default).
    """

    def __init__(self, index_dirs: list[str], cache_terms: int = 4096,
                 id_offsets: list[int] | None = None):
        from zensearch_ray.pipelines.query import QueryEngine
        from zensearch_ray.state.manifest import IndexLayout

        if not index_dirs:
            raise ValueError("FederatedEngine needs at least one shard dir")
        self.engines = [QueryEngine(d, cache_terms) for d in index_dirs]
        self.offsets = list(id_offsets or [0] * len(index_dirs))
        if len(self.offsets) != len(index_dirs):
            raise ValueError("id_offsets length must match index_dirs")
        n_docs, sum_dl = 0, 0
        for d, e in zip(index_dirs, self.engines):
            m = IndexLayout(d).read_manifest()
            if len(e.deleted):
                raise ValueError(
                    f"shard {d} carries tombstones; compact it first "
                    "(federated df/stats assume tombstone-free shards, "
                    "same contract as merge_indexes)")
            n_docs += int(m["n_docs"])
            sum_dl += int(m.get("sum_dl") or round(m["avgdl"] * m["n_docs"]))
        self.n_docs = n_docs
        # exact union avgdl — identical float to a one-shot build's
        self.avgdl = sum_dl / n_docs if n_docs else 0.0

    def _global_idf(self, toks: list[str]) -> dict[str, float]:
        """Phase 1: global df per distinct term = Σ shard df (shards
        are doc-disjoint), then idf under the union N."""
        out: dict[str, float] = {}
        for t in set(toks):
            df_g = sum(e.df(t) for e in self.engines)
            out[t] = idf(self.n_docs, df_g)
        return out

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        toks = tokenize(query)
        if not toks:
            return []
        idf_by_term = self._global_idf(toks)
        per_shard = [
            _local_topk(e, toks, idf_by_term, self.avgdl, k, off)
            for e, off in zip(self.engines, self.offsets)
        ]
        return _merge_topk(per_shard, k)


class _FederatedShard:
    """One warm shard worker: holds its artifact's ``QueryEngine``;
    answers df probes (phase 1) and scores under broadcast global
    stats (phase 2). Wrapped with ``ray.remote`` at service start —
    on a real cluster each actor is scheduled on the node that built
    (and locally stores) its artifact."""

    def __init__(self, index_dir: str, id_offset: int = 0,
                 cache_terms: int = 4096):
        from zensearch_ray.pipelines.query import QueryEngine

        self.engine = QueryEngine(index_dir, cache_terms)
        self.offset = int(id_offset)

    def df_many(self, terms: list[str]) -> list[int]:
        return [self.engine.df(t) for t in terms]

    def topk_global(self, query: str, k: int,
                    idf_by_term: dict[str, float], avgdl_g: float):
        return _local_topk(self.engine, tokenize(query), idf_by_term,
                           avgdl_g, k, self.offset)

    def topk_global_batch(self, queries: list[str], k: int,
                          idf_by_query: list[dict[str, float]],
                          avgdl_g: float):
        return [
            _local_topk(self.engine, tokenize(q), m, avgdl_g, k, self.offset)
            for q, m in zip(queries, idf_by_query)
        ]

    def pid(self) -> int:
        import os

        return os.getpid()


class FederatedService:
    """Warm scatter-gather serving over shard artifacts: one Ray actor
    per shard (num_cpus=1), two k-/dict-sized RPCs per shard per query.
    Results are bit-identical to ``FederatedEngine`` (same kernels) and
    therefore to a one-shot union build."""

    def __init__(self, index_dirs: list[str], cache_terms: int = 4096,
                 id_offsets: list[int] | None = None,
                 replicas_per_shard: int = 1):
        import ray

        from zensearch_ray.state.manifest import IndexLayout

        offsets = list(id_offsets or [0] * len(index_dirs))
        actor = ray.remote(num_cpus=1)(_FederatedShard)
        # replicas_per_shard > 1 scales per-shard THROUGHPUT: each
        # query still touches every shard (latency is per-query shard
        # work), but concurrent queries and batches spread across an
        # S × R actor grid instead of serializing on one CPU per
        # shard — the 10M soak measured batch-200 bound at exactly
        # one-CPU-per-shard compute (BASELINE §8)
        self._replica_grid = [
            [actor.remote(d, off, cache_terms)
             for _ in range(max(1, replicas_per_shard))]
            for d, off in zip(index_dirs, offsets)
        ]
        self._rr = 0
        self._shards = [grid[0] for grid in self._replica_grid]
        n_docs, sum_dl = 0, 0
        for d in index_dirs:
            m = IndexLayout(d).read_manifest()
            n_docs += int(m["n_docs"])
            sum_dl += int(m.get("sum_dl") or round(m["avgdl"] * m["n_docs"]))
        self.n_docs = n_docs
        self.avgdl = sum_dl / n_docs if n_docs else 0.0

    def _idf_gather(self, queries: list[str]) -> list[dict[str, float]]:
        """Phase 1 over all queries at once: ONE df RPC per shard for
        the union of distinct terms, then per-query idf maps."""
        import ray

        union = sorted({t for q in queries for t in tokenize(q)})
        if not union:
            return [{} for _ in queries]
        dfs = ray.get([s.df_many.remote(union) for s in self._shards])
        df_g = {t: sum(col[i] for col in dfs) for i, t in enumerate(union)}
        idf_g = {t: idf(self.n_docs, d) for t, d in df_g.items()}
        return [{t: idf_g[t] for t in set(tokenize(q))} for q in queries]

    def _pick(self, grid_row: list):
        """Round-robin replica within one shard's column."""
        return grid_row[self._rr % len(grid_row)]

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        import ray

        idf_by_term = self._idf_gather([query])[0]
        self._rr += 1
        per_shard = ray.get([
            self._pick(row).topk_global.remote(
                query, k, idf_by_term, self.avgdl)
            for row in self._replica_grid
        ])
        return _merge_topk(per_shard, k)

    def topk_batch(self, queries: list[str], k: int = 10):
        """Bulk path: one df RPC per shard for the whole batch, then
        the batch SPLIT across each shard's replicas (per-query
        results still merge across all shards)."""
        import ray

        idf_by_query = self._idf_gather(queries)
        n_shards = len(self._replica_grid)
        futs = []  # (shard, [query indices], future)
        for s, row in enumerate(self._replica_grid):
            r = len(row)
            slots: list[list[int]] = [[] for _ in range(r)]
            for qi in range(len(queries)):
                slots[qi % r].append(qi)
            for rep, qidx in enumerate(slots):
                if qidx:
                    futs.append((s, qidx, row[rep].topk_global_batch.remote(
                        [queries[i] for i in qidx], k,
                        [idf_by_query[i] for i in qidx], self.avgdl)))
        per = [[None] * len(queries) for _ in range(n_shards)]
        for (s, qidx, f) in futs:
            for i, res in zip(qidx, ray.get(f)):
                per[s][i] = res
        return [
            _merge_topk([per[s][qi] for s in range(n_shards)], k)
            for qi in range(len(queries))
        ]

    def shard_pids(self) -> list[int]:
        import ray

        return ray.get([a.pid.remote()
                        for row in self._replica_grid for a in row])

    def shutdown(self) -> None:
        import ray

        for row in self._replica_grid:
            for a in row:
                ray.kill(a)
        self._replica_grid = []
        self._shards = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
