"""Long-lived query serving loop.

The reference serves queries from a persistent process chain
(``express-server/src/app/index.ts:175-203`` → search-engine loop at
``search-engine/main.go:90-174``) where state (DB connections, corpus
heap) outlives any single query. The batch analog so far was
``QueryScorer`` inside one ``map_batches`` execution — warm only for
that Dataset's lifetime. ``QueryService`` keeps a pool of engine
ACTORS warm across invocations: segments, manifests and the per-term
LRU cache load once per replica and serve every subsequent call until
``shutdown()`` — the natural serving face of the engine on a cluster
(replicas spread over nodes; each holds only its term cache, postings
stay on disk/object store and are read via predicate pushdown).

Raw ``@ray.remote`` actors are justified here: a request/response
serving loop is exactly what the Dataset API does not model.
"""

from __future__ import annotations

import time as _time


class _EngineReplica:
    """One warm engine replica (actor body).

    ``reload_secs`` enables LIVE RELOAD: at most once per interval the
    replica compares the index's metadata fingerprint
    (``IndexLayout.version_token`` — manifest bytes, tombstone stat,
    segment list; no postings read) and rebuilds its engine when the
    index changed underneath it. This closes the reference's
    grow-by-crawling loop at serve time (``crawler/main.go:84-112`` →
    MySQL upsert → the next ``GET /search`` sees the new pages): here,
    an ``append``/``delete`` published to the index directory is
    visible to the warm service within one interval, with no restart.
    ``reload_secs=0`` checks on every call (the test/determinism mode).
    """

    def __init__(self, index_dir: str, cache_terms: int = 4096,
                 reload_secs: float | None = None):
        from zensearch_ray.pipelines.alias import resolve_if_alias
        from zensearch_ray.pipelines.query import QueryEngine

        self._index_dir = index_dir  # may be an ALIAS file (alias.py)
        self._cache_terms = cache_terms
        self._reload_secs = reload_secs
        self.engine = QueryEngine(
            resolve_if_alias(index_dir), cache_terms=cache_terms
        )
        if reload_secs is not None:
            self._token = self._current_token()
            self._last_check = _time.monotonic()

    def _current_token(self):
        # covers BOTH the alias target (a swap re-points traffic) and
        # the target index's own version token (append/delete in place)
        from zensearch_ray.pipelines.alias import resolve_if_alias
        from zensearch_ray.state.manifest import IndexLayout

        target = resolve_if_alias(self._index_dir)
        return (target, IndexLayout(target).version_token())

    def refresh(self) -> bool:
        """Reload the engine if the index (or alias target) changed;
        True if reloaded."""
        from zensearch_ray.pipelines.query import QueryEngine

        token = self._current_token()
        if token == getattr(self, "_token", None):
            return False
        self.engine = QueryEngine(token[0], cache_terms=self._cache_terms)
        self._token = token
        return True

    def _maybe_reload(self) -> None:
        if self._reload_secs is None:
            return
        now = _time.monotonic()
        if now - self._last_check >= self._reload_secs:
            self._last_check = now
            self.refresh()

    def search(self, query: str, k: int, mode: str, docs: bool,
               filter: tuple | None = None, rescore: str | None = None):
        self._maybe_reload()
        if rescore is not None:
            # two-phase phrase rescore (needs the positional index);
            # window stays the engine default — serving knobs beyond
            # that go through the engine API
            hits = self.engine.topk_rescored(query, rescore, k=k)
            if not docs:
                return hits
            from zensearch_ray.pipelines.query import resolve_docs

            return resolve_docs(self.engine.layout, hits)
        if filter is not None:
            col, value = filter
            hits = self.engine.topk_filtered(query, col, value, k)
            if not docs:
                return hits
            from zensearch_ray.pipelines.query import resolve_docs

            return resolve_docs(self.engine.layout, hits)
        if docs:
            return self.engine.topk_docs(query, k=k, mode=mode)
        fn = {
            "exhaustive": self.engine.topk,
            "pruned": self.engine.topk_pruned,
            "and": self.engine.topk_and,
            "phrase": self.engine.topk_phrase,
            "phrase_prefix": self.engine.topk_phrase_prefix,
            "near": lambda q, kk: self.engine.topk_near(q, 8, kk),
            "seq": lambda q, kk: self.engine.topk_seq(q, 8, kk),
            "prefix": self.engine.topk_prefix,
            "fuzzy": self.engine.topk_fuzzy,
            "fuzzy2": lambda q, kk: self.engine.topk_fuzzy(
                q, kk, max_dist=2),
            "not": self.engine.topk_not,
            "bool": self.engine.topk_bool,
            "wildcard": self.engine.topk_wildcard,
            "regex": self.engine.topk_regex,
            "boosted": self.engine.topk_boosted,
            "msm": self.engine.topk_msm,
            "dismax": self.engine.topk_dismax,
            "fvf": lambda q, kk: self.engine.topk_fvf(q, "doc_len", kk),
            "bmw": self.engine.topk_bmw,
        }[mode]
        return fn(query, k)

    def search_many(self, queries: list[str], k: int, mode: str, docs: bool,
                    filter: tuple | None = None):
        return [self.search(q, k, mode, docs, filter) for q in queries]

    def facet_counts(self, query: str, col: str):
        self._maybe_reload()
        return self.engine.facet_counts(query, col)

    def complete(self, prefix: str, k: int):
        self._maybe_reload()
        return self.engine.autocomplete(prefix, k)

    def suggest(self, query: str):
        self._maybe_reload()
        return self.engine.suggest(query)

    def explain(self, query: str, k: int, doc_id: int | None = None):
        self._maybe_reload()
        return self.engine.explain(query, k=k, doc_id=doc_id)

    def pid(self) -> int:
        import os

        return os.getpid()


class QueryService:
    """Warm actor-pool query service over a built index.

    >>> svc = QueryService(index_dir, replicas=4)
    >>> svc.search("ray data engine")            # (doc_id, score) pairs
    >>> svc.search("ray data", docs=True)        # resolved url/title rows
    >>> svc.search_batch(list_of_queries)        # fan-out across replicas
    >>> svc.shutdown()

    Also usable as a context manager. Replica placement is left to Ray
    (on a cluster, ``replicas`` ≈ number of serving cores; each replica
    is one ``num_cpus=1`` actor).
    """

    def __init__(self, index_dir: str, replicas: int = 2, k: int = 10,
                 mode: str = "exhaustive", cache_terms: int = 4096,
                 reload_secs: float | None = None):
        import ray

        self._k = k
        self._mode = mode
        actor_cls = ray.remote(num_cpus=1)(_EngineReplica)
        self._replicas = [
            actor_cls.remote(index_dir, cache_terms, reload_secs)
            for _ in range(replicas)
        ]
        self._rr = 0

    def refresh(self) -> list[bool]:
        """Force every replica to re-check the index version now (the
        push form of live reload); returns per-replica reloaded flags."""
        import ray

        return ray.get([a.refresh.remote() for a in self._replicas])

    def _next(self):
        a = self._replicas[self._rr % len(self._replicas)]
        self._rr += 1
        return a

    def search(self, query: str, k: int | None = None, mode: str | None = None,
               docs: bool = False, filter: tuple | None = None,
               rescore: str | None = None):
        """``filter=(col, value)`` serves faceted search (exhaustive
        evaluation, Lucene filter-query semantics) through the warm
        replicas; each replica's facet lookup loads once and stays.
        ``rescore=phrase`` serves the two-phase phrase rescore (needs
        an index built with positions)."""
        import ray

        # `k if k is not None` — NOT `k or`: an explicit k=0 must mean
        # "zero results", not silently substitute the default
        return ray.get(
            self._next().search.remote(
                query, self._k if k is None else k,
                mode or self._mode, docs, filter,
                rescore,
            )
        )

    def search_batch(self, queries: list[str], k: int | None = None,
                     mode: str | None = None, docs: bool = False,
                     filter: tuple | None = None):
        """Fan a query list across all replicas; results in input order."""
        import ray

        n = len(self._replicas)
        shards: list[list[int]] = [[] for _ in range(n)]
        for i in range(len(queries)):
            shards[i % n].append(i)
        futs = [
            self._replicas[r].search_many.remote(
                [queries[i] for i in shards[r]],
                self._k if k is None else k,
                mode or self._mode, docs, filter,
            )
            for r in range(n)
            if shards[r]
        ]
        out: list = [None] * len(queries)
        for r, res in zip([r for r in range(n) if shards[r]], ray.get(futs)):
            for i, item in zip(shards[r], res):
                out[i] = item
        return out

    def facet_counts(self, query: str, col: str):
        """Result-page facet sidebar through a warm replica (each
        replica's facet lookup loads once and stays)."""
        import ray

        return ray.get(self._next().facet_counts.remote(query, col))

    def complete(self, prefix: str, k: int = 10):
        """Search-box completion through a warm replica."""
        import ray

        return ray.get(self._next().complete.remote(prefix, k))

    def suggest(self, query: str):
        """Per-token did-you-mean through a warm replica."""
        import ray

        return ray.get(self._next().suggest.remote(query))

    def explain(self, query: str, k: int = 10, doc_id: int | None = None):
        """Per-term BM25 score breakdown through a warm replica — the
        Lucene-Explanation surface (``QueryEngine.explain``)."""
        import ray

        return ray.get(self._next().explain.remote(query, k, doc_id))

    def replica_pids(self) -> list[int]:
        import ray

        return ray.get([a.pid.remote() for a in self._replicas])

    def shutdown(self) -> None:
        import ray

        for a in self._replicas:
            ray.kill(a)
        self._replicas = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
        return False


class _ShardReplica:
    """Actor owning a subset of TERM shards: computes per-term partial
    contribution vectors for the terms routed to it. Postings of other
    shards are never read — on a cluster each node holds (or
    page-caches) only its shard subset of the index."""

    def __init__(self, index_dir: str, cache_terms: int = 4096):
        from zensearch_ray.pipelines.query import QueryEngine

        self.engine = QueryEngine(index_dir, cache_terms=cache_terms)

    def term_partials(self, terms: list[str]):
        """term → (doc_ids, idf·tf_norm contributions) for each term
        with df > 0 and idf > 0. Arrays are numpy (zero-copy through the
        object store); the wire cost is Σ df(term) rows — the inherent
        exchange of any distributed term-at-a-time scorer."""
        from zensearch_ray.functions.bm25 import idf, tf_norm

        e = self.engine
        out = {}
        for t in set(terms):
            p = e.lookup(t)
            if p is None:
                continue
            w = idf(e.n_docs, p.df)
            if w == 0.0:
                continue
            ids, tfs, dls = p.decode_all()
            out[t] = (ids, w * tf_norm(tfs, dls, e.avgdl, e.params))
        return out


class ShardedQueryService:
    """Horizontally sharded query serving: the index's TERM shards are
    partitioned across worker actors; a query routes each token to the
    actor owning its shard (`hash(term) % num_shards`, the same routing
    the build uses), workers return per-term partial contribution
    vectors, and the driver assembles them in exact query-plan order —
    the result is BIT-IDENTICAL to ``QueryEngine.topk`` (same kernels,
    same accumulation order; asserted in ``tests/test_service.py``).

    This is the multi-node serving shape (reference analog: the single
    search-engine process at ``search-engine/main.go:90-174`` scaled
    out): per-node state is one shard subset, queries cost one RPC per
    distinct owning worker, and adding workers repartitions shards
    without touching the index. Pruned/MaxScore evaluation needs global
    coordination, so the sharded path serves exhaustive OR scoring;
    single-node replicas (``QueryService``) remain the pruned path.
    """

    def __init__(self, index_dir: str, workers: int = 4,
                 cache_terms: int = 4096):
        import ray

        from zensearch_ray.state.manifest import IndexLayout

        self._layout = IndexLayout(index_dir)
        manifest = self._layout.read_manifest()
        self.num_shards = int(manifest["num_shards"])
        workers = max(1, min(workers, self.num_shards))
        actor_cls = ray.remote(num_cpus=1)(_ShardReplica)
        self._workers = [
            actor_cls.remote(index_dir, cache_terms) for _ in range(workers)
        ]
        # shard → worker: round-robin keeps Zipf-head terms spread out
        self._route = [s % workers for s in range(self.num_shards)]
        # driver-side metadata engine: facet lookups + docmeta resolve
        # only — it never decodes postings (those live on the workers)
        self._meta_engine = None

    def _meta(self):
        if self._meta_engine is None:
            from zensearch_ray.pipelines.query import QueryEngine

            self._meta_engine = QueryEngine(self._layout.root)
        return self._meta_engine

    def _gather(self, terms: set[str]) -> dict:
        import ray

        from zensearch_ray.functions.ids import term_shard

        by_worker: dict[int, list[str]] = {}
        for t in terms:
            w = self._route[term_shard(t, self.num_shards)]
            by_worker.setdefault(w, []).append(t)
        futs = [
            self._workers[w].term_partials.remote(sorted(ts))
            for w, ts in sorted(by_worker.items())
        ]
        merged: dict = {}
        for part in ray.get(futs):
            merged.update(part)
        return merged

    def _assemble(self, toks: list[str], term_map: dict, k: int,
                  filter: tuple | None = None):
        """Exactly ``QueryEngine._score_plan`` over the gathered
        partials, in tokenize() order with multiplicity — float
        accumulation order matches the single-engine path bit for bit.
        ``filter=(col, value)`` applies the driver-side facet mask
        (docmeta-only lookup) before top-k — identical semantics to
        ``QueryEngine.topk_filtered``."""
        import numpy as np

        from zensearch_ray.functions.bm25 import topk_order

        all_ids = [term_map[t][0] for t in toks if t in term_map]
        all_contrib = [term_map[t][1] for t in toks if t in term_map]
        if not all_ids:
            return []
        ids = np.concatenate(all_ids)
        contrib = np.concatenate(all_contrib)
        uniq, inv = np.unique(ids, return_inverse=True)
        scores = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(scores, inv, contrib)
        mask = scores > 0.0
        if filter is not None:
            col, value = filter
            mask &= self._meta()._facet_member_mask(uniq, col, value)
        top_ids, top_sc = topk_order(uniq[mask], scores[mask], k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk(self, query: str, k: int = 10, filter: tuple | None = None):
        from zensearch_ray.functions.text import tokenize

        toks = tokenize(query)
        if not toks:
            return []
        return self._assemble(toks, self._gather(set(toks)), k, filter)

    def topk_bool(self, query: str, k: int = 10) -> list:
        """Boolean retrieval through the shard workers: one gather of
        FULL per-term postings (ids + contributions) for every term in
        the expression — negated terms included, membership needs them
        — then the same posting-set algebra and filter-then-rank
        scoring as ``QueryEngine.topk_bool``, assembled on the driver
        (results identical; asserted in tests). NOT complements
        against the caller-side docmeta universe (metadata-scale)."""
        import numpy as np

        from zensearch_ray.functions.boolquery import (
            all_terms,
            parse_bool,
            scoring_terms,
        )

        ast = parse_bool(query)
        term_map = self._gather(set(all_terms(ast)))

        def ids_of(t: str) -> np.ndarray:
            return (
                term_map[t][0] if t in term_map else np.empty(0, dtype=np.int64)
            )

        def ev(node) -> np.ndarray:
            kind = node[0]
            if kind == "term":
                return ids_of(node[1])
            if kind == "and":
                parts = sorted((ev(c) for c in node[1]), key=len)
                cand = parts[0]
                for ids in parts[1:]:
                    if not len(cand):
                        break
                    cand = cand[np.isin(cand, ids, assume_unique=True)]
                return cand
            if kind == "or":
                return np.unique(np.concatenate([ev(c) for c in node[1]]))
            return np.setdiff1d(
                self._meta()._universe(), ev(node[1]), assume_unique=True
            )

        cand = ev(ast)
        if not len(cand):
            return []
        from zensearch_ray.functions.bm25 import topk_order

        scores = np.zeros(len(cand), dtype=np.float64)
        for t in scoring_terms(ast):
            if t not in term_map:
                continue
            ids, contrib = term_map[t]
            m = np.isin(ids, cand, assume_unique=True)
            if not m.any():
                continue
            scores[np.searchsorted(cand, ids[m])] += contrib[m]
        top_ids, top_sc = topk_order(cand, scores, k)
        return list(zip(top_ids.tolist(), top_sc.tolist()))

    def topk_docs(self, query: str, k: int = 10, filter: tuple | None = None):
        """Ranked url/title rows — docmeta resolves on the CALLER
        (metadata-sized predicate-pushdown read), scoring on the
        shard workers."""
        from zensearch_ray.pipelines.query import resolve_docs

        return resolve_docs(self._layout, self.topk(query, k, filter))

    def topk_batch(self, queries: list[str], k: int = 10):
        """Bulk path: ONE round-trip per worker for the union of all
        queries' terms, then per-query assembly on the driver."""
        from zensearch_ray.functions.text import tokenize

        tok_lists = [tokenize(q) for q in queries]
        union = {t for toks in tok_lists for t in toks}
        if not union:
            return [[] for _ in queries]
        term_map = self._gather(union)
        return [
            self._assemble(toks, term_map, k) if toks else []
            for toks in tok_lists
        ]

    def shutdown(self) -> None:
        import ray

        for a in self._workers:
            ray.kill(a)
        self._workers = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
        return False
