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


class _EngineReplica:
    """One warm engine replica (actor body)."""

    def __init__(self, index_dir: str, cache_terms: int = 4096):
        from zensearch_ray.pipelines.query import QueryEngine

        self.engine = QueryEngine(index_dir, cache_terms=cache_terms)

    def search(self, query: str, k: int, mode: str, docs: bool):
        if docs:
            return self.engine.topk_docs(query, k=k, mode=mode)
        fn = {
            "exhaustive": self.engine.topk,
            "pruned": self.engine.topk_pruned,
            "and": self.engine.topk_and,
            "phrase": self.engine.topk_phrase,
            "near": lambda q, kk: self.engine.topk_near(q, 8, kk),
            "prefix": self.engine.topk_prefix,
            "fuzzy": self.engine.topk_fuzzy,
        }[mode]
        return fn(query, k)

    def search_many(self, queries: list[str], k: int, mode: str, docs: bool):
        return [self.search(q, k, mode, docs) for q in queries]

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
                 mode: str = "exhaustive", cache_terms: int = 4096):
        import ray

        self._k = k
        self._mode = mode
        actor_cls = ray.remote(num_cpus=1)(_EngineReplica)
        self._replicas = [
            actor_cls.remote(index_dir, cache_terms) for _ in range(replicas)
        ]
        self._rr = 0

    def _next(self):
        a = self._replicas[self._rr % len(self._replicas)]
        self._rr += 1
        return a

    def search(self, query: str, k: int | None = None, mode: str | None = None,
               docs: bool = False):
        import ray

        return ray.get(
            self._next().search.remote(
                query, k or self._k, mode or self._mode, docs
            )
        )

    def search_batch(self, queries: list[str], k: int | None = None,
                     mode: str | None = None, docs: bool = False):
        """Fan a query list across all replicas; results in input order."""
        import ray

        n = len(self._replicas)
        shards: list[list[int]] = [[] for _ in range(n)]
        for i in range(len(queries)):
            shards[i % n].append(i)
        futs = [
            self._replicas[r].search_many.remote(
                [queries[i] for i in shards[r]], k or self._k,
                mode or self._mode, docs,
            )
            for r in range(n)
            if shards[r]
        ]
        out: list = [None] * len(queries)
        for r, res in zip([r for r in range(n) if shards[r]], ray.get(futs)):
            for i, item in zip(shards[r], res):
                out[i] = item
        return out

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
