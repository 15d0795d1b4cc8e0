"""Warm query service: result parity with the direct engine, replica
warmness across invocations, batch fan-out ordering."""

import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.pipelines.service import QueryService


@pytest.fixture(scope="module")
def service_index(ray_session, pages_small, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("svc_idx"))
    build_index(
        pages_small, d,
        BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en"),
    )
    return d


def test_service_matches_engine_and_stays_warm(service_index):
    engine = QueryEngine(service_index)
    queries = ["search engine ranking", "the of and", "café straße", "data web"]
    with QueryService(service_index, replicas=2) as svc:
        pids_before = set(svc.replica_pids())
        assert len(pids_before) == 2
        for q in queries:
            assert svc.search(q) == engine.topk(q, 10), q
            assert svc.search(q, mode="and") == engine.topk_and(q, 10), q
        # second round of calls hits the SAME warm replicas
        for q in queries:
            svc.search(q)
        assert set(svc.replica_pids()) == pids_before

        docs = svc.search("search engine", docs=True)
        assert docs and {"rank", "doc_id", "url", "title", "score"} <= set(docs[0])

        batch = svc.search_batch(queries * 3, k=5)
        assert len(batch) == len(queries) * 3
        for q, res in zip(queries * 3, batch):
            assert res == engine.topk(q, 5), q


def test_service_positional_modes(ray_session, pages_small, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("svc_pos_idx"))
    build_index(
        pages_small, d,
        BuildConfig(
            num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en",
            positions=True,
        ),
    )
    engine = QueryEngine(d)
    with QueryService(d, replicas=1) as svc:
        for q in ["web search", "search engine"]:
            assert svc.search(q, mode="phrase") == engine.topk_phrase(q, 10), q
            assert svc.search(q, mode="near") == engine.topk_near(q, 8, 10), q
        assert svc.search("se", mode="prefix") == engine.topk_prefix("se", 10)


def test_query_scorer_modes(ray_session, pages_small, tmp_path_factory):
    """QueryScorer serves phrase/near through the actor pool, matching
    the direct engine per query."""
    import ray.data as rd

    from zensearch_ray.pipelines.query import QueryScorer

    d = str(tmp_path_factory.mktemp("scorer_pos_idx"))
    build_index(
        pages_small, d,
        BuildConfig(
            num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en",
            positions=True,
        ),
    )
    engine = QueryEngine(d)
    queries = ["web search", "search engine", "the of"]
    qds = rd.from_items(
        [{"query_id": i, "query": q} for i, q in enumerate(queries)]
    )
    out = qds.map_batches(
        QueryScorer,
        fn_constructor_kwargs={"index_dir": d, "k": 5, "mode": "phrase"},
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    for i, q in enumerate(queries):
        got = [
            (r.doc_id, r.score)
            for r in out[out["query_id"] == i].sort_values("rank").itertuples()
        ]
        assert got == engine.topk_phrase(q, 5), q


def test_sharded_service_bit_identical_to_engine(service_index):
    from zensearch_ray.pipelines.service import ShardedQueryService

    engine = QueryEngine(service_index)
    queries = [
        "search engine ranking", "the of and", "café straße naïve",
        "query data web site host text title", "zzz-not-a-word", "the",
    ]
    for workers in (1, 3):
        with ShardedQueryService(service_index, workers=workers) as svc:
            for q in queries:
                assert svc.topk(q, 10) == engine.topk(q, 10), (workers, q)
            batch = svc.topk_batch(queries, k=10)
            assert batch == [engine.topk(q, 10) for q in queries]
            assert svc.topk("", 10) == []
            assert svc.topk_batch([""]) == [[]]


def test_sharded_service_workers_cap_at_shards(service_index):
    from zensearch_ray.pipelines.service import ShardedQueryService

    # index has 4 shards; asking for 16 workers must not spawn idle ones
    with ShardedQueryService(service_index, workers=16) as svc:
        assert len(svc._workers) == 4
        assert svc.topk("search engine", 5) == QueryEngine(service_index).topk(
            "search engine", 5
        )


def test_sharded_service_resolves_docs(service_index):
    from zensearch_ray.pipelines.service import ShardedQueryService

    engine = QueryEngine(service_index)
    with ShardedQueryService(service_index, workers=2) as svc:
        rows = svc.topk_docs("search engine", k=5)
        want = engine.topk_docs("search engine", k=5, mode="exhaustive")
        assert rows == want
        assert rows and {"rank", "doc_id", "url", "title", "score"} <= set(rows[0])
