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


def test_live_reload_sees_appends_and_deletes(ray_session, tmp_path_factory):
    """The grow-by-crawling loop at serve time: a warm service must pick
    up an append (new docs rankable) and a delete (tombstones honored)
    without restart, via the version-token reload."""
    import pyarrow.parquet as pq

    from zensearch_ray.pipelines.delete import delete_docs
    from zensearch_ray.sources.pages import generate_pages_table
    from zensearch_ray.state.manifest import IndexLayout

    root = tmp_path_factory.mktemp("reload")
    t = generate_pages_table(120, seed=23)
    a, b = str(root / "a.parquet"), str(root / "b.parquet")
    pq.write_table(t.slice(0, 70), a, row_group_size=32)
    pq.write_table(t.slice(70, 50), b, row_group_size=32)
    idx = str(root / "idx")
    cfg = BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")
    build_index(a, idx, cfg)

    layout = IndexLayout(idx)
    tok0 = layout.version_token()
    assert layout.version_token() == tok0  # stable when nothing changed

    q = "search engine"
    with QueryService(idx, replicas=2, reload_secs=0.0) as svc:
        before = svc.search(q, k=50)
        build_index(b, idx, cfg, append=True)
        assert layout.version_token() != tok0
        after = svc.search(q, k=50)
        assert after == QueryEngine(idx).topk(q, 50)
        assert after != before  # the appended docs changed the ranking
        # both replicas reloaded (round-robin: ask twice more)
        assert svc.search(q, k=50) == after

        dead = [d for d, _ in after[:2]]
        delete_docs(idx, doc_ids=dead)
        got = svc.search(q, k=50)
        assert not ({d for d, _ in got} & set(dead))
        assert got == QueryEngine(idx).topk(q, 50)


def test_refresh_is_explicit_push(ray_session, tmp_path_factory):
    """Without reload_secs the service serves a stable snapshot until
    refresh() is called (the push form)."""
    import pyarrow.parquet as pq

    from zensearch_ray.sources.pages import generate_pages_table

    root = tmp_path_factory.mktemp("push")
    t = generate_pages_table(100, seed=29)
    a, b = str(root / "a.parquet"), str(root / "b.parquet")
    pq.write_table(t.slice(0, 60), a, row_group_size=32)
    pq.write_table(t.slice(60, 40), b, row_group_size=32)
    idx = str(root / "idx")
    cfg = BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")
    build_index(a, idx, cfg)

    q = "search engine"
    with QueryService(idx, replicas=1, reload_secs=None) as svc:
        snap = svc.search(q, k=50)
        build_index(b, idx, cfg, append=True)
        assert svc.search(q, k=50) == snap  # snapshot isolation
        assert svc.refresh() == [True]
        assert svc.search(q, k=50) == QueryEngine(idx).topk(q, 50)
        assert svc.refresh() == [False]  # nothing new → no reload


def test_sharded_service_bool_identical_to_engine(service_index):
    from zensearch_ray.pipelines.service import ShardedQueryService

    engine = QueryEngine(service_index)
    exprs = [
        "search AND engine",
        "(search OR web) AND site -engine",
        "NOT the",
        "search engine -zzznotaword",
        "(search OR NOT search)",
    ]
    with ShardedQueryService(service_index, workers=3) as svc:
        for q in exprs:
            assert svc.topk_bool(q, 10) == engine.topk_bool(q, 10), q
