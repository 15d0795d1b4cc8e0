"""HTTP serving front (GET /search over the warm QueryService): every
mode's response must be bit-identical to the direct ``QueryEngine``
call, plus docs resolution, per-request filter, facets, health, and
error surfaces — the reference's Express routes
(``express-server/src/app/index.ts:175-203``) re-expressed."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.http_server import SearchHTTPServer
from zensearch_ray.pipelines.query import QueryEngine, resolve_docs
from zensearch_ray.sources.pages import generate_pages_table


@pytest.fixture(scope="module")
def http_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("http_src")
    src = str(root / "pages.parquet")
    pq.write_table(generate_pages_table(300, seed=47), src, row_group_size=64)
    idx = str(root / "idx")
    build_index(
        src, idx,
        BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60,
                    lang=None, attrs=("lang",)),
    )
    return idx


@pytest.fixture(scope="module")
def server(http_index):
    with SearchHTTPServer(http_index, replicas=2, k=10) as srv:
        yield srv


def _get(srv, path: str, **params):
    q = urllib.parse.urlencode(params)
    url = f"http://{srv.host}:{srv.port}{path}" + (f"?{q}" if q else "")
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


MODE_CALLS = {
    "exhaustive": lambda eng, q, k: eng.topk(q, k),
    "pruned": lambda eng, q, k: eng.topk_pruned(q, k),
    "and": lambda eng, q, k: eng.topk_and(q, k),
    "prefix": lambda eng, q, k: eng.topk_prefix(q, k),
    "fuzzy": lambda eng, q, k: eng.topk_fuzzy(q, k),
    "fuzzy2": lambda eng, q, k: eng.topk_fuzzy(q, k, max_dist=2),
    "not": lambda eng, q, k: eng.topk_not(q, k),
    "bool": lambda eng, q, k: eng.topk_bool(q, k),
    "wildcard": lambda eng, q, k: eng.topk_wildcard(q, k),
    "regex": lambda eng, q, k: eng.topk_regex(q, k),
    "boosted": lambda eng, q, k: eng.topk_boosted(q, k),
    "msm": lambda eng, q, k: eng.topk_msm(q, k),
    "dismax": lambda eng, q, k: eng.topk_dismax(q, k),
    "fvf": lambda eng, q, k: eng.topk_fvf(q, "doc_len", k),
    "bmw": lambda eng, q, k: eng.topk_bmw(q, k),
}
MODE_QUERY = {
    "prefix": "se",
    "fuzzy": "serch engin",
    "fuzzy2": "serch engin",
    "bool": "search AND (engine OR ranking)",
    "wildcard": "se*ch",
    "regex": "s.arch",
    "not": "search -engine",
    "boosted": "search^2.5 engine",
}


def test_all_modes_bit_identical_to_engine(server, http_index):
    engine = QueryEngine(http_index)
    for mode, call in MODE_CALLS.items():
        q = MODE_QUERY.get(mode, "search engine ranking")
        status, body = _get(server, "/search", q=q, mode=mode, docs=0, k=10)
        assert status == 200, (mode, body)
        want = [[int(d), float(s)] for d, s in call(engine, q, 10)]
        assert body["results"] == want, mode
        assert body["mode"] == mode and body["query"] == q


def test_docs_resolution_matches_engine(server, http_index):
    engine = QueryEngine(http_index)
    status, body = _get(server, "/search", q="search engine", mode="pruned")
    assert status == 200
    want = resolve_docs(engine.layout, engine.topk_pruned("search engine", 10))
    assert body["results"] == json.loads(json.dumps(want))
    assert {"rank", "doc_id", "url", "title", "score"} <= set(body["results"][0])


def test_filter_param_serves_faceted_search(server, http_index):
    engine = QueryEngine(http_index)
    # pick a language that actually matches
    facets = engine.facet_counts("search engine", "lang")
    assert facets
    lang = facets[0][0]
    status, body = _get(server, "/search", q="search engine",
                        filter=f"lang={lang}", docs=0)
    assert status == 200 and body["mode"] == "exhaustive"
    want = [[int(d), float(s)]
            for d, s in engine.topk_filtered("search engine", "lang", lang, 10)]
    assert body["results"] == want


def test_rescore_param(server, http_index, ray_session, tmp_path_factory):
    # a positionless index surfaces the engine's error as a 400
    status, body = _get(server, "/search", q="search engine",
                        rescore="search engine", docs=0)
    assert status == 400 and "positions" in body["error"]
    # a positional index serves the two-phase rescore bit-identically
    root = tmp_path_factory.mktemp("http_pos")
    src = str(root / "pages.parquet")
    pq.write_table(generate_pages_table(200, seed=48), src, row_group_size=64)
    pidx = str(root / "idx")
    build_index(
        src, pidx,
        BuildConfig(num_shards=4, salt_subs=2, lang=None, positions=True),
    )
    with SearchHTTPServer(pidx, replicas=1, k=10) as srv:
        status, body = _get(srv, "/search", q="search engine ranking",
                            rescore="search engine", docs=0)
        assert status == 200
        assert body["rescore"] == "search engine"
        eng = QueryEngine(pidx)
        want = [[int(d), float(s)]
                for d, s in eng.topk_rescored(
                    "search engine ranking", "search engine", k=10)]
        assert body["results"] == want


def test_facets_endpoint(server, http_index):
    engine = QueryEngine(http_index)
    status, body = _get(server, "/facets", q="search engine", col="lang")
    assert status == 200
    want = [[v, int(c)] for v, c in engine.facet_counts("search engine", "lang")]
    assert body["facets"] == want


def test_complete_endpoint(server, http_index):
    engine = QueryEngine(http_index)
    status, body = _get(server, "/complete", prefix="se", k=5)
    assert status == 200
    want = [{"term": t, "df": d} for t, d in engine.autocomplete("se", 5)]
    assert body["completions"] == want and body["prefix"] == "se"
    status, body = _get(server, "/complete")
    assert status == 400 and "prefix" in body["error"]


def test_suggest_endpoint(server, http_index):
    engine = QueryEngine(http_index)
    status, body = _get(server, "/suggest", q="serch engin")
    assert status == 200
    want = [
        {"token": t, "suggestion": s, "df": d}
        for t, s, d in engine.suggest("serch engin")
    ]
    assert body["suggestions"] == want and body["query"] == "serch engin"
    status, body = _get(server, "/suggest")
    assert status == 400 and "q" in body["error"]


def test_explain_endpoint(server, http_index):
    engine = QueryEngine(http_index)
    q = "data stream"
    status, body = _get(server, "/explain", q=q, k=5)
    assert status == 200 and body["query"] == q and body["k"] == 5
    want = engine.explain(q, k=5)
    assert json.loads(json.dumps(body["explain"])) == json.loads(
        json.dumps(want)
    )
    # single-doc form: explain the top hit directly
    top_doc = want[0]["doc_id"]
    status, body = _get(server, "/explain", q=q, doc=top_doc)
    assert status == 200
    assert body["explain"][0]["doc_id"] == top_doc
    assert body["explain"][0]["terms"] == json.loads(
        json.dumps(want[0]["terms"])
    )
    status, body = _get(server, "/explain")  # missing q
    assert status == 400 and "q" in body["error"]


def test_stats_endpoint(server, http_index):
    from zensearch_ray.state.manifest import IndexLayout

    layout = IndexLayout(http_index)
    m = layout.read_manifest()
    status, body = _get(server, "/stats")
    assert status == 200
    assert body["replicas"] == 2
    assert body["n_docs"] == m["n_docs"]
    assert body["total_posting_bytes"] == m["total_posting_bytes"]
    assert body["version_token"] == layout.version_token()


def test_health_and_errors(server):
    status, body = _get(server, "/healthz")
    assert status == 200 and body == {"ok": True, "replicas": 2}
    status, body = _get(server, "/search")  # missing q
    assert status == 400 and "q" in body["error"]
    status, body = _get(server, "/search", q="x", mode="warp")
    assert status == 400 and "mode" in body["error"]
    status, body = _get(server, "/search", q="x", filter="langen")
    assert status == 400
    status, _ = _get(server, "/nope")
    assert status == 404


def test_events_poll_validation(server):
    # negative / non-finite poll must be a 400 BEFORE SSE headers go
    # out (a negative value previously made time.sleep raise uncaught
    # mid-stream; poll=0 busy-spun a server thread per client)
    status, body = _get(server, "/events", poll="-1", max_events="1")
    assert status == 400 and "poll" in body["error"]
    status, body = _get(server, "/events", poll="nan", max_events="1")
    assert status == 400 and "poll" in body["error"]
    status, body = _get(server, "/events", poll="inf", max_events="1")
    assert status == 400 and "poll" in body["error"]
    # poll=0 is clamped to the floor, still serves the initial event
    import urllib.request as _rq

    url = (f"http://{server.host}:{server.port}/events"
           f"?poll=0&max_events=1")
    with _rq.urlopen(url, timeout=30) as resp:
        assert resp.status == 200
        line = resp.readline().decode()
        assert line.startswith("event: stats")


def test_concurrent_requests(server, http_index):
    # ThreadingHTTPServer + round-robin replicas: a burst of parallel
    # requests must all come back correct
    import concurrent.futures

    engine = QueryEngine(http_index)
    want = [[int(d), float(s)] for d, s in engine.topk_pruned("web data", 10)]
    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        futs = [
            ex.submit(_get, server, "/search", q="web data",
                      mode="pruned", docs=0)
            for _ in range(16)
        ]
        for f in futs:
            status, body = f.result()
            assert status == 200 and body["results"] == want


def test_vsearch_endpoint(ray_session, http_index, tmp_path_factory):
    """GET/POST /vsearch serve the warm VectorService — bit-identical
    to a local VectorIndex; absent vector index → explicit 400."""
    import numpy as np

    from zensearch_ray.pipelines.vector import VectorIndex, build_vector_index

    root = tmp_path_factory.mktemp("vhttp")
    vidx = str(root / "vidx")
    build_vector_index(
        "/root/testdata/sf0.001/embeddings.parquet", vidx,
        n_lists=8, n_partitions=4)
    probe = pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", 3)])["embedding"].to_pylist()[0]
    want_ids, want_sims = VectorIndex(vidx).search(
        np.asarray(probe), k=5, nprobe=4)

    with SearchHTTPServer(http_index, replicas=1, k=10,
                          vector_index_dir=vidx) as srv:
        vec_csv = ",".join(str(float(x)) for x in probe)
        code, body = _get(srv, "/vsearch", vec=vec_csv, k=5, nprobe=4)
        assert code == 200
        assert [r["vec_id"] for r in body["results"]] == want_ids.tolist()
        assert [r["sim"] for r in body["results"]] == [
            float(s) for s in want_sims]
        # POST form (the high-dimensional-probe path)
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/vsearch",
            data=json.dumps(
                {"vec": [float(x) for x in probe], "k": 5, "nprobe": 4}
            ).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=30) as resp:
            post_body = json.loads(resp.read())
        assert post_body["results"] == body["results"]
        code, err = _get(srv, "/vsearch", k=5)
        assert code == 400 and "vec" in err["error"]

    with SearchHTTPServer(http_index, replicas=1, k=10) as srv:
        code, err = _get(srv, "/vsearch", vec="1.0,2.0")
        assert code == 400 and "no vector index" in err["error"]


def test_events_sse_pushes_on_version_change(ray_session, tmp_path_factory):
    """/events must push a stats event immediately, keep-alive while
    nothing changes, and push AGAIN when an append commits a new
    generation (version token change) — the W2/W3 push-progress
    surface."""
    import threading
    import time

    from zensearch_ray.sources.pages import generate_pages_dist

    root = tmp_path_factory.mktemp("sse")
    src = str(root / "pages.parquet")
    t = generate_pages_table(120, seed=9)
    pq.write_table(t.slice(0, 80), src, row_group_size=32)
    delta = str(root / "delta.parquet")
    pq.write_table(t.slice(80), delta, row_group_size=32)
    idx = str(root / "idx")
    cfg = BuildConfig(num_shards=2, salt_subs=2, lang="en")
    build_index(src, idx, cfg)

    with SearchHTTPServer(idx, replicas=1, k=10) as srv:
        url = (f"http://{srv.host}:{srv.port}/events"
               f"?poll=0.05&max_events=2")
        events: list[dict] = []

        def consume():
            with urllib.request.urlopen(url, timeout=30) as resp:
                for raw in resp:
                    line = raw.decode().strip()
                    if line.startswith("data: "):
                        events.append(json.loads(line[6:]))
                        if len(events) >= 2:
                            return

        th = threading.Thread(target=consume, daemon=True)
        th.start()
        deadline = time.time() + 10
        while not events and time.time() < deadline:
            time.sleep(0.05)
        assert len(events) == 1  # initial snapshot, then quiet
        build_index(delta, idx, cfg, append=True)  # version token changes
        th.join(timeout=30)
        assert len(events) == 2
        # the push fires on the token edge (possibly mid-commit, which
        # is correct for a progress channel) — the TOKEN must differ
        assert events[1]["version_token"] != events[0]["version_token"]
        _, final = _get(srv, "/stats")
        assert final["n_generations"] == 2
        assert final["n_docs"] > events[0]["n_docs"]
