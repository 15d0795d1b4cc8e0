"""Faceted search (BuildConfig.attrs docmeta sidecar +
QueryEngine.topk_filtered / facet_counts):

  * the filter narrows RESULTS only — surviving docs keep their exact
    unfiltered scores (Lucene filter-query semantics), checked against
    a brute-force referee built from the engine's own full result set
    plus the docmeta attribute mapping;
  * facet counts equal a Counter over the matched set;
  * the attr columns ride tokenize → docmeta (both positional and
    positionless paths) and survive the CLI surface.
"""

import json
from collections import Counter

import pyarrow.parquet as pq
import pytest

from zensearch_ray.__main__ import main
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.sources.pages import generate_pages_table
from zensearch_ray.state.manifest import IndexLayout

QUERIES = ["search engine ranking", "the of and", "data stream"]


@pytest.fixture(scope="module")
def facet_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("facet_src")
    src = str(root / "pages.parquet")
    pq.write_table(generate_pages_table(300, seed=47), src, row_group_size=64)
    idx = str(root / "idx")
    # lang=None keeps every language; attrs carries lang into docmeta
    build_index(
        src, idx,
        BuildConfig(
            num_shards=4, salt_subs=2, heavy_df_threshold=60,
            lang=None, attrs=("lang",),
        ),
    )
    return idx


def _lang_of(idx: str) -> dict[int, str]:
    meta = pq.ParquetDataset(IndexLayout(idx).docmeta_dir).read(
        columns=["doc_id", "lang"]
    )
    return dict(zip(meta["doc_id"].to_pylist(), meta["lang"].to_pylist()))


def test_docmeta_carries_attrs(facet_index):
    lang_of = _lang_of(facet_index)
    assert set(lang_of.values()) > {"en"}  # multiple languages present


def test_topk_filtered_matches_referee(facet_index):
    engine = QueryEngine(facet_index)
    lang_of = _lang_of(facet_index)
    for q in QUERIES:
        all_hits = engine.topk(q, k=1 << 62)  # every score>0 doc
        for lang in sorted(set(lang_of.values())):
            want = [(d, s) for d, s in all_hits if lang_of[d] == lang][:10]
            assert engine.topk_filtered(q, "lang", lang, 10) == want, (q, lang)
    # unknown facet value → empty, not an error
    assert engine.topk_filtered(QUERIES[0], "lang", "xx", 10) == []


def test_facet_counts_match_referee(facet_index):
    engine = QueryEngine(facet_index)
    for q in QUERIES:
        matched = Counter(
            _lang_of(facet_index)[d] for d, _ in engine.topk(q, k=1 << 62)
        )
        want = sorted(matched.items(), key=lambda vc: (-vc[1], vc[0]))
        assert engine.facet_counts(q, "lang") == want, q


def test_attrs_survive_positional_build(ray_session, tmp_path):
    src = str(tmp_path / "pages.parquet")
    pq.write_table(generate_pages_table(120, seed=48), src, row_group_size=64)
    idx = str(tmp_path / "idx_pos")
    build_index(
        src, idx,
        BuildConfig(
            num_shards=4, salt_subs=2, heavy_df_threshold=60,
            lang=None, attrs=("lang",), positions=True,
        ),
    )
    engine = QueryEngine(idx)
    assert engine.facet_counts("the", "lang")  # attr readable
    with pytest.raises(Exception):
        engine._facet("nope")  # unknown attr fails loudly


def test_services_serve_filtered(facet_index):
    """Both serving faces (warm replicas + term-sharded workers) serve
    the filtered path identically to the engine."""
    from zensearch_ray.pipelines.service import QueryService, ShardedQueryService

    engine = QueryEngine(facet_index)
    q, lang = QUERIES[0], "en"
    want = engine.topk_filtered(q, "lang", lang, 5)
    assert want
    with QueryService(facet_index, replicas=1) as svc:
        assert svc.search(q, k=5, filter=("lang", lang)) == want
        rows = svc.search(q, k=5, docs=True, filter=("lang", lang))
        assert [r["doc_id"] for r in rows] == [d for d, _ in want]
    with ShardedQueryService(facet_index, workers=2) as svc:
        assert svc.topk(q, 5, filter=("lang", lang)) == want
        rows = svc.topk_docs(q, k=5, filter=("lang", lang))
        assert [r["doc_id"] for r in rows] == [d for d, _ in want]


def test_cli_filter_and_facets(facet_index, capsys):
    assert main([
        "query", "--index", facet_index, "--filter", "lang=en", "-k", "3",
        "search engine",
    ]) == 0
    (out,) = [json.loads(ln) for ln in capsys.readouterr().out.splitlines() if ln]
    engine = QueryEngine(facet_index)
    assert [r["doc_id"] for r in out["results"]] == [
        d for d, _ in engine.topk_filtered("search engine", "lang", "en", 3)
    ]
    assert main(["query", "--index", facet_index, "--facets", "lang", "the"]) == 0
    (fc,) = [json.loads(ln) for ln in capsys.readouterr().out.splitlines() if ln]
    assert fc["counts"] == [
        {"value": v, "n_docs": c} for v, c in engine.facet_counts("the", "lang")
    ]
    # an explicit conflicting mode is rejected, not silently ignored
    with pytest.raises(SystemExit):
        main([
            "query", "--index", facet_index, "--filter", "lang=en",
            "--mode", "and", "x",
        ])


def test_topk_collapsed_matches_referee(facet_index):
    """Greedy field collapse: a doc survives iff fewer than ``per``
    same-group docs rank above it (score DESC, doc_id ASC) — checked
    against a brute-force pass over the engine's own full ranking."""
    engine = QueryEngine(facet_index)
    lang_of = _lang_of(facet_index)
    for q in QUERIES:
        full = engine.topk(q, k=10**9)  # the complete positive ranking
        for per in (1, 2):
            seen: Counter = Counter()
            want = []
            for d, s in full:
                g = lang_of[d]
                if seen[g] < per:
                    want.append((d, s))
                    seen[g] += 1
                if len(want) == 10:
                    break
            assert engine.topk_collapsed(q, "lang", per=per, k=10) == want, (q, per)
        # per >= group count → collapse is a no-op
        assert engine.topk_collapsed(q, "lang", per=10**6, k=10) == full[:10], q


def test_topk_collapsed_edges(facet_index):
    engine = QueryEngine(facet_index)
    assert engine.topk_collapsed("", "lang") == []
    assert engine.topk_collapsed("zzzznotaword", "lang") == []


def test_cli_collapse(facet_index, capsys):
    rc = main([
        "query", "--index", facet_index, "search engine",
        "--collapse", "lang=1", "-k", "5",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    engine = QueryEngine(facet_index)
    want = engine.topk_collapsed("search engine", "lang", per=1, k=5)
    assert [(r["doc_id"], r["score"]) for r in out["results"]] == want
    langs = [_lang_of(facet_index)[r["doc_id"]] for r in out["results"]]
    assert len(langs) == len(set(langs))  # one per language


def _dl_of(idx: str) -> dict[int, int]:
    meta = pq.ParquetDataset(IndexLayout(idx).docmeta_dir).read(
        columns=["doc_id", "doc_len"]
    )
    return dict(zip(meta["doc_id"].to_pylist(), meta["doc_len"].to_pylist()))


def test_topk_range_matches_referee(facet_index):
    """Range filter narrows results only; surviving scores identical to
    the unfiltered ranking (Lucene filter semantics, numeric form)."""
    engine = QueryEngine(facet_index)
    dl = _dl_of(facet_index)
    for q in QUERIES:
        full = engine.topk(q, k=10**9)
        lo, hi = 40, 90
        want = [(d, s) for d, s in full if lo <= dl[d] <= hi][:10]
        assert engine.topk_range(q, "doc_len", lo, hi, k=10) == want, q
        # degenerate windows
        assert engine.topk_range(q, "doc_len", 10**9, 2 * 10**9, k=10) == []
        assert engine.topk_range(q, "doc_len", 0, 10**9, k=10) == full[:10]


def test_match_stats_matches_referee(facet_index):
    engine = QueryEngine(facet_index)
    dl = _dl_of(facet_index)
    for q in QUERIES:
        matched = [dl[d] for d, _ in engine.topk(q, k=10**9)]
        got = engine.match_stats(q, "doc_len")
        assert got["n_docs"] == len(matched)
        assert got["sum"] == pytest.approx(sum(matched))
        assert got["avg"] == pytest.approx(sum(matched) / len(matched))
        assert got["min"] == min(matched) and got["max"] == max(matched)
    empty = engine.match_stats("zzzznotaword", "doc_len")
    assert empty == {"n_docs": 0, "sum": None, "avg": None, "min": None, "max": None}


def test_cli_range(facet_index, capsys):
    rc = main([
        "query", "--index", facet_index, "search engine",
        "--range", "doc_len=40:90", "-k", "5",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    engine = QueryEngine(facet_index)
    want = engine.topk_range("search engine", "doc_len", 40, 90, k=5)
    assert [(r["doc_id"], r["score"]) for r in out["results"]] == want


def test_match_histogram_matches_referee(facet_index):
    import math

    engine = QueryEngine(facet_index)
    dl = _dl_of(facet_index)
    for q in QUERIES:
        for interval in (10.0, 25.0, 7.0):
            matched = [dl[d] for d, _ in engine.topk(q, k=10**9)]
            want: dict[float, int] = {}
            for v in matched:
                k = math.floor(v / interval) * interval
                want[k] = want.get(k, 0) + 1
            got = engine.match_histogram(q, "doc_len", interval)
            assert got == sorted(want.items()), (q, interval)
    assert engine.match_histogram("zzzznotaword", "doc_len", 10.0) == []
    with pytest.raises(ValueError, match="interval"):
        engine.match_histogram("search", "doc_len", 0.0)


def test_match_cardinality_matches_referee(facet_index):
    engine = QueryEngine(facet_index)
    lang_of = _lang_of(facet_index)
    for q in QUERIES:
        want = len({lang_of[d] for d, _ in engine.topk(q, k=10**9)})
        assert engine.match_cardinality(q, "lang") == want, q
    assert engine.match_cardinality("zzzznotaword", "lang") == 0
