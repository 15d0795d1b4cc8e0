"""Exact-phrase top-k: contiguity semantics on a handcrafted corpus.

The engine (pipelines/corpus.py phrase_topk) takes conjunctive
(intersection) candidates from the index and verifies the contiguous
token run against document text — these tests pin the semantics the
sf-dir oracle can't isolate: a doc containing both terms NON-adjacent
must be excluded, and surviving scores must equal the conjunctive BM25
scores for the same docs.
"""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.corpus import bm25_topk, phrase_topk

DOCS = [
    # doc 0: phrase present, once
    "alpha beta gamma delta",
    # doc 1: both terms, NOT adjacent — conjunctive hit, phrase miss
    "alpha gamma beta delta",
    # doc 2: phrase present twice (higher tf on both terms)
    "alpha beta alpha beta epsilon",
    # doc 3: only one term
    "alpha gamma gamma delta",
    # doc 4: neither
    "zeta eta theta iota",
    # doc 5: phrase at end of doc (boundary of the needle padding)
    "gamma delta alpha beta",
    # doc 6: reversed order only (never alpha→beta adjacent)
    "beta zeta alpha zeta beta",
]


@pytest.fixture(scope="module")
def phrase_sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("phrase_sf")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), type=pa.int64()),
            "text": pa.array(DOCS, type=pa.string()),
            "lang": pa.array(["en"] * len(DOCS)),
            "source": pa.array(["t"] * len(DOCS)),
            "n_chars": pa.array([len(s) for s in DOCS], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_phrase_contiguity(phrase_sf_dir):
    out = phrase_topk(phrase_sf_dir, "alpha beta", k=10)
    # docs 1 and 6 contain both terms but never the contiguous run
    assert set(out["doc_id"]) == {0, 2, 5}
    assert list(out["rank"]) == [1, 2, 3]


def test_phrase_scores_match_conjunctive(phrase_sf_dir):
    """Surviving docs keep their conjunctive-BM25 score and relative
    order — phrase verification filters, never rescores."""
    ph = phrase_topk(phrase_sf_dir, "alpha beta", k=10)
    conj = bm25_topk(phrase_sf_dir, "alpha beta", k=10, conjunctive=True)
    merged = ph.merge(conj, on="doc_id", suffixes=("_ph", "_conj"))
    assert len(merged) == len(ph)
    pd.testing.assert_series_equal(
        merged["score_ph"], merged["score_conj"], check_names=False
    )
    # rank order is the conjunctive order restricted to survivors
    conj_order = [d for d in conj["doc_id"] if d in set(ph["doc_id"])]
    assert list(ph.sort_values("rank")["doc_id"]) == conj_order


def test_phrase_absent_returns_empty_with_schema(phrase_sf_dir):
    out = phrase_topk(phrase_sf_dir, "beta gamma zeta", k=10)
    assert len(out) == 0
    assert [str(t) for t in out.dtypes] == ["int64", "int64", "float64"]


def test_phrase_k_truncates(phrase_sf_dir):
    out = phrase_topk(phrase_sf_dir, "alpha beta", k=2)
    assert len(out) == 2
    assert list(out["rank"]) == [1, 2]


# ---- positional-index path ------------------------------------------------


@pytest.mark.parametrize(
    "phrase",
    ["alpha beta", "alpha beta gamma", "gamma delta alpha beta", "zzz qqq"],
)
def test_positional_matches_scan(phrase_sf_dir, phrase):
    """The positional index resolves phrases WITHOUT reading the corpus;
    results must be rank-identical to the text-scan verifier."""
    scan = phrase_topk(phrase_sf_dir, phrase, k=10)
    pos = phrase_topk(phrase_sf_dir, phrase, k=10, positional=True)
    pd.testing.assert_frame_equal(scan, pos)


def test_positional_duplicate_token_phrase(phrase_sf_dir):
    # "beta alpha" occurs in docs 1 ("...gamma beta delta"? no) — just
    # assert path-identity; the scan path is the semantics referee
    for phrase in ["beta alpha", "alpha alpha", "gamma gamma"]:
        scan = phrase_topk(phrase_sf_dir, phrase, k=10)
        pos = phrase_topk(phrase_sf_dir, phrase, k=10, positional=True)
        pd.testing.assert_frame_equal(scan, pos)


def test_positional_engine_requires_positions(phrase_sf_dir):
    from zensearch_ray.pipelines.corpus import index_dir_for
    from zensearch_ray.pipelines.query import QueryEngine

    eng = QueryEngine(index_dir_for(phrase_sf_dir))  # positionless
    with pytest.raises(ValueError, match="without positions"):
        eng.topk_phrase("alpha beta")


def test_positional_append_generations(ray_session, pages_small, tmp_path_factory):
    """Phrase results over a build+append positional index equal a
    one-shot positional build of the full corpus (positions survive
    generation merge and salted heavy terms)."""
    import pyarrow.parquet as pq

    from zensearch_ray.pipelines.build_index import BuildConfig, build_index
    from zensearch_ray.pipelines.query import QueryEngine

    base = tmp_path_factory.mktemp("phrase_append")
    t = pq.read_table(pages_small)
    half = t.num_rows // 2
    a, b = str(base / "a.parquet"), str(base / "b.parquet")
    pq.write_table(t.slice(0, half), a)
    pq.write_table(t.slice(half), b)
    cfg = BuildConfig(
        num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en",
        positions=True,
    )
    oneshot_dir = str(base / "oneshot")
    build_index([a, b], oneshot_dir, cfg)
    grown_dir = str(base / "grown")
    build_index(a, grown_dir, cfg)
    build_index(b, grown_dir, cfg, append=True)

    e1, e2 = QueryEngine(oneshot_dir), QueryEngine(grown_dir)
    checked = 0
    for q in ["web search", "the of", "data engine", "search engine ranking"]:
        r1 = [(d, round(s, 9)) for d, s in e1.topk_phrase(q, k=20)]
        r2 = [(d, round(s, 9)) for d, s in e2.topk_phrase(q, k=20)]
        assert r1 == r2, q
        checked += len(r1)
    assert checked > 0  # at least one phrase must actually match


def test_positional_compaction_preserves_phrases(
    ray_session, pages_small, tmp_path_factory
):
    """Compacting a multi-generation positional index must carry the
    positions through the merge re-encode — phrase results before and
    after compaction are identical."""
    import pyarrow.parquet as pq

    from zensearch_ray.pipelines.build_index import BuildConfig, build_index
    from zensearch_ray.pipelines.compact import compact_index
    from zensearch_ray.pipelines.query import QueryEngine

    base = tmp_path_factory.mktemp("phrase_compact")
    t = pq.read_table(pages_small)
    half = t.num_rows // 2
    a, b = str(base / "a.parquet"), str(base / "b.parquet")
    pq.write_table(t.slice(0, half), a)
    pq.write_table(t.slice(half), b)
    cfg = BuildConfig(
        num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en",
        positions=True,
    )
    grown = str(base / "grown")
    build_index(a, grown, cfg)
    build_index(b, grown, cfg, append=True)
    compacted = str(base / "compacted")
    m = compact_index(grown, compacted)
    assert m["n_generations"] == 1 and m.get("positions") is True

    e1, e2 = QueryEngine(grown), QueryEngine(compacted)
    checked = 0
    for q in ["web search", "the of", "search engine ranking"]:
        r1 = [(d, round(s, 9)) for d, s in e1.topk_phrase(q, k=20)]
        r2 = [(d, round(s, 9)) for d, s in e2.topk_phrase(q, k=20)]
        assert r1 == r2, q
        checked += len(r1)
    assert checked > 0


def test_positional_matches_scan_on_fixture(ray_session, tmp_path_factory):
    """Path identity on a realistic corpus incl. salted heavy terms:
    stopword-led phrases route through salt sub-partitions."""
    import duckdb
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    for phrase in ["the search", "a b", "web page"]:
        scan = phrase_topk(sf, phrase, k=10)
        pos = phrase_topk(sf, phrase, k=10, positional=True)
        pd.testing.assert_frame_equal(scan, pos)


# ---- proximity (topk_near) ------------------------------------------------


def test_near_window_boundaries(phrase_sf_dir):
    from zensearch_ray.pipelines.corpus import near_topk

    # doc 1 "alpha gamma beta delta": alpha at 0, beta at 2 → dist 2
    # doc 6 "beta zeta alpha zeta beta": alpha at 2, beta at 0 and 4 → dist 2
    # adjacency docs (0, 2, 5) have dist 1
    w1 = set(near_topk(phrase_sf_dir, "alpha beta", window=1)["doc_id"])
    w2 = set(near_topk(phrase_sf_dir, "alpha beta", window=2)["doc_id"])
    assert w1 == {0, 2, 5}
    assert w2 == {0, 1, 2, 5, 6}


def test_near_zero_window_distinct_terms_empty(phrase_sf_dir):
    from zensearch_ray.pipelines.corpus import near_topk

    # |p_a - p_b| <= 0 needs the same position — impossible for two
    # distinct terms
    assert len(near_topk(phrase_sf_dir, "alpha beta", window=0)) == 0


def test_near_single_term_is_conjunctive(phrase_sf_dir):
    from zensearch_ray.pipelines.corpus import bm25_topk, near_topk

    got = near_topk(phrase_sf_dir, "alpha", window=3)
    want = bm25_topk(phrase_sf_dir, "alpha", k=10, conjunctive=True)
    pd.testing.assert_frame_equal(got, want)


def test_near_brute_force_referee(phrase_sf_dir):
    """Pairwise-EXISTS proximity vs a brute-force referee over the
    handcrafted corpus for every window 0..4 and a 3-term query."""
    from zensearch_ray.functions.text import tokenize
    from zensearch_ray.pipelines.corpus import near_topk

    def brute(query, w):
        terms = list(dict.fromkeys(tokenize(query)))
        out = set()
        for did, text in enumerate(DOCS):
            toks = tokenize(text)
            pos = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
            if any(not pos[t] for t in terms):
                continue
            ok = all(
                any(abs(pa_ - pb) <= w for pa_ in pos[a] for pb in pos[b])
                for i, a in enumerate(terms)
                for b in terms[i + 1:]
            )
            if ok:
                out.add(did)
        return out

    for q in ["alpha beta", "alpha beta gamma", "gamma delta"]:
        for w in range(5):
            got = set(near_topk(phrase_sf_dir, q, window=w)["doc_id"])
            assert got == brute(q, w), (q, w)


def test_seq_brute_force_referee(phrase_sf_dir):
    """Ordered-chain proximity vs a reachability-DP referee over the
    handcrafted corpus for gaps 1..5 — including duplicate-token
    queries and the 3-term chain."""
    from zensearch_ray.functions.text import tokenize
    from zensearch_ray.pipelines.corpus import seq_topk

    def brute(query, gap):
        toks = tokenize(query)
        out = set()
        for did, text in enumerate(DOCS):
            dpos = tokenize(text)
            reach = [i for i, x in enumerate(dpos) if x == toks[0]]
            for t in toks[1:]:
                cand = [i for i, x in enumerate(dpos) if x == t]
                reach = [
                    q for q in cand if any(q - gap <= p < q for p in reach)
                ]
            if reach:
                out.add(did)
        return out

    for q in ["alpha beta", "alpha beta gamma", "gamma delta", "beta beta"]:
        for gap in range(1, 6):
            got = set(seq_topk(phrase_sf_dir, q, gap=gap)["doc_id"])
            assert got == brute(q, gap), (q, gap)


def test_seq_gap1_is_phrase(phrase_sf_dir):
    from zensearch_ray.pipelines.corpus import phrase_topk, seq_topk

    for q in ["alpha beta", "gamma delta"]:
        got = seq_topk(phrase_sf_dir, q, gap=1)
        want = phrase_topk(phrase_sf_dir, q, k=10, positional=True)
        assert got.equals(want), q


def test_seq_greedy_counterexample(ray_session, tmp_path_factory):
    """A@1 B@{2,4} C@8, gap=4: greedy-earliest (B@2) strands C; the
    reachability sweep must still match through B@4."""
    d = tmp_path_factory.mktemp("seq_cx")
    text = "pad aaa bbb pad bbb pad pad pad ccc"
    t = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "text": pa.array([text], type=pa.string()),
            "lang": pa.array(["en"]),
            "source": pa.array(["t"]),
            "n_chars": pa.array([len(text)], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    from zensearch_ray.pipelines.corpus import seq_topk

    assert list(seq_topk(str(d), "aaa bbb ccc", gap=4)["doc_id"]) == [0]
    # and the chain genuinely needs gap 4 (B@4 → C@8)
    assert len(seq_topk(str(d), "aaa bbb ccc", gap=3)) == 0


def test_seq_errors(phrase_sf_dir):
    from zensearch_ray.pipelines.corpus import index_dir_for
    from zensearch_ray.pipelines.query import QueryEngine

    pos_engine = QueryEngine(index_dir_for(phrase_sf_dir, positions=True))
    with pytest.raises(ValueError, match="gap"):
        pos_engine.topk_seq("alpha beta", gap=0)
    flat_engine = QueryEngine(index_dir_for(phrase_sf_dir))
    with pytest.raises(ValueError, match="positions"):
        flat_engine.topk_seq("alpha beta", gap=2)
