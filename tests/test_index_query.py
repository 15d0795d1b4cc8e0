"""End-to-end: build index over the fixture corpus → query → rank-identity
vs the brute-force oracle (SURVEY.md §5 conformance suite)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.bm25 import BM25Oracle
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine

QUERIES = [
    "search engine ranking",
    "the of and",              # stopword-heavy (salted terms)
    "café straße naïve",       # unicode
    "OpenAI openai OPENAI",    # case variants + duplicate tokens
    "posting shard delta varint",
    "中文 日本語",
    "zzz-not-a-word",          # df = 0
    "the",                     # single stopword
    "query data web site host text title",
    "v2 10x HTTP2",
]


@pytest.fixture(scope="module")
def built_index(ray_session, pages_small, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("index"))
    cfg = BuildConfig(num_shards=8, salt_subs=4, heavy_df_threshold=60, lang="en")
    manifest = build_index(pages_small, index_dir, cfg)
    return index_dir, manifest, pages_small


@pytest.fixture(scope="module")
def oracle(built_index):
    # dense id contract: doc_id == row position within the (sorted) file
    # list, assigned BEFORE the lang filter
    _, _, pages_path = built_index
    t = pq.read_table(pages_path, columns=["text", "lang"])
    ids = np.arange(t.num_rows, dtype=np.int64)
    mask = np.array([l == "en" for l in t["lang"].to_pylist()])
    return BM25Oracle(
        ids[mask].tolist(),
        [tx for tx, m in zip(t["text"].to_pylist(), mask) if m],
    )


def test_manifest_stats_match_oracle(built_index, oracle):
    _, manifest, _ = built_index
    assert manifest["n_docs"] == oracle.n_docs
    assert manifest["avgdl"] == pytest.approx(oracle.avgdl, rel=1e-12)
    assert manifest["n_partitions"] > 0
    assert manifest["total_posting_bytes"] > 0
    assert manifest["n_heavy_terms"] > 0  # Zipf head must trigger salting


def test_df_matches_oracle(built_index, oracle):
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    for term in ["the", "search", "café", "中文", "nonexistentterm"]:
        assert engine.df(term) == oracle.df.get(term, 0), term


def test_rank_identity_exhaustive(built_index, oracle):
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    for q in QUERIES:
        got = engine.topk(q, k=10)
        want = oracle.topk(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], f"doc_ids differ for {q!r}"
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-12, err_msg=q
        )


def test_rank_identity_pruned(built_index):
    """Block-max MaxScore path must match the exhaustive path."""
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    for q in QUERIES:
        got = engine.topk_pruned(q, k=10)
        want = engine.topk(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], f"doc_ids differ for {q!r}"
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-9, err_msg=q
        )


def test_salted_term_split_across_parts(built_index):
    """A heavy term's postings must actually be split into >1 sub-partition."""
    index_dir, manifest, _ = built_index
    engine = QueryEngine(index_dir)
    p = engine.lookup("the")
    assert p is not None
    assert len(p.rows) > 1  # salted into multiple (shard, sub) partitions
    ids, _, _ = p.decode_all()
    assert len(ids) == p.df
    assert np.all(np.diff(ids) > 0)  # merged sorted, no duplicates


def test_mixed_shard_counts_same_session(ray_session, pages_small, tmp_path):
    """Regression: Ray reuses worker processes across builds; a worker-
    global term→shard memo computed under one num_shards must not leak
    into a build with another (it silently routed postings to wrong
    partitions → queries over the second index returned nothing)."""
    from zensearch_ray.pipelines.build_index import BuildConfig, build_index

    q = "search engine page site"
    engines = []
    for shards in (8, 4, 6):
        d = str(tmp_path / f"idx{shards}")
        build_index(pages_small, d, BuildConfig(num_shards=shards, salt_subs=2, lang="en"))
        engines.append(QueryEngine(d))
    results = [e.topk(q, 10) for e in engines]
    assert all(len(r) == 10 for r in results)
    # shard count is a physical layout choice — results must be identical
    assert results[0] == results[1] == results[2]


def test_topk_docs_title_and_mode(ray_session, pages_small, tmp_path):
    """topk_docs carries url+title (reference result shape) and honors
    the evaluation mode (r1 ADVICE: --urls silently ignored --mode)."""
    index_dir = str(tmp_path / "idx_title")
    cfg = BuildConfig(num_shards=4, salt_subs=2, lang="en", extract_from_html=True)
    build_index(pages_small, index_dir, cfg)
    engine = QueryEngine(index_dir)

    rows = engine.topk_docs("search engine page", k=5)
    assert rows and all(r["url"] for r in rows)
    # generator contract: <title> is the first 4 words of the text
    texts = pq.read_table(pages_small, columns=["text"])["text"].to_pylist()
    for r in rows:
        assert r["title"] == " ".join(texts[r["doc_id"]].split(" ")[:4])

    rows_and = engine.topk_docs("search engine", k=5, mode="and")
    want = engine.topk_and("search engine", k=5)
    assert [r["doc_id"] for r in rows_and] == [d for d, _ in want]
    rows_pruned = engine.topk_docs("search engine", k=5, mode="pruned")
    assert [r["doc_id"] for r in rows_pruned] == [
        d for d, _ in engine.topk_pruned("search engine", k=5)
    ]


def test_topk_and_is_intersection_of_topk(built_index, oracle):
    """AND mode = oracle full ranking restricted to docs containing all
    distinct query terms."""
    from zensearch_ray.functions.text import tokenize

    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    for q in ["search engine", "the of", "data web site", "zzz-not-a-word search"]:
        toks = set(tokenize(q))
        # brute-force AND oracle over the tokenized corpus
        matched = [
            d
            for d, tfmap in zip(oracle.doc_ids, oracle.tfs)
            if all(t in tfmap for t in toks)
        ]
        scores = {d: s for d, s in zip(oracle.doc_ids, oracle.score(q))}
        want = sorted(((d, scores[d]) for d in matched), key=lambda x: (-x[1], x[0]))[:10]
        got = engine.topk_and(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-12, err_msg=q
        )


def test_prefix_expansion_and_scoring(built_index, oracle):
    """expand_prefix == brute-force vocab scan; topk_prefix == topk of
    the expansion treated as a (deduplicated) query."""
    from zensearch_ray.functions.bm25 import idf

    index_dir, _, pages_path = built_index
    engine = QueryEngine(index_dir)
    t = pq.read_table(pages_path, columns=["text", "lang"])
    vocab = set()
    for tx, lg in zip(t["text"].to_pylist(), t["lang"].to_pylist()):
        if lg == "en":
            from zensearch_ray.functions.text import tokenize as tk

            vocab.update(tk(tx))
    for pre in ["se", "th", "d", "zz", "craw"]:
        want_terms = sorted(v for v in vocab if v.startswith(pre))
        got_terms = engine.expand_prefix(pre)
        assert got_terms == want_terms, pre
        if want_terms:
            want = engine._score_plan(
                [
                    (engine.lookup(term), idf(engine.n_docs, engine.df(term)))
                    for term in want_terms
                    if engine.df(term) not in (0, engine.n_docs)
                ],
                10,
            )
            assert engine.topk_prefix(pre, 10) == want, pre
        else:
            assert engine.topk_prefix(pre, 10) == []


def test_prefix_empty_and_nomatch(built_index):
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    assert engine.expand_prefix("") == []
    assert engine.topk_prefix("", 10) == []
    assert engine.topk_prefix("qqqqzzz", 10) == []


def test_wildcard_expansion_and_scoring(built_index, oracle):
    """expand_wildcard == fnmatch vocab scan; topk_wildcard == topk of
    the expansion treated as a (deduplicated) OR-query — prefix/suffix/
    infix patterns, the generalization of the prefix mode."""
    from fnmatch import fnmatchcase

    from zensearch_ray.functions.bm25 import idf
    from zensearch_ray.functions.text import tokenize as tk

    index_dir, _, pages_path = built_index
    engine = QueryEngine(index_dir)
    t = pq.read_table(pages_path, columns=["text", "lang"])
    vocab = set()
    for tx, lg in zip(t["text"].to_pylist(), t["lang"].to_pylist()):
        if lg == "en":
            vocab.update(tk(tx))
    for pat in ["*er", "c*l", "*aw*", "s*e*", "th*", "*zzqq*", "w*d*w"]:
        want_terms = sorted(v for v in vocab if fnmatchcase(v, pat))
        got_terms = engine.expand_wildcard(pat)
        assert got_terms == want_terms, pat
        want = engine._score_plan(
            [
                (engine.lookup(term), idf(engine.n_docs, engine.df(term)))
                for term in want_terms
                if engine.df(term) not in (0, engine.n_docs)
            ],
            10,
        )
        assert engine.topk_wildcard(pat, 10) == want, pat


def test_wildcard_edges(built_index):
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    # pure-prefix pattern takes the pushdown path; must agree with prefix
    assert engine.expand_wildcard("th*") == engine.expand_prefix("th")
    # no '*' → exact-term degenerate case (scored iff the term exists)
    assert engine.topk_wildcard("the", 10) == engine.topk("the", 10)
    assert engine.expand_wildcard("") == []
    assert engine.topk_wildcard("*qqzz*", 10) == []
    # non-token literal segments fail loudly
    with pytest.raises(ValueError):
        engine.expand_wildcard("a-b*")
    # expansion-size guard
    with pytest.raises(ValueError):
        engine.expand_wildcard("*", max_terms=3)


def test_topk_not_excludes_documents(built_index, oracle):
    """topk_not == exhaustive topk over the positive terms minus every
    doc containing an excluded term (referee: oracle postings)."""
    index_dir, _, pages_path = built_index
    engine = QueryEngine(index_dir)
    from zensearch_ray.functions.text import tokenize as tk

    t = pq.read_table(pages_path, columns=["text", "lang"])
    ids = np.arange(t.num_rows, dtype=np.int64)
    mask = np.array([l == "en" for l in t["lang"].to_pylist()])
    docs = {
        int(i): set(tk(tx))
        for i, tx, m in zip(ids, t["text"].to_pylist(), mask)
        if m
    }
    cases = [
        ("search engine -the", ["search", "engine"], ["the"]),
        ("the of -and -data", ["the", "of"], ["and", "data"]),
        ("data -zzznope", ["data"], ["zzznope"]),
        ("-the", [], ["the"]),
    ]
    for q, pos, neg in cases:
        excl = {d for d, toks in docs.items() if any(n in toks for n in neg)}
        want = [
            (d, s)
            for d, s in engine.topk(" ".join(pos), engine.n_docs or 1)
            if d not in excl
        ][:10]
        assert engine.topk_not(q, 10) == want, q


def test_topk_synonyms_equals_expanded_query(built_index):
    """Synonym expansion == a plain OR-query over the expanded distinct
    term set (the Lucene query-side SynonymFilter contract)."""
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    syn = {"search": ["query", "ranking"], "web": ["site"]}
    for q in ["search engine", "web data", "nothing special"]:
        from zensearch_ray.functions.text import tokenize as tk

        expanded = set()
        for t in tk(q):
            expanded.add(t)
            for s in syn.get(t, ()):
                expanded.update(tk(s))
        want = engine.topk(" ".join(sorted(expanded)), 10)
        assert engine.topk_synonyms(q, syn, 10) == want, q
    # empty table → identical to plain search
    assert engine.topk_synonyms("search engine", {}, 10) == engine.topk(
        "search engine", 10
    )


def test_regex_expansion_and_scoring(built_index, oracle):
    """expand_regex == re.fullmatch vocab scan; topk_regex == topk of
    the expansion treated as an OR-query — the general form of glob."""
    import re

    from zensearch_ray.functions.bm25 import idf
    from zensearch_ray.functions.text import tokenize as tk

    index_dir, _, pages_path = built_index
    engine = QueryEngine(index_dir)
    t = pq.read_table(pages_path, columns=["text", "lang"])
    vocab = set()
    for tx, lg in zip(t["text"].to_pylist(), t["lang"].to_pylist()):
        if lg == "en":
            vocab.update(tk(tx))
    for pat in [r".*er", r"c.*l", r"th.*", r"wi(n|d).*", r"[0-9]+", r"s(c|p)a.*"]:
        rx = re.compile(pat)
        want_terms = sorted(v for v in vocab if rx.fullmatch(v))
        got_terms = engine.expand_regex(pat)
        assert got_terms == want_terms, pat
        want = engine._score_plan(
            [
                (engine.lookup(term), idf(engine.n_docs, engine.df(term)))
                for term in want_terms
                if engine.df(term) not in (0, engine.n_docs)
            ],
            10,
        )
        assert engine.topk_regex(pat, 10) == want, pat


def test_regex_edges(built_index):
    import re

    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    # a fully-literal pattern degenerates to the exact term
    assert engine.topk_regex("the", 10) == engine.topk("the", 10)
    assert engine.topk_regex("zzqqxx.*", 10) == []
    with pytest.raises(re.error):
        engine.expand_regex("a(b")  # malformed pattern fails loudly
    with pytest.raises(ValueError):
        engine.expand_regex(".*", max_terms=3)  # expansion-size guard


# -- search_after / boosts / minimum_should_match ------------------------

def test_search_after_pages_partition_the_ranking(built_index):
    """Pages 1..3 of k=5 must be disjoint, ordered, and concatenate to
    the top-15 of the rounded-score total order."""
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    q = "query data web site host text title"
    full = engine.topk_after(q, 1 << 20)  # whole result set, rounded order
    pages, cursor = [], None
    for _ in range(3):
        page = engine.topk_after(q, 5, after=cursor)
        if not page:
            break
        pages.extend(page)
        cursor = (page[-1][1], page[-1][0])
    assert pages == full[: len(pages)]
    assert len({d for d, _ in pages}) == len(pages)  # no dup across pages


def test_search_after_past_end_and_empty(built_index):
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    q = "search engine"
    full = engine.topk_after(q, 1 << 20)
    last = (full[-1][1], full[-1][0])
    assert engine.topk_after(q, 5, after=last) == []
    assert engine.topk_after("zzqqxxnothere", 5) == []


def test_boosted_unit_boosts_equal_plain_topk(built_index):
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    q = "search engine ranking"
    assert engine.topk_boosted(q, 10) == engine.topk(q, 10)
    assert engine.topk_boosted("search^1.0 engine^1.0 ranking", 10) == engine.topk(q, 10)


def test_boosted_single_term_scales_linearly(built_index):
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    plain = engine.topk("search", 10)
    boosted = engine.topk_boosted("search^2.5", 10)
    assert [d for d, _ in boosted] == [d for d, _ in plain]
    for (_, s1), (_, s2) in zip(plain, boosted):
        assert s2 == pytest.approx(2.5 * s1, rel=1e-12)


def test_msm_one_is_topk_and_n_is_conjunction(built_index, oracle):
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    q = "query data web site"
    assert engine.topk_msm(q, 10, min_should_match=1) == engine.topk(q, 10)
    # m = n: same doc set as the AND path (scores computed identically)
    assert engine.topk_msm(q, 10, min_should_match=4) == engine.topk_and(q, 10)


def test_msm_match_count_enforced(built_index, oracle):
    """Every msm=2 hit must contain >= 2 distinct query terms (checked
    against the brute-force corpus), and the hit set must equal the
    >=2-term subset of the union ranking."""
    from zensearch_ray.functions.text import tokenize as tk

    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    q = "query data web site"
    terms = list(dict.fromkeys(tk(q)))
    hits = engine.topk_msm(q, 1 << 20, min_should_match=2)
    doc_terms = {
        int(did): set(tf) for did, tf in zip(oracle.doc_ids, oracle.tfs)
    }
    want = {
        did
        for did, toks in doc_terms.items()
        if sum(t in toks for t in terms) >= 2
    }
    got = {d for d, _ in hits}
    union_hits = {d for d, _ in engine.topk(q, 1 << 20)}
    assert got == want & union_hits
    for did, _ in hits:
        assert sum(t in doc_terms[did] for t in terms) >= 2


# -- dismax ---------------------------------------------------------------

def test_dismax_tie_one_is_union_and_tie_zero_is_max(built_index):
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    q = "query data web site"
    assert engine.topk_dismax(q, 10, tie=1.0) == engine.topk(q, 10)
    # tie=0: every hit's score equals its best single-term score
    best = {}
    for t in q.split():
        for d, s in engine.topk(t, 1 << 20):
            best[d] = max(best.get(d, 0.0), s)
    for d, s in engine.topk_dismax(q, 1 << 20, tie=0.0):
        assert s == pytest.approx(best[d], rel=1e-12)


def test_dismax_single_term_and_bounds(built_index):
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    assert engine.topk_dismax("search", 10, tie=0.3) == engine.topk("search", 10)
    # max <= dismax score <= union sum, same hit universe
    q = "query data web site"
    union = dict(engine.topk(q, 1 << 20))
    dm = dict(engine.topk_dismax(q, 1 << 20, tie=0.3))
    assert set(dm) == set(union)
    for d, s in dm.items():
        assert s <= union[d] + 1e-12


# -- autocomplete ---------------------------------------------------------

def test_autocomplete_matches_brute_force(built_index, oracle):
    """(term, df) under a prefix, (df DESC, term ASC): must equal the
    brute-force count over the oracle corpus."""
    from collections import Counter

    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    df = Counter()
    for tf in oracle.tfs:
        df.update(set(tf))
    for prefix in ("s", "se", "qu", "t"):
        want = sorted(
            ((t, c) for t, c in df.items() if t.startswith(prefix)),
            key=lambda c: (-c[1], c[0]),
        )
        assert engine.autocomplete(prefix, 10) == want[:10], prefix
    assert engine.autocomplete("zzqx", 10) == []
    assert engine.autocomplete("", 10) == []


def test_autocomplete_salted_terms_merge_df(built_index):
    """A salted heavy term (split across sub-partitions) must report
    its MERGED df, identical to the lookup path."""
    index_dir, _, _ = built_index
    engine = QueryEngine(index_dir)
    out = dict(engine.autocomplete("th", 1 << 20))  # 'the' is salted
    assert "the" in out and out["the"] == engine.df("the")
