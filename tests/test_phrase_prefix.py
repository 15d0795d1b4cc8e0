"""Match-phrase-prefix (search-as-you-type): the last query token is a
dictionary prefix; each expansion completes the exact phrase, a doc
keeps its MAX score over matching expansions (DisMax over expansions —
the pinned, SQL-expressible combine; see
``QueryEngine.topk_phrase_prefix``). Referees here derive from the
already-verified ``phrase_topk(positional=True)`` per-expansion path,
so the only NEW semantics under test is the expansion + max combine.
"""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.pipelines.corpus import (
    index_dir_for,
    phrase_prefix_topk,
    phrase_topk,
)

DOCS = [
    # doc 0: matches via 'bear' only
    "alpha bear hunt",
    # doc 1: matches via 'bell' twice (tf boost on both terms)
    "alpha bell tower alpha bell",
    # doc 2: matches via 'bell'; contains 'bear' NOT after alpha
    "bear alpha bell",
    # doc 3: matches via 'bet'
    "alpha bet",
    # doc 4: all three expansions but no 'alpha' → no match
    "bear bell bet",
    # doc 5: alpha and bear present, never adjacent → no match
    "alpha zeta bear",
    # doc 6: matches via BOTH bear and bell → exercises the max combine
    "alpha bear alpha bell",
]


@pytest.fixture(scope="module")
def pp_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("phrase_prefix_sf")
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


def _expansions(prefix: str) -> list[str]:
    return sorted(
        {t for doc in DOCS for t in doc.split() if t.startswith(prefix)}
    )


def test_phrase_prefix_brute_force_referee(pp_dir):
    """Result == per-expansion phrase_topk results max-combined per doc
    (phrase_topk positional is itself oracle-checked, so this isolates
    exactly the expansion + DisMax semantics)."""
    got = phrase_prefix_topk(pp_dir, "alpha be", k=10)
    best: dict[int, float] = {}
    for t in _expansions("be"):
        full = phrase_topk(pp_dir, f"alpha {t}", k=100, positional=True)
        for d, s in zip(full["doc_id"], full["score"]):
            best[int(d)] = max(best.get(int(d), float("-inf")), float(s))
    want = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(got["doc_id"]) == [d for d, _ in want]
    assert list(got["score"]) == [s for _, s in want]
    # membership pinned by construction of DOCS
    assert set(got["doc_id"]) == {0, 1, 2, 3, 6}


def test_phrase_prefix_max_not_sum(pp_dir):
    """Doc 6 matches via two expansions; its score must be the MAX of
    the two per-expansion phrase scores, not their sum."""
    got = phrase_prefix_topk(pp_dir, "alpha be", k=10)
    row6 = float(got[got["doc_id"] == 6]["score"].iloc[0])
    per = []
    for t in ("bear", "bell"):
        full = phrase_topk(pp_dir, f"alpha {t}", k=100, positional=True)
        hit = full[full["doc_id"] == 6]
        assert len(hit) == 1, t
        per.append(float(hit["score"].iloc[0]))
    assert row6 == max(per)
    assert row6 < sum(per)


def test_phrase_prefix_no_expansion_empty(pp_dir):
    out = phrase_prefix_topk(pp_dir, "alpha qq", k=10)
    assert len(out) == 0
    assert list(out.columns) == ["rank", "doc_id", "score"]


def test_phrase_prefix_missing_base_term_empty(pp_dir):
    # base term not in the index → no doc can contain the exact phrase
    out = phrase_prefix_topk(pp_dir, "nosuchterm be", k=10)
    assert len(out) == 0


def test_phrase_prefix_single_token_is_max_over_expansions(pp_dir):
    """Pure prefix phrase (one token): every doc containing any
    expansion, scored max over single-term BM25 contributions —
    contrast with topk_prefix's SUM combine."""
    from zensearch_ray.functions.bm25 import idf, tf_norm
    from zensearch_ray.functions.text import tokenize
    from zensearch_ray.pipelines.query import QueryEngine

    engine = QueryEngine(index_dir_for(pp_dir, positions=True))
    got = engine.topk_phrase_prefix("be", k=10)

    n = len(DOCS)
    toks = [tokenize(d) for d in DOCS]
    avgdl = sum(len(t) for t in toks) / n
    best: dict[int, float] = {}
    for term in _expansions("be"):
        df = sum(1 for t in toks if term in t)
        w = idf(n, df)
        for did, t in enumerate(toks):
            tf = t.count(term)
            if tf == 0:
                continue
            import numpy as np

            s = float(
                w
                * tf_norm(
                    np.array([tf], dtype=np.int64),
                    np.array([len(t)], dtype=np.int64),
                    avgdl,
                    engine.params,
                )[0]
            )
            best[did] = max(best.get(did, float("-inf")), s)
    want = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert [s for _, s in got] == pytest.approx([s for _, s in want])


def test_phrase_prefix_requires_positions_for_multi_token(pp_dir):
    from zensearch_ray.pipelines.query import QueryEngine

    engine = QueryEngine(index_dir_for(pp_dir))  # positionless build
    with pytest.raises(ValueError, match="positions"):
        engine.topk_phrase_prefix("alpha be")


def test_phrase_prefix_max_terms_guard(pp_dir):
    from zensearch_ray.pipelines.query import QueryEngine

    engine = QueryEngine(index_dir_for(pp_dir, positions=True))
    with pytest.raises(ValueError, match="max_terms"):
        engine.topk_phrase_prefix("alpha b", max_terms=2)


def test_phrase_prefix_k_truncates(pp_dir):
    got = phrase_prefix_topk(pp_dir, "alpha be", k=2)
    assert len(got) == 2
    assert list(got["rank"]) == [1, 2]
