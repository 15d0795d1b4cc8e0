"""Function scoring (ES field_value_factor) and two-phase rescoring
(ES rescore) — semantics on a handcrafted corpus:

  * ``topk_fvf``: every matching doc's BM25 score × ln(1 + doc_len),
    checked against a brute referee built from the engine's own full
    BM25 result set and the known token counts; the factor must be
    able to REORDER (a longer doc overtakes a shorter higher-BM25 one).
  * ``topk_rescored``: only window docs are rescored; the phrase boost
    uses positional contiguity (non-adjacent term pairs get nothing);
    rescore_weight=0 reduces to the round6 BM25 order; a window of 1
    means no doc below phase-1 rank 1 can enter the result.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.rounding import round6
from zensearch_ray.functions.text import tokenize
from zensearch_ray.pipelines.corpus import (
    bm25_topk,
    fvf_topk,
    index_dir_for,
    rescored_topk,
)
from zensearch_ray.pipelines.query import QueryEngine

DOCS = [
    # 0: stuffed with both query terms (never 'gamma') — top BM25 for
    # the union query, no phrase match possible
    "alpha alpha alpha beta zeta",
    # 1: phrase 'beta gamma' present, modest union score
    "alpha beta gamma zeta eta",
    # 2: both phrase terms NON-adjacent — must get no boost
    "beta alpha gamma zeta eta",
    # 3: phrase present twice
    "beta gamma beta gamma theta",
    # 4: only filler vocabulary (df diversity)
    "zeta eta theta iota kappa",
    # 5: long doc with one weak 'alpha' — fvf log1p(dl) bait
    "alpha " + " ".join(f"pad{i}" for i in range(40)),
    # 6: short doc with one 'alpha' — same tf, much shorter
    "alpha zeta",
]

QUERY = "alpha beta"
PHRASE = "beta gamma"


@pytest.fixture(scope="module")
def sf_dir(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("rescore_sf")
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


def _full_bm25(sf_dir, query):
    """doc_id → exact engine BM25 score over the whole corpus."""
    out = bm25_topk(sf_dir, query, k=100)
    return dict(zip(out["doc_id"], out["score"]))


def test_fvf_matches_referee(sf_dir):
    base = _full_bm25(sf_dir, QUERY)
    dls = {i: len(tokenize(t)) for i, t in enumerate(DOCS)}
    # referee: unrounded engine scores would be ideal, but round6 of
    # the product of round6'd parts differs; recompute from the
    # engine's own unrounded accumulation instead
    engine = QueryEngine(index_dir_for(sf_dir))
    plan = engine._term_plan(QUERY)
    uniq, scores = engine._accumulate_plan(plan)
    keep = scores > 0
    uniq, scores = uniq[keep], scores[keep]
    factor = np.log1p(np.array([dls[int(d)] for d in uniq], dtype=np.float64))
    final = scores * factor
    order = np.lexsort((uniq, -final))
    expect = [(int(uniq[i]), round6(float(final[i]))) for i in order]
    got = fvf_topk(sf_dir, QUERY, k=10)
    assert list(got["doc_id"]) == [d for d, _ in expect][: len(got)]
    assert list(got["score"]) == [s for _, s in expect][: len(got)]
    assert set(got["doc_id"]) == set(base)  # same match set, new order


def test_fvf_reorders_by_length(sf_dir):
    """Doc 5 (41 tokens, one 'alpha') ranks below doc 6 (2 tokens, one
    'alpha') under plain BM25 — length normalization penalizes it —
    but the ln(1+dl) factor must close part of that gap: the fvf
    score RATIO between 5 and 6 strictly exceeds the BM25 ratio."""
    base = _full_bm25(sf_dir, QUERY)
    fvf = dict(zip(
        fvf_topk(sf_dir, QUERY, k=10)["doc_id"],
        fvf_topk(sf_dir, QUERY, k=10)["score"],
    ))
    assert base[5] < base[6]
    assert fvf[5] / fvf[6] > base[5] / base[6]


def test_rescored_phrase_wins(sf_dir):
    """Plain BM25 ranks doc 0 (alpha-stuffed) first; the phrase
    rescore must lift a 'beta gamma' doc over it."""
    plain = bm25_topk(sf_dir, QUERY, k=10)
    assert int(plain["doc_id"][0]) == 0
    out = rescored_topk(sf_dir, QUERY, PHRASE, k=10, window=10)
    assert int(out["doc_id"][0]) in (1, 3)
    # doc 2 has both phrase terms NON-adjacent: its final score must
    # equal plain round6 bm25 (no boost)
    base = _full_bm25(sf_dir, QUERY)
    got = dict(zip(out["doc_id"], out["score"]))
    assert got[2] == round6(1.0 * base[2])


def test_rescored_combine_is_exact(sf_dir):
    """final = round6(1.0·bm25_r + 2.0·phrase_r) with the phrase score
    equal to the phrase terms' conjunctive sum for contiguous docs."""
    engine = QueryEngine(index_dir_for(sf_dir, positions=True))
    base = {d: round6(s) for d, s in engine.topk(QUERY, k=100)}
    phrase_conj = dict(
        zip(
            bm25_topk(sf_dir, PHRASE, k=100, conjunctive=True)["doc_id"],
            bm25_topk(sf_dir, PHRASE, k=100, conjunctive=True)["score"],
        )
    )
    ph_toks = tokenize(PHRASE)

    def contiguous(text):
        toks = tokenize(text)
        return any(
            toks[i : i + len(ph_toks)] == ph_toks
            for i in range(len(toks) - len(ph_toks) + 1)
        )

    expect = {}
    for d, s in base.items():
        boost = phrase_conj.get(d, 0.0) if contiguous(DOCS[d]) else 0.0
        expect[d] = round6(1.0 * s + 2.0 * boost)
    out = rescored_topk(sf_dir, QUERY, PHRASE, k=10, window=10)
    for d, s in zip(out["doc_id"], out["score"]):
        assert s == expect[int(d)], (d, s, expect[int(d)])
    # and the order is (final DESC, doc_id ASC)
    fin = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(out["doc_id"]) == [d for d, _ in fin][: len(out)]


def test_rescored_window_excludes(sf_dir):
    """window=1: only the phase-1 top doc is eligible — the phrase
    docs below rank 1 cannot enter, so the result is exactly the
    BM25 top-1 (its own score possibly boosted, here unboosted)."""
    plain = bm25_topk(sf_dir, QUERY, k=1)
    out = rescored_topk(sf_dir, QUERY, PHRASE, k=10, window=1)
    assert len(out) == 1
    assert int(out["doc_id"][0]) == int(plain["doc_id"][0]) == 0
    assert out["score"][0] == plain["score"][0]  # no phrase in doc 0


def test_rescored_weight_zero_is_bm25(sf_dir):
    engine = QueryEngine(index_dir_for(sf_dir, positions=True))
    out = engine.topk_rescored(
        QUERY, PHRASE, k=10, window=10, rescore_weight=0.0
    )
    base = [(d, round6(s)) for d, s in engine.topk(QUERY, k=10)]
    assert [(d, s) for d, s in out] == base


def test_cli_fvf_and_rescore(sf_dir, capsys):
    import json

    from zensearch_ray.__main__ import main

    idx = index_dir_for(sf_dir)
    pidx = index_dir_for(sf_dir, positions=True)
    assert main(["query", "--index", idx, "--fvf", "doc_len", QUERY]) == 0
    (out,) = [json.loads(ln) for ln in capsys.readouterr().out.splitlines() if ln]
    expect = fvf_topk(sf_dir, QUERY, k=10)
    assert [r["doc_id"] for r in out["results"]] == list(expect["doc_id"])
    assert main([
        "query", "--index", pidx, "--rescore-phrase", PHRASE,
        "--rescore-window", "10", QUERY,
    ]) == 0
    (out,) = [json.loads(ln) for ln in capsys.readouterr().out.splitlines() if ln]
    expect = rescored_topk(sf_dir, QUERY, PHRASE, k=10, window=10)
    assert [r["doc_id"] for r in out["results"]] == list(expect["doc_id"])
    # explicit conflicting mode rejected
    with pytest.raises(SystemExit):
        main(["query", "--index", idx, "--fvf", "doc_len",
              "--mode", "and", QUERY])
    with pytest.raises(SystemExit):
        main(["query", "--index", pidx, "--rescore-phrase", PHRASE,
              "--mode", "pruned", QUERY])


def test_rescored_unknown_phrase_term(sf_dir):
    """A phrase containing an out-of-vocabulary term boosts nothing."""
    engine = QueryEngine(index_dir_for(sf_dir, positions=True))
    out = engine.topk_rescored(QUERY, "beta nosuchterm", k=10, window=10)
    base = [(d, round6(s)) for d, s in engine.topk(QUERY, k=10)]
    assert [(d, s) for d, s in out] == base
