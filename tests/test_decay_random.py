"""Decay function scoring (gauss/exp/linear) and seeded random_score
vs independent brute-force referees — the remaining two members of the
ES ``function_score`` family (``topk_fvf`` landed earlier). The
reference ranks purely lexically
(search-engine/internal/bm25/score.go:19-95)."""

import hashlib
import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.bm25 import idf, topk_order
from zensearch_ray.functions.text import term_frequencies, tokenize
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine

K1, B = 1.2, 0.75
QUERY = "search engine ranking"


@pytest.fixture(scope="module")
def dr_index(ray_session, pages_small, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("dridx"))
    cfg = BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60, lang="en")
    build_index(pages_small, index_dir, cfg)
    t = pq.read_table(pages_small, columns=["text", "lang"])
    ids = np.arange(t.num_rows, dtype=np.int64)
    mask = np.array([l == "en" for l in t["lang"].to_pylist()])
    texts = [tx for tx, m in zip(t["text"].to_pylist(), mask) if m]
    return index_dir, ids[mask], texts


def _bm25(doc_ids, texts, query):
    tfs = [term_frequencies(t) for t in texts]
    dls = np.array([sum(d.values()) for d in tfs], dtype=np.float64)
    n = len(texts)
    avgdl = float(dls.mean())
    df = {}
    for d in tfs:
        for term in d:
            df[term] = df.get(term, 0) + 1
    scores = np.zeros(n)
    for term in dict.fromkeys(tokenize(query)):
        if df.get(term, 0) == 0:
            continue
        w = idf(n, df[term])
        if w == 0.0:
            continue
        for i, d in enumerate(tfs):
            tf = d.get(term, 0)
            if tf == 0:
                continue
            scores[i] += w * tf * (K1 + 1.0) / (
                tf + K1 * (1 - B + B * dls[i] / avgdl)
            )
    return scores, dls


@pytest.mark.parametrize("kind", ["gauss", "exp", "linear"])
def test_decay_rank_identity(dr_index, kind):
    index_dir, doc_ids, texts = dr_index
    engine = QueryEngine(index_dir)
    origin, scale, offset, rate = 40.0, 25.0, 5.0, 0.5
    scores, dls = _bm25(doc_ids, texts, QUERY)
    d = np.maximum(np.abs(dls - origin) - offset, 0.0)
    if kind == "gauss":
        mult = rate ** ((d / scale) ** 2)
    elif kind == "exp":
        mult = rate ** (d / scale)
    else:
        mult = np.maximum(1.0 - d * (1.0 - rate) / scale, 0.0)
    keep = scores > 0
    ids, sc = topk_order(doc_ids[keep], (scores * mult)[keep], 10)
    got = engine.topk_decay(QUERY, "doc_len", kind, origin, scale, offset, rate)
    assert [x for x, _ in got] == ids.tolist(), kind
    np.testing.assert_allclose([s for _, s in got], sc, rtol=1e-9)


def test_decay_contract_points(dr_index):
    """The ES contract: multiplier is exactly 1 inside the offset halo
    and exactly `decay` at distance offset+scale — checked by picking
    a doc at each distance and comparing to its plain BM25 score."""
    index_dir, doc_ids, texts = dr_index
    engine = QueryEngine(index_dir)
    _, dls = _bm25(doc_ids, texts, QUERY)
    full = dict(engine.topk(QUERY, k=500))
    for kind in ("gauss", "exp", "linear"):
        for d, s in engine.topk_decay(
            QUERY, "doc_len", kind, origin=40.0, scale=25.0,
            offset=5.0, decay=0.5, k=500,
        ):
            dl = float(dls[np.searchsorted(doc_ids, d)])
            dist = max(abs(dl - 40.0) - 5.0, 0.0)
            if dist == 0.0:
                assert math.isclose(s, full[d], rel_tol=1e-12)
            elif math.isclose(dist, 25.0):
                assert math.isclose(s, 0.5 * full[d], rel_tol=1e-12)


def test_decay_rejects_bad_params(dr_index):
    index_dir, _, _ = dr_index
    engine = QueryEngine(index_dir)
    with pytest.raises(ValueError, match="kind"):
        engine.topk_decay(QUERY, kind="cosine")
    with pytest.raises(ValueError, match="decay"):
        engine.topk_decay(QUERY, decay=1.0)
    with pytest.raises(ValueError, match="scale"):
        engine.topk_decay(QUERY, scale=0.0)


def test_random_draw_identity_and_determinism(dr_index):
    index_dir, doc_ids, texts = dr_index
    engine = QueryEngine(index_dir)
    scores, _ = _bm25(doc_ids, texts, QUERY)
    matched = doc_ids[scores > 0]
    draws = np.array(
        [
            int(hashlib.md5(f"9:{d}".encode()).hexdigest()[:12], 16) / 16.0 ** 12
            for d in matched.tolist()
        ]
    )
    ids, sc = topk_order(matched, draws, 10)
    got = engine.topk_random(QUERY, seed=9, k=10)
    assert [x for x, _ in got] == ids.tolist()
    np.testing.assert_allclose([s for _, s in got], sc, rtol=0)
    # deterministic across calls; different seed reorders
    assert got == engine.topk_random(QUERY, seed=9, k=10)
    other = engine.topk_random(QUERY, seed=10, k=10)
    assert [x for x, _ in got] != [x for x, _ in other]


def test_random_is_uniform_over_match_set(dr_index):
    """Every matched doc appears in the full-k random ranking — the
    draw replaces the score, it never filters."""
    index_dir, _, _ = dr_index
    engine = QueryEngine(index_dir)
    full = {d for d, _ in engine.topk(QUERY, k=10_000)}
    rand = {d for d, _ in engine.topk_random(QUERY, seed=3, k=10_000)}
    assert full == rand
