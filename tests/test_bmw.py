"""Block-Max WAND evaluation (QueryEngine.topk_bmw): rank-identical to
the exhaustive strategy at the checked 6-dp contract on an arbitrary
corpus, provably block-skipping on a skewed one, tombstone-correct,
and served through CLI/service/HTTP mode tables."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import zensearch_ray.pipelines.query as query_mod
from zensearch_ray.functions.rounding import round6
from zensearch_ray.pipelines.build_index import BuildConfig, build_index
from zensearch_ray.pipelines.query import QueryEngine
from zensearch_ray.sources.pages import generate_pages_table

QUERIES = [
    "search engine ranking",
    "the of and",
    "data stream processing window",
    "the a of in and stream",
    "zzz missing",
    "search search the engine",
]


def _r6(hits):
    return [(d, round6(s)) for d, s in hits]


@pytest.fixture(scope="module")
def gen_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("bmw_src")
    src = str(root / "pages.parquet")
    pq.write_table(generate_pages_table(400, seed=11), src, row_group_size=64)
    idx = str(root / "idx")
    build_index(
        src, idx,
        BuildConfig(num_shards=4, salt_subs=2, heavy_df_threshold=60,
                    lang=None),
    )
    return idx


@pytest.fixture(scope="module")
def skew_index(ray_session, tmp_path_factory):
    """20k docs of stopword filler; 'needle' in 10 docs with high tf —
    the rare-term-plus-stopword shape where block-max pruning pays."""
    root = tmp_path_factory.mktemp("bmw_skew")
    rng = np.random.default_rng(3)
    texts = []
    n = 20000
    for i in range(n):
        base = ["the"] * 12 + [f"filler{i % 97}"] * 3
        if i % 2000 == 0:
            base += ["needle"] * 6
        rng.shuffle(base)
        texts.append(" ".join(base))
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["t"] * n),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    src = str(root / "documents.parquet")
    pq.write_table(t, src)
    idx = str(root / "idx")
    build_index(src, idx, BuildConfig(num_shards=4, salt_subs=2, lang=None))
    return idx


def test_bmw_rank_identical(gen_index):
    eng = QueryEngine(gen_index)
    for q in QUERIES:
        for k in (1, 5, 10, 50):
            assert _r6(eng.topk_bmw(q, k)) == _r6(eng.topk(q, k)), (q, k)


def test_bmw_skips_blocks_on_skew(skew_index, monkeypatch):
    eng = QueryEngine(skew_index)
    q = "the needle"
    assert _r6(eng.topk_bmw(q, 10)) == _r6(eng.topk(q, 10))
    decoded = {"blocks": 0}
    orig = query_mod.decode_posting_blocks

    def counting(r, blocks, **kw):
        decoded["blocks"] += len(blocks)
        return orig(r, blocks, **kw)

    monkeypatch.setattr(query_mod, "decode_posting_blocks", counting)
    fresh = QueryEngine(skew_index)  # cold caches: decode really runs
    fresh.topk_bmw(q, 10)
    total = sum(
        len(r["block_last_doc"])
        for tok in ("the", "needle")
        for r in fresh.lookup(tok).rows
    )
    # the stopword list must be almost entirely skipped
    assert decoded["blocks"] * 10 < total, (decoded["blocks"], total)


def test_bmw_respects_tombstones(gen_index, tmp_path):
    import shutil

    idx2 = str(tmp_path / "idx_del")
    shutil.copytree(gen_index, idx2)
    eng = QueryEngine(idx2)
    victim = eng.topk("search engine ranking", 1)[0][0]
    from zensearch_ray.pipelines.delete import delete_docs

    delete_docs(idx2, doc_ids=[int(victim)])
    eng2 = QueryEngine(idx2)
    got = _r6(eng2.topk_bmw("search engine ranking", 10))
    assert victim not in [d for d, _ in got]
    assert got == _r6(eng2.topk("search engine ranking", 10))


def test_bmw_served_everywhere(gen_index, capsys):
    import json

    from zensearch_ray.__main__ import main
    from zensearch_ray.pipelines.service import QueryService

    assert main(["query", "--index", gen_index, "--mode", "bmw",
                 "search engine ranking"]) == 0
    (out,) = [json.loads(ln)
              for ln in capsys.readouterr().out.splitlines() if ln]
    eng = QueryEngine(gen_index)
    want = eng.topk_bmw("search engine ranking", 10)
    assert [r["doc_id"] for r in out["results"]] == [d for d, _ in want]
    svc = QueryService(gen_index, replicas=1)
    got = svc.search("search engine ranking", mode="bmw", docs=False)
    assert _r6(got) == _r6(want)
    got_docs = svc.search("search engine ranking", mode="bmw", docs=True)
    assert [r["doc_id"] for r in got_docs] == [d for d, _ in want]
    svc.shutdown()
    # --urls with a combiner/pruning mode resolves docs for THAT
    # strategy (it used to KeyError through topk_docs' smaller map)
    for mode in ("bmw", "boosted", "msm", "dismax"):
        assert main(["query", "--index", gen_index, "--mode", mode,
                     "--urls", "search engine ranking"]) == 0
        (out,) = [json.loads(ln)
                  for ln in capsys.readouterr().out.splitlines() if ln]
        assert out["results"] and "url" in out["results"][0]
