"""Index-time synonym folding (BuildConfig.synonyms): variant tokens
rewrite onto canonicals at tokenize (one posting list per synonym
group, tf/df mass merged, doc_len invariant), the query side folds
identically via the manifest, positions stay compatible (no token is
dropped), and the config fingerprint refuses to mix folded and
unfolded artifacts."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from zensearch_ray.functions.bm25 import BM25Oracle
from zensearch_ray.functions.text import tokenize
from zensearch_ray.pipelines.build_index import (
    BuildConfig,
    build_index,
    config_fingerprint,
)
from zensearch_ray.pipelines.query import QueryEngine

SYN = (("auto", "car"), ("automobile", "car"), ("couch", "sofa"))

DOCS = [
    "auto repair shop fixes every car",        # auto + car → car tf 2
    "automobile museum auto show",             # both variants, no surface car
    "sofa cushions for the couch corner",      # couch + sofa → sofa tf 2
    "car dealership trades automobile stock",
    "unrelated filler text entirely",
    "couch potato watches the sofa channel sofa",
]


def _fold(tok: str) -> str:
    return dict(SYN).get(tok, tok)


def _write_src(d, docs):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["t"] * len(docs)),
        }
    )
    src = str(d / "documents.parquet")
    pq.write_table(t, src)
    return src


@pytest.fixture(scope="module")
def syn_index(ray_session, tmp_path_factory):
    import ray.data as rd

    d = tmp_path_factory.mktemp("synfold_src")
    src = _write_src(d, DOCS)
    idx = str(d / "idx")
    build_index(
        rd.read_parquet(src, columns=["doc_id", "text", "lang", "source"]),
        idx,
        BuildConfig(num_shards=4, salt_subs=2, lang=None, id_col="doc_id",
                    synonyms=SYN),
    )
    return idx


def test_tf_merges_onto_canonical(syn_index):
    eng = QueryEngine(syn_index)
    p = eng.lookup("car")
    ids, tfs, _ = p.decode_all()
    got = dict(zip(ids.tolist(), tfs.tolist()))
    # doc 0: auto+car → 2; doc 1: automobile+auto → 2; doc 3: car+automobile → 2
    assert got == {0: 2, 1: 2, 3: 2}
    # variants have NO postings of their own
    assert eng.lookup("auto") is None
    assert eng.lookup("automobile") is None
    p2 = eng.lookup("sofa")
    ids2, tfs2, _ = p2.decode_all()
    assert dict(zip(ids2.tolist(), tfs2.tolist())) == {2: 2, 5: 3}


def test_doc_len_invariant(syn_index):
    eng = QueryEngine(syn_index)
    expect = np.mean([len(tokenize(t)) for t in DOCS])
    assert abs(eng.avgdl - expect) < 1e-9


def test_variant_query_equals_canonical(syn_index):
    eng = QueryEngine(syn_index)
    for variant, canonical in [("auto", "car"), ("automobile", "car"),
                               ("couch", "sofa")]:
        assert eng.topk(variant, k=10) == eng.topk(canonical, k=10)
    assert eng.topk("auto cushions") == eng.topk("car cushions")


def test_rank_identity_vs_folded_oracle(syn_index):
    """Engine ranking over the folded index == BM25Oracle over the
    texts with every token folded by hand."""
    eng = QueryEngine(syn_index)
    folded = [" ".join(_fold(t) for t in tokenize(x)) for x in DOCS]
    oracle = BM25Oracle(list(range(len(folded))), folded)
    for q in ["car", "sofa channel", "auto repair", "couch car"]:
        want = oracle.topk(" ".join(_fold(t) for t in tokenize(q)), k=10)
        got = eng.topk(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) < 1e-9, q


def test_positions_compatible(ray_session, tmp_path):
    """Folding is position-compatible: the canonical phrase matches a
    doc whose SURFACE form used the variant."""
    import ray.data as rd

    src = _write_src(tmp_path, DOCS)
    idx = str(tmp_path / "idx_pos")
    build_index(
        rd.read_parquet(src, columns=["doc_id", "text", "lang", "source"]),
        idx,
        BuildConfig(num_shards=4, salt_subs=2, lang=None, id_col="doc_id",
                    synonyms=SYN, positions=True),
    )
    eng = QueryEngine(idx)
    # doc 0 surface: "... fixes every car" / "auto repair ..." —
    # phrase "car repair" must match doc 0 via the folded first token
    hits = eng.topk_phrase("auto repair", k=10)
    assert 0 in [d for d, _ in hits]
    assert eng.topk_phrase("car repair", k=10) == hits  # folds identically
    # doc 5: "couch potato" → folded "sofa potato"
    assert [d for d, _ in eng.topk_phrase("sofa potato", k=10)] == [5]


def test_fingerprint_split(ray_session, tmp_path):
    cfg_plain = BuildConfig(num_shards=4, salt_subs=2, id_col="doc_id")
    cfg_syn = BuildConfig(num_shards=4, salt_subs=2, id_col="doc_id",
                          synonyms=SYN)
    assert config_fingerprint(cfg_plain, "col") != config_fingerprint(
        cfg_syn, "col"
    )


def test_bad_pair_rejected():
    from zensearch_ray.stages.tokenize import TokenizeStage

    with pytest.raises(ValueError, match="single tokens"):
        TokenizeStage(synonyms=(("!!", "car"),))
    with pytest.raises(ValueError, match="single tokens"):
        TokenizeStage(synonyms=(("two words", "car"),))
